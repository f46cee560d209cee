package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, plus batched decode / feature-extract / resize / frame-sample
  * plumbing.
  *
  * The decode step itself is a clearly-marked deterministic STUB (no codec
  * libraries in this environment); everything around it — schema, the
  * batched per-partition execution shape (the Scala analog of
  * `mapInPandas`: one buffer of records per batch, columnar-friendly), the
  * typed result encoding, and the partitioning story — is real and tested.
  *
  * At 100 TB: payloads never shuffle (decode happens in the scan stage,
  * feature vectors — 1000x smaller — flow on); [[writeMediaTable]] writes
  * the serving layout partitioned by `kind`, and [[readModality]]'s
  * per-modality scans prune to their partitions.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** A media record: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, byte_len: Long, features: Array[Float])

  /** Derive a deterministic media table from `documents`: text bytes stand in
    * for encoded media; metadata is arithmetic on doc_id. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (lit(16) + (col("doc_id") % 16) * lit(4)).cast("int").as("width"),
      (lit(16) + (col("doc_id") % 9) * lit(8)).cast("int").as("height"),
      when(col("doc_id") % 3 === 1, 16000).otherwise(0).cast("int").as("sample_rate"))

  // ----------------------------------------------------------- decode stubs

  /** STUB: stands in for a real image/audio/video decoder (no codec libs in
    * this container). Deterministic byte-statistics "features" keep the
    * pipeline testable end-to-end; swap for JNI/FFI codecs in production. */
  def decodeStub(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val hist = new Array[Float](dims)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xFF) % dims) += 1f; i += 1 }
    if (payload.length > 0) {
      var d = 0
      while (d < dims) { hist(d) /= payload.length.toFloat; d += 1 }
    }
    hist
  }

  /** STUB: resize — a real implementation decodes, scales, re-encodes. The
    * deterministic fake truncates/pads payload to the target byte budget. */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] =
    java.util.Arrays.copyOf(payload, math.min(payload.length, targetW * targetH))

  /** STUB: frame sampling — returns every nth "frame" (fixed-size payload
    * slice) like a real video frame sampler would. */
  def frameSampleStub(payload: Array[Byte], frameSize: Int, everyNth: Int): Seq[Array[Byte]] =
    payload.grouped(frameSize).zipWithIndex
      .collect { case (f, i) if i % everyNth == 0 => f }
      .toSeq

  /** Batched feature extraction — the Scala analog of `mapInPandas`: records
    * are processed per-partition in fixed-size batches (the batch boundary is
    * where a real implementation amortizes codec/model setup). */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (decoder init, model session, ...)
        batch.iterator.map { m =>
          MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
            decodeStub(m.payload))
        }
      }
    }
  }

  /** Typed media dataset from the derived table. */
  def mediaDataset(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
  }

  /** Write the media table in the serving layout: partitioned by modality,
    * so a per-modality job (audio featurization, image resize sweep) scans
    * only its `kind=` directories — partition pruning, no payload read for
    * other modalities. */
  def writeMediaTable(media: DataFrame, outDir: String): Unit =
    media.write.mode("overwrite").partitionBy("kind").parquet(outDir)

  /** Read one modality from the partitioned layout; the `kind` equality
    * lands in the scan's PartitionFilters (asserted by MultimodalSpec). */
  def readModality(spark: SparkSession, tableDir: String, kind: String): DataFrame =
    spark.read.parquet(tableDir).filter(col("kind") === kind)

  // -------------------------------------------------------------- queries

  /** Metadata surface (oracle-checkable: byte lengths + arithmetic meta). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_id"), col("kind"), length(col("payload")).cast("long").as("byte_len"),
        col("width"), col("height"), col("sample_rate"))
      .orderBy("media_id")

  /** Feature-extraction surface. The decode stub's features are byte-class
    * fractions; multiplying back by byte_len and rounding recovers the exact
    * integer histogram counts (float error < 0.5 for any payload < 8 MB), so
    * this query is fully DuckDB-oracle-checkable even though decode itself
    * is a stub — the r1 review asked for this row to stop being rows-only. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaDataset(spark, dir))
      .select(col("media_id"), col("kind"), col("byte_len"),
        round(element_at(col("features"), 1).cast("double") * col("byte_len"))
          .cast("long").as("f0_count"),
        round(element_at(col("features"), 2).cast("double") * col("byte_len"))
          .cast("long").as("f1_count"))
      .orderBy("media_id")
  }

  /** EXACT MEDIA DEDUP summary — the dedup family extended to opaque
    * binary columns: per modality, how many payloads, how many distinct,
    * how many rows an exact dedup pass would drop, and the largest copy
    * group. Grouping is by md5 DIGEST of the payload, so the exchange
    * carries 16-byte digests + ids — a raw-payload groupBy would ship
    * every image/audio/video blob through the shuffle (the whole reason
    * content-addressed dedup exists). The DuckDB oracle groups by the
    * payload itself — digest grouping must be count-identical (md5
    * collisions being the only, negligible, difference). */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("kind"), col("media_id"), md5(col("payload")).as("digest"))
      .groupBy("kind", "digest")
      .agg(count(lit(1)).as("copies"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_distinct"),
        sum("copies").as("n_payloads"),
        sum(col("copies") - 1).as("dup_rows"),
        max("copies").as("max_copies"))
      .orderBy("kind")

  /** DECODE-BATCH PLANNING — assign each media item to a fixed-byte-budget
    * batch per modality: the manifest a GPU featurization pass reads so
    * every device batch fits memory and codec/model setup amortizes over
    * a full batch (the media twin of `text_pack`'s token-budget packing).
    * Greedy prefix-sum assignment: `batch_id = cum_bytes_before div
    * budget` under the deterministic (kind, media_id) order — one window
    * per modality partition. The exchange carries only (kind, media_id,
    * byte_len): payload LENGTH evaluates in the scan stage, the payload
    * itself never shuffles — at 100 TB of media this plan moves a few
    * bytes per item. */
  def decodeBatches(spark: SparkSession, dir: String,
      budgetBytes: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("kind").orderBy("media_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    mediaTable(spark, dir)
      .select(col("kind"), col("media_id"), length(col("payload")).cast("long").as("byte_len"))
      .withColumn("cum_before", coalesce(sum("byte_len").over(win), lit(0L)))
      .withColumn("batch_id", expr(s"cum_before div $budgetBytes"))
      .groupBy("kind", "batch_id")
      .agg(count(lit(1)).as("n_items"), sum("byte_len").as("sum_bytes"),
        min("media_id").as("first_id"), max("media_id").as("last_id"))
      .orderBy("kind", "batch_id")
  }

  val queries: Map[String, Q] = Map(
    "multimodal_meta" -> (mediaMeta _),
    "multimodal_features" -> (mediaFeatures _),
    "multimodal_dedup" -> (mediaDedup _),
    "multimodal_batches" -> ((s: SparkSession, d: String) => decodeBatches(s, d)))

  val oracles: Map[String, String] = Map(
    "multimodal_batches" ->
      """WITH m AS (SELECT
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len FROM documents
        |), w AS (SELECT *, coalesce(sum(byte_len) OVER (
        |    PARTITION BY kind ORDER BY media_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM m
        |), b AS (SELECT kind, media_id, byte_len, cum_before // 4096 AS batch_id FROM w)
        |SELECT kind, CAST(batch_id AS BIGINT) AS batch_id, count(*) AS n_items,
        |  CAST(sum(byte_len) AS BIGINT) AS sum_bytes,
        |  CAST(min(media_id) AS BIGINT) AS first_id,
        |  CAST(max(media_id) AS BIGINT) AS last_id
        |FROM b GROUP BY 1, 2 ORDER BY kind, batch_id""".stripMargin.replace('\n', ' '),
    // payload-grouped twin of the digest-grouped Spark plan: identical
    // counts unless md5 collides (never on a real corpus)
    "multimodal_dedup" ->
      """WITH m AS (SELECT
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  encode(text) AS payload FROM documents
        |), g AS (SELECT kind, payload, count(*) AS copies FROM m GROUP BY 1, 2)
        |SELECT kind, count(*) AS n_distinct,
        |  CAST(sum(copies) AS BIGINT) AS n_payloads,
        |  CAST(sum(copies - 1) AS BIGINT) AS dup_rows,
        |  CAST(max(copies) AS BIGINT) AS max_copies
        |FROM g GROUP BY 1 ORDER BY kind""".stripMargin.replace('\n', ' '),
    "multimodal_meta" ->
      """SELECT doc_id AS media_id,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | CAST(16 + (doc_id % 16) * 4 AS INT) AS width,
        | CAST(16 + (doc_id % 9) * 8 AS INT) AS height,
        | CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT) AS sample_rate
        | FROM documents ORDER BY media_id""".stripMargin.replace('\n', ' '),
    // The decode stub computes a byte-value histogram mod 8; DuckDB
    // recomputes the same counts from hex(encode(text)).
    "multimodal_features" ->
      """WITH h AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents
        |), u AS (
        |  SELECT doc_id, hx, n, unnest(generate_series(1, n)) AS i FROM h
        |), b AS (
        |  SELECT doc_id,
        |    (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS byte
        |  FROM u
        |), c AS (
        |  SELECT doc_id, sum(CASE WHEN byte % 8 = 0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN byte % 8 = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM b GROUP BY doc_id
        |)
        |SELECT h.doc_id AS media_id,
        | CASE CAST(h.doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(h.n AS BIGINT) AS byte_len,
        | CAST(coalesce(c.c0, 0) AS BIGINT) AS f0_count,
        | CAST(coalesce(c.c1, 0) AS BIGINT) AS f1_count
        |FROM h LEFT JOIN c ON c.doc_id = h.doc_id ORDER BY media_id""".stripMargin.replace('\n', ' '))
}
