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
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64,
      dims: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (decoder init, model session, ...)
        batch.iterator.map { m =>
          MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
            decodeStub(m.payload, dims))
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

  // ------------------------------------------- feature-space ANN bridge

  /** One modality's features as an ANN-ready `(vec_id, embedding)`
    * relation — the media→ANN bridge (r14 verdict #1): the `kind`
    * equality filters BEFORE feature extraction (payload read once in
    * the scan stage, other modalities' blobs untouched when the source
    * is the [[writeMediaTable]] partitioned layout), and only the
    * `dims`-float feature vector flows on. 64 dims default for the ANN
    * rows: the 8-dim histograms are too concentrated to spread LSH/IVF
    * buckets (measured at sf0.01: 7 buckets, max 146 of 167 — a bucket
    * join would be ~all-pairs). */
  def featureVecs(spark: SparkSession, dir: String, kind: String,
      dims: Int = 64): DataFrame = {
    import spark.implicits._
    // spreadScan ABOVE the decode (r18): payload stays inside the scan
    // stage (the multimodal no-blob-in-exchange contract); the spread
    // (vec_id, 64-float) relation gives the index build's iterative
    // consumers full parallelism; identity at production scan widths
    graft.Storage.spreadScan(
      extractFeatures(
          mediaTable(spark, dir).filter(col("kind") === kind).as[MediaRecord],
          dims = dims)
        .toDF()
        .select(col("media_id").as("vec_id"), col("features").as("embedding")),
      col("vec_id"))
  }

  /** FEATURE-SPACE NEAR-DUPLICATE PAIRS per modality (r14 verdict #1) —
    * the multimodal member of the near-dup family: candidates come from
    * the hyperplane-LSH buckets ([[Similarity.withSignature]]'s
    * md5-derived planes — never all-pairs), multi-probed so the
    * candidate set is EXACTLY the pairs within `probeDist` signature
    * bits, then exact cosine over the feature vectors keeps pairs at or
    * above `threshold`.
    *
    * Scale shape: the payload decodes once in the scan stage and only
    * (kind, id, signature) triples enter the bucket join — the media
    * blob appears in NO exchange (plan-contract-locked). Degenerate
    * buckets — feature collisions bigger than `maxBucket`, the stub
    * features' failure mode on homogeneous corpora — are dropped from
    * BOTH sides (the dedup family's df-cap precedent): a pair is kept
    * only when both members sit in sane buckets, so candidate cost is
    * bounded by `maxBucket` per probe however concentrated the feature
    * space gets. The oracle replays the cap arithmetic, so the capped
    * semantics are what's hash-checked. */
  def nearDupPairs(spark: SparkSession, dir: String, bits: Int = 16,
      probeDist: Int = 1, threshold: Double = 0.995, featureDims: Int = 64,
      maxBucket: Int = 1024): DataFrame = {
    import spark.implicits._
    // spreadScan ABOVE the decode (r18): the payload never crosses an
    // exchange (the multimodal plan contract) — what spreads is the
    // (media_id, kind, 64-float features) relation, so the signature
    // pass, the bucket join and the exact re-score run on every core
    // instead of the one core a one-file scan yields; identity at scale
    val feats = graft.Storage.materializeOnce(graft.Storage.spreadScan(
      extractFeatures(mediaDataset(spark, dir), dims = featureDims).toDF()
        .select(col("media_id"), col("kind"), col("features")),
      col("media_id")))
    val sigs = Similarity.withSignature(feats, "features", bits)
      .select(col("kind"), col("media_id"), col("lsh_sig"))
    // df-cap: bucket sizes from a map-combined aggregate (not a window —
    // the cap exists because buckets skew, so don't sort inside them)
    val bsz = sigs.groupBy("kind", "lsh_sig").agg(count(lit(1)).as("bsz"))
    val small = graft.Storage.materializeOnce(
      sigs.join(bsz.filter(col("bsz") <= maxBucket), Seq("kind", "lsh_sig"))
        .select("kind", "media_id", "lsh_sig"))
    val a = small.select(col("kind"), col("media_id").as("id_a"),
        explode(typedLit(Similarity.probeMasks(bits, probeDist))).as("m"),
        col("lsh_sig"))
      .select(col("kind"), col("id_a"),
        col("m").bitwiseXOR(col("lsh_sig")).as("bkt"))
    val b = small.select(col("kind"), col("media_id").as("id_b"),
      col("lsh_sig").as("bkt"))
    val cands = a.join(b, Seq("kind", "bkt"))
      .filter(col("id_a") < col("id_b"))
      .select("kind", "id_a", "id_b").distinct()
    cands
      .join(feats.select(col("media_id").as("id_a"), col("features").as("f_a")),
        Seq("id_a"))
      .join(feats.select(col("media_id").as("id_b"), col("features").as("f_b")),
        Seq("id_b"))
      .withColumn("cos_sim", round(Similarity.cosine(col("f_a"), col("f_b")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("kind", "id_a", "id_b", "cos_sim")
      .orderBy("kind", "id_a", "id_b")
  }

  /** Integer average-hash (aHash) of a payload's decoded feature grid:
    * bit d is set iff byte-class d's count exceeds the grid mean. The
    * stub grid is the byte-class histogram, whose mean is EXACTLY
    * len/64, so the whole fingerprint is integer arithmetic
    * (`64·count_d > len`) — bit-reproducible in any engine, no float
    * thresholds. A real image pipeline computes the same rule over the
    * 8×8 downsampled luma grid (pHash's DCT-free sibling); only this
    * decode changes when real codecs replace the stub. */
  private val phashUdf = udf { (payload: Array[Byte]) =>
    if (payload == null) null
    else {
      val counts = new Array[Int](64)
      var i = 0
      while (i < payload.length) { counts((payload(i) & 0xFF) % 64) += 1; i += 1 }
      var fp = 0L
      var d = 0
      while (d < 64) {
        if (64L * counts(d) > payload.length) fp |= (1L << d)
        d += 1
      }
      java.lang.Long.valueOf(fp)
    }
  }
  // optimizer barrier (the simhashUdf precedent): keeps the fingerprint
  // from being inlined into the per-chunk banding expressions
    .asNondeterministic()

  /** PERCEPTUAL NEAR-DUP PAIRS per modality (r15 verdict #6) — the
    * average-hash member of the media near-dup family, beside the
    * cosine-LSH [[nearDupPairs]]: aHash quantizes each feature cell to
    * one bit around the grid mean, so two re-encodes of the same media
    * (the [[resizeStub]] truncate, a codec re-encode) keep nearly the
    * same bit pattern even when the float feature vector moved enough
    * for cosine-LSH to miss — the resize/re-encode dup class.
    *
    * Candidates via pigeonhole banding exactly like
    * [[Dedup.simhashDupPairs]]: `maxDist+1` chunks of the 64-bit hash —
    * any pair within distance shares one identical chunk — so the join
    * is an equality join on (kind, band, chunk), never all-pairs; exact
    * Hamming filters the survivors. Scale shape: the payload is read
    * once by the hashing scan and only (kind, id, 8-byte hash) triples
    * enter the exchange (plan-contract-locked in MultimodalSpec);
    * identical payloads should be collapsed by the digest-exact
    * [[mediaDedup]] upstream, which bounds the identical-hash bucket
    * mass the same way the dedup family orders exact before near. */
  def phashDupPairs(spark: SparkSession, dir: String,
      maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    require(maxDist >= 0 && maxDist < 64 && 64 % chunks == 0,
      s"maxDist ($maxDist): maxDist+1 must divide 64 (0, 1, 3, 7, 15, 31, 63)")
    val bits = 64 / chunks
    // spreadScan ABOVE the hash (r18): the candidate pair generation (the
    // broadcast self-join probes run in the hash relation's stage)
    // profiled as one 2.3 s single-task job on a one-file scan. Spreading
    // the (kind, media_id, phash) relation — 17 bytes/row, payload stays
    // inside the scan stage, no blob crosses the exchange — parallelizes
    // banding + pair generation; identity at production scan widths
    val d = graft.Storage.spreadScan(
      mediaTable(spark, dir)
        .select(col("kind"), col("media_id"), phashUdf(col("payload")).as("phash"))
        .filter(col("phash").isNotNull), // null payload: no hash, no pairs
      col("media_id"))
    val bandCols = (0 until chunks).map { c =>
      struct(lit(c).as("band"),
        shiftrightunsigned(col("phash"), c * bits)
          .bitwiseAND(lit((1L << bits) - 1)).as("chunk"))
    }
    val banded = d
      .select(col("kind"), col("media_id"), col("phash"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("kind"), col("media_id"), col("phash"),
        col("b.band"), col("b.chunk"))
    // hamming filter BELOW the distinct (r18, opt guide §2.3 "shuffle
    // fewer bytes"): hamming is a function of the pair's two hashes, so
    // filter-then-distinct ≡ distinct-then-filter — but the filter kills
    // the (vast) non-duplicate candidate mass inside the join stage,
    // before the distinct's exchange ever sees it
    banded.as("l").join(banded.as("r"),
        col("l.kind") === col("r.kind") && col("l.band") === col("r.band") &&
          col("l.chunk") === col("r.chunk") &&
          col("l.media_id") < col("r.media_id"))
      .select(col("l.kind").as("kind"), col("l.media_id").as("id_a"),
        col("r.media_id").as("id_b"),
        bit_count(col("l.phash").bitwiseXOR(col("r.phash"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
      .select("kind", "id_a", "id_b", "hamming")
      .orderBy("kind", "id_a", "id_b")
  }

  /** Per-sampled-frame integer aHashes of a video payload — the
    * [[frameSampleStub]] framing (fixed `frameSize`-byte slices, every
    * `everyNth` kept, last slice short) with the [[phashUdf]] rule per
    * FRAME: bit d set iff 64·count_d > frame_len. One decode pass per
    * payload in the scan stage; output is a few 8-byte hashes. */
  private val frameHashUdf = udf {
    (payload: Array[Byte], frameSize: Int, everyNth: Int) =>
      if (payload == null) null
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        var f = 0
        var off = 0
        while (off < payload.length) {
          val len = math.min(frameSize, payload.length - off)
          if (f % everyNth == 0) {
            val counts = new Array[Int](64)
            var i = 0
            while (i < len) { counts((payload(off + i) & 0xFF) % 64) += 1; i += 1 }
            var fp = 0L
            var d = 0
            while (d < 64) { if (64L * counts(d) > len) fp |= (1L << d); d += 1 }
            out += fp
          }
          f += 1
          off += frameSize
        }
        out.toSeq
      }
  }.asNondeterministic() // optimizer barrier, the phashUdf precedent

  /** PER-FRAME perceptual near-dup pairs for VIDEO (r16 verdict #6):
    * [[phashDupPairs]] hashes the whole payload grid, so a trimmed or
    * re-cut video — which shares FRAMES, not its whole-payload byte
    * distribution — slips past it. This row hashes each SAMPLED frame
    * ([[frameSampleStub]] framing: a frame-aligned trim/re-cut leaves
    * the surviving slices bit-identical), bands every frame hash with
    * the same pigeonhole chunks, and keeps doc pairs with at least
    * `minFrames` frame pairs within `maxDist` bits.
    *
    * Scale shape: the payload is read once by the frame-hashing scan and
    * only (media_id, frame_idx, 8-byte hash) triples enter any exchange;
    * the candidate join is an equality join on (band, chunk) with the
    * [[nearDupPairs]] df-cap — a degenerate chunk bucket (the all-zero
    * slice every sparse hash shares, on a corpus where near-blank frames
    * dominate) is dropped from BOTH sides, so candidate cost is bounded
    * by `maxBucket` per band however skewed the frame population; never
    * all-pairs. The oracle replays the banding AND the cap arithmetic,
    * so the capped semantics are what's hash-checked. */
  def phashFramePairs(spark: SparkSession, dir: String, frameSize: Int = 64,
      everyNth: Int = 2, maxDist: Int = 3, minFrames: Int = 2,
      maxBucket: Int = 1024): DataFrame = {
    val chunks = maxDist + 1
    require(maxDist >= 0 && maxDist < 64 && 64 % chunks == 0,
      s"maxDist ($maxDist): maxDist+1 must divide 64 (0, 1, 3, 7, 15, 31, 63)")
    // ADVICE r17: frameSize <= 0 spins frameHashUdf forever on executors
    // (offset never advances); everyNth <= 0 throws ArithmeticException per row.
    require(frameSize > 0 && everyNth > 0,
      s"frameSize ($frameSize) and everyNth ($everyNth) must be positive")
    val bits = 64 / chunks
    val fr = mediaTable(spark, dir)
      .filter(col("kind") === "video")
      .select(col("media_id"),
        posexplode(frameHashUdf(col("payload"), lit(frameSize), lit(everyNth)))
          .as(Seq("fidx", "fh")))
    val bandCols = (0 until chunks).map { c =>
      struct(lit(c).as("band"),
        shiftrightunsigned(col("fh"), c * bits)
          .bitwiseAND(lit((1L << bits) - 1)).as("chunk"))
    }
    val banded = graft.Storage.materializeOnce(fr
      .select(col("media_id"), col("fidx"), col("fh"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("media_id"), col("fidx"), col("fh"),
        col("b.band"), col("b.chunk")))
    val bsz = banded.groupBy("band", "chunk").agg(count(lit(1)).as("bsz"))
    val sane = banded.join(bsz.filter(col("bsz") <= maxBucket),
      Seq("band", "chunk"))
    // hamming filter BELOW the distinct (the [[phashDupPairs]] reorder,
    // r18): hamming is a function of the two frame hashes, themselves
    // determined by (media_id, fidx), so the distinct frame-pair set is
    // unchanged — the non-matching candidate mass just dies before the
    // distinct's exchange instead of after it
    val cand = sane.as("l").join(sane.as("r"),
        col("l.band") === col("r.band") && col("l.chunk") === col("r.chunk") &&
          col("l.media_id") < col("r.media_id"))
      .select(col("l.media_id").as("id_a"), col("l.fidx").as("fa"),
        col("r.media_id").as("id_b"), col("r.fidx").as("fb"),
        bit_count(col("l.fh").bitwiseXOR(col("r.fh"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
    cand
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_frame_matches"))
      .filter(col("n_frame_matches") >= minFrames)
      .orderBy("id_a", "id_b")
  }

  // per-(corpus, kind) media IVF indexes, built once per JVM — the
  // Similarity registry-cache pattern, stamped on documents.parquet
  private def mediaIndexFor(spark: SparkSession, dir: String, kind: String,
      featureDims: Int = 64, nCentroids: Int = 8, iters: Int = 2): String =
    Similarity.cachedIndex(s"media_ivf_$kind", dir,
        Similarity.corpusStamp(dir, "documents.parquet")) { idx =>
      // r18: the Lloyd loop + assignment + cell write re-scan their input
      // 2·iters+2 times, and each re-scan used to re-run the full payload
      // decode; pin the decoded (vec_id, 64-float) relation once for the
      // build (guide §5: cache when reused AND recompute is expensive —
      // the features are ~1000× smaller than the payloads they derive
      // from) and release the blocks when the build commits
      val feats = graft.Storage.materializeOnce(
        featureVecs(spark, dir, kind, featureDims))
      try
        Similarity.buildIvfIndex(feats,
          idx, nCentroids = nCentroids, kmeansIters = iters,
          hashSeeds = true, trainBuckets = 10000)
      finally graft.Storage.unpersistMaterialized(feats)
    }

  /** MEDIA kNN THROUGH THE MATERIALIZED IVF INDEX (r14 verdict #1): per
    * modality, [[Similarity.buildIvfIndex]] over the feature vectors
    * (deterministic Lloyd, cells manifest-partitioned by centroid) and
    * [[Similarity.knnIvfIndexed]] serving — a probe reads ONLY its
    * probed cells' files. One index per modality: cross-modal neighbors
    * are meaningless (an audio byte-histogram next to an image's is
    * noise), and per-kind indexes keep every probe's read scope inside
    * its modality by construction. Queries are each modality's
    * `nQueries` lowest media ids. Fully oracle-checked: the DuckDB twin
    * replays the kind-partitioned kmeans, probes, and exact re-rank. */
  def mediaKnn(spark: SparkSession, dir: String, nQueries: Int = 2,
      k: Int = 3, nCentroids: Int = 8, iters: Int = 2, nProbe: Int = 3,
      featureDims: Int = 64): DataFrame = {
    import spark.implicits._
    // r18: the three per-kind serves (index build/read + query collect +
    // probe ranking) are independent job chains — overlap them (opt guide
    // §2.6) instead of leaving the cluster idle in each chain's tail
    graft.Storage.concurrently(Seq("image", "audio", "video")) { kind =>
      val idx = mediaIndexFor(spark, dir, kind, featureDims, nCentroids, iters)
      // r18: the id predicate moves BELOW the feature extraction — the
      // decode kernel is per-row, so filtering the handful of query rows
      // first skips a full-corpus extract pass per kind (guide §1.2:
      // don't compute what you throw away)
      val queries = extractFeatures(
          mediaTable(spark, dir)
            .filter(col("kind") === kind && col("media_id") < 3L * nQueries)
            .as[MediaRecord],
          dims = featureDims)
        .toDF()
        .select(col("media_id").as("vec_id"), col("features").as("embedding"))
      Similarity.knnIvfIndexed(spark, idx, queries, k, nProbe)
        .withColumn("kind", lit(kind))
    }.reduce(_.unionByName(_))
      .select(col("kind"), col("query_id"), col("neighbor_id"),
        col("cos_sim"), col("rank"))
      .orderBy("kind", "query_id", "rank")
  }

  /** CROSS-MODAL ALIGNMENT FILTER — the pair-quality gate of a
    * media+text training pipeline (the CLIP-score filtering step of
    * LAION-style corpus construction): cosine between each media item's
    * decoded feature vector and its paired text embedding
    * (`embeddings.vec_id` = `media_id`), keep at `minAlign` on the
    * ROUNDED score so both engines compare the same 6-decimal value.
    * Feature dims bind to the embedding dims (64) so the cosine is
    * well-formed; with real encoders the two sides would share a
    * projection head instead.
    *
    * Scale shape: feature extraction is map-side over the media scan;
    * the pairing is ONE id equi-join (both sides corpus-sized — at
    * 100 TB this shuffles (id, 64-float vector) rows, never payload
    * bytes or text), scoring is a codegen'd kernel above the join. */
  def alignScores(spark: SparkSession, dir: String, featureDims: Int = 64,
      minAlign: Double = 0.0): DataFrame = {
    val feats = extractFeatures(mediaDataset(spark, dir), dims = featureDims)
      .toDF().select(col("media_id"), col("kind"), col("features"))
    val embs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    feats.join(embs, feats("media_id") === embs("vec_id"))
      .select(col("media_id"), col("kind"),
        round(Similarity.cosine(col("features"), col("embedding")), 6)
          .as("align_score"))
      .withColumn("keep", (col("align_score") >= minAlign).cast("int"))
      .orderBy("media_id")
  }

  val queries: Map[String, Q] = Map(
    "multimodal_meta" -> (mediaMeta _),
    "multimodal_features" -> (mediaFeatures _),
    "multimodal_dedup" -> (mediaDedup _),
    "multimodal_batches" -> ((s: SparkSession, d: String) => decodeBatches(s, d)),
    "multimodal_near_dup" -> ((s: SparkSession, d: String) => nearDupPairs(s, d)),
    "multimodal_phash_dup" -> ((s: SparkSession, d: String) => phashDupPairs(s, d)),
    "multimodal_phash_frames" -> ((s: SparkSession, d: String) => phashFramePairs(s, d)),
    "multimodal_knn" -> ((s: SparkSession, d: String) => mediaKnn(s, d)),
    "multimodal_align" -> ((s: SparkSession, d: String) => alignScores(s, d)))

  /** CTE prefix deriving the 64-dim stub feature vectors in DuckDB —
    * byte-class counts from the hex walk (the `multimodal_features`
    * oracle generalized to all classes), divided in REAL then widened,
    * exactly the kernel's float arithmetic. Ends at `ed` (per-dim
    * values) and `ev` (per-media DOUBLE list). */
  private def duckFeatureCtes(dims: Int): String =
    s"""WITH fv0 AS (SELECT doc_id, hex(encode(text)) AS hx,
       |   octet_length(encode(text)) AS n FROM documents),
       | u AS (SELECT doc_id, n, hx, unnest(generate_series(1, n)) AS i FROM fv0),
       | byt AS (SELECT doc_id, ((strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
       |    + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)) % $dims AS d FROM u),
       | cnt AS (SELECT doc_id, d, count(*) AS c FROM byt GROUP BY 1, 2),
       | dt AS (SELECT unnest(generate_series(0, ${dims - 1})) AS d),
       | ed AS (SELECT f.doc_id AS vec_id,
       |   CASE CAST(f.doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |   dt.d AS d,
       |   CASE WHEN f.n = 0 THEN CAST(CAST(0 AS REAL) AS DOUBLE)
       |        ELSE CAST(CAST(coalesce(cnt.c, 0) AS REAL) / CAST(f.n AS REAL) AS DOUBLE) END AS v
       |   FROM fv0 f CROSS JOIN dt LEFT JOIN cnt ON cnt.doc_id = f.doc_id AND cnt.d = dt.d),
       | ev AS (SELECT vec_id, kind, list(v ORDER BY d) AS emb FROM ed GROUP BY 1, 2)""".stripMargin

  /** md5-hyperplane signatures over the feature vectors (the
    * [[Similarity]] `duckSigCte` applied to `ed`): `sig(vec_id, kind,
    * sigv)` with the same bit packing as the Spark UDF. */
  private def duckMediaSig(bits: Int): String =
    s""" pd AS (SELECT pp.p AS p, dd.d AS d,
       |   CASE WHEN (strpos('0123456789abcdef', substr(md5(pp.p::VARCHAR || ',' || dd.d::VARCHAR), 1, 1)) - 1) % 2 = 0
       |        THEN 1.0 ELSE -1.0 END AS sgn
       |   FROM (SELECT unnest(generate_series(0, ${bits - 1})) AS p) pp,
       |        (SELECT DISTINCT d FROM ed) dd),
       | sig AS (SELECT s.vec_id, e2.kind,
       |   CAST(sum(CASE WHEN s.s > 0 THEN (1 << s.p) ELSE 0 END) AS BIGINT) AS sigv
       |   FROM (SELECT ed.vec_id, pd.p, sum(ed.v * pd.sgn) AS s
       |     FROM ed JOIN pd ON pd.d = ed.d GROUP BY 1, 2) s
       |   JOIN (SELECT DISTINCT vec_id, kind FROM ed) e2 ON e2.vec_id = s.vec_id
       |   GROUP BY 1, 2)""".stripMargin

  /** Kind-partitioned fixed-iteration Lloyd replay over `ev`/`ed` — the
    * [[Similarity]] `duckKmeansCtes` with every stage PARTITIONED BY
    * kind (three independent per-modality indexes in one CTE chain;
    * the modalities' id sets are disjoint, so per-kind seeds/sums can't
    * mix). Ends at `cents` (kind, cid, c_emb). */
  private def duckMediaKmeans(nCentroids: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s" cents0 AS (SELECT kind, vec_id AS cid, emb AS c_emb FROM ("
    sb ++= s"SELECT kind, vec_id, emb, row_number() OVER (PARTITION BY kind "
    sb ++= s"ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM ev) WHERE rn <= $nCentroids)"
    for (t <- 0 until iters) {
      sb ++= s", asg$t AS (SELECT kind, vec_id, cid FROM ("
      sb ++= s"SELECT e.kind, e.vec_id, c.cid, row_number() OVER (PARTITION BY e.kind, e.vec_id "
      sb ++= s"ORDER BY round(${Similarity.duckCos("e.emb", "c.c_emb")}, 6) DESC, c.cid ASC) AS rn "
      sb ++= s"FROM ev e JOIN cents$t c ON c.kind = e.kind) WHERE rn = 1)"
      sb ++= s", sm$t AS (SELECT a.kind, a.cid, d.d AS pos, "
      sb ++= s"sum(CAST(round(d.v * 1048576) AS BIGINT)) AS s "
      sb ++= s"FROM asg$t a JOIN ed d ON d.vec_id = a.vec_id GROUP BY 1, 2, 3)"
      sb ++= s", cents${t + 1} AS (SELECT c.kind, c.cid, coalesce(n.c_emb, c.c_emb) AS c_emb "
      sb ++= s"FROM cents$t c LEFT JOIN (SELECT kind, cid, "
      sb ++= s"list(CAST(CAST(s AS REAL) AS DOUBLE) ORDER BY pos) AS c_emb "
      sb ++= s"FROM sm$t GROUP BY 1, 2) n ON n.kind = c.kind AND n.cid = c.cid)"
    }
    sb ++= s", cents AS (SELECT kind, cid, c_emb FROM cents$iters)"
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    // the capped LSH-bucket near-dup pairs: multiprobe of weight <= 1
    // masks == exact hamming <= 1, both members in sane (<= cap) buckets
    "multimodal_near_dup" ->
      s"""${duckFeatureCtes(64)},
         |${duckMediaSig(16)},
         | bsz AS (SELECT kind, sigv, count(*) AS sz FROM sig GROUP BY 1, 2),
         | small AS (SELECT sig.vec_id, sig.kind, sig.sigv FROM sig
         |   JOIN bsz ON bsz.kind = sig.kind AND bsz.sigv = sig.sigv WHERE bsz.sz <= 1024),
         | cand AS (SELECT a.kind, a.vec_id AS id_a, b.vec_id AS id_b FROM small a JOIN small b
         |   ON a.kind = b.kind AND a.vec_id < b.vec_id AND bit_count(xor(a.sigv, b.sigv)) <= 1)
         |SELECT kind, id_a, id_b, cos_sim FROM (
         |  SELECT cand.kind, cand.id_a, cand.id_b,
         |    round(${Similarity.duckCos("ea.emb", "eb.emb")}, 6) AS cos_sim
         |  FROM cand JOIN ev ea ON ea.vec_id = cand.id_a JOIN ev eb ON eb.vec_id = cand.id_b)
         |WHERE cos_sim >= 0.995 ORDER BY kind, id_a, id_b""".stripMargin.replace('\n', ' '),
    // integer aHash replay on the bit relation (the dedup_simhash oracle
    // shape): banding is candidate generation only, so the exact
    // all-pairs hamming <= 3 twin IS the answer set
    "multimodal_phash_dup" ->
      """WITH fv0 AS (SELECT doc_id, hex(encode(text)) AS hx,
        |   octet_length(encode(text)) AS n,
        |   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
        |  FROM documents WHERE text IS NOT NULL),
        | u AS (SELECT doc_id, n, hx, unnest(generate_series(1, n)) AS i FROM fv0),
        | byt AS (SELECT doc_id, ((strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
        |    + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)) % 64 AS d FROM u),
        | cnt AS (SELECT doc_id, d, count(*) AS c FROM byt GROUP BY 1, 2),
        | dt AS (SELECT unnest(generate_series(0, 63)) AS d),
        | vb AS MATERIALIZED (SELECT f.doc_id, f.kind, dt.d,
        |   CASE WHEN 64 * coalesce(cnt.c, 0) > f.n THEN 1 ELSE 0 END AS vb
        |   FROM fv0 f CROSS JOIN dt
        |   LEFT JOIN cnt ON cnt.doc_id = f.doc_id AND cnt.d = dt.d)
        |SELECT a.kind, a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(sum(CASE WHEN a.vb <> b.vb THEN 1 ELSE 0 END) AS INT) AS hamming
        |FROM vb a JOIN vb b ON a.kind = b.kind AND a.d = b.d AND a.doc_id < b.doc_id
        |GROUP BY 1, 2, 3
        |HAVING sum(CASE WHEN a.vb <> b.vb THEN 1 ELSE 0 END) <= 3
        |ORDER BY a.kind, id_a, id_b""".stripMargin.replace('\n', ' '),
    // per-frame aHash replay WITH the banding + df-cap arithmetic (the
    // capped semantics are the contract, like multimodal_near_dup):
    // per-(doc, sampled frame, bit) relation → per-band chunk values →
    // sane (≤ cap) buckets → shared-bucket candidates → exact hamming →
    // doc pairs with ≥ minFrames matching frame pairs
    "multimodal_phash_frames" ->
      """WITH fv0 AS (SELECT doc_id, hex(encode(text)) AS hx,
        |   octet_length(encode(text)) AS n FROM documents
        |  WHERE text IS NOT NULL AND doc_id % 3 = 2),
        | u AS (SELECT doc_id, n, hx, unnest(generate_series(1, n)) AS i FROM fv0),
        | fbyt AS (SELECT doc_id, CAST((i - 1) // 64 AS INT) AS f,
        |   ((strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1) * 16
        |    + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)) % 64 AS d,
        |   n FROM u),
        | fr AS (SELECT doc_id, f, least(64, n - f * 64) AS flen
        |   FROM fbyt GROUP BY 1, 2, 3),
        | sam AS (SELECT * FROM fr WHERE f % 2 = 0),
        | cnt AS (SELECT doc_id, f, d, count(*) AS c FROM fbyt
        |   WHERE f % 2 = 0 GROUP BY 1, 2, 3),
        | dt AS (SELECT unnest(generate_series(0, 63)) AS d),
        | vb AS MATERIALIZED (SELECT s.doc_id, s.f, dt.d,
        |   CASE WHEN 64 * coalesce(c.c, 0) > s.flen THEN 1 ELSE 0 END AS vb
        |   FROM sam s CROSS JOIN dt
        |   LEFT JOIN cnt c ON c.doc_id = s.doc_id AND c.f = s.f AND c.d = dt.d),
        | bandv AS MATERIALIZED (SELECT doc_id, f, CAST(d // 16 AS INT) AS band,
        |   CAST(sum(vb * (1 << (d % 16))) AS BIGINT) AS chunk
        |   FROM vb GROUP BY 1, 2, 3),
        | bsz AS (SELECT band, chunk, count(*) AS sz FROM bandv GROUP BY 1, 2),
        | sane AS (SELECT bandv.doc_id, bandv.f, bandv.band, bandv.chunk
        |   FROM bandv JOIN bsz USING (band, chunk) WHERE bsz.sz <= 1024),
        | cand AS (SELECT DISTINCT a.doc_id AS id_a, a.f AS fa,
        |   b.doc_id AS id_b, b.f AS fb
        |   FROM sane a JOIN sane b ON a.band = b.band AND a.chunk = b.chunk
        |     AND a.doc_id < b.doc_id),
        | hm AS (SELECT c.id_a, c.fa, c.id_b, c.fb,
        |   sum(CASE WHEN va.vb <> vbb.vb THEN 1 ELSE 0 END) AS ham
        |   FROM cand c JOIN vb va ON va.doc_id = c.id_a AND va.f = c.fa
        |   JOIN vb vbb ON vbb.doc_id = c.id_b AND vbb.f = c.fb AND vbb.d = va.d
        |   GROUP BY 1, 2, 3, 4)
        |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_frame_matches
        |FROM hm WHERE ham <= 3 GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin.replace('\n', ' '),
    // per-modality IVF serving replay: kind-partitioned Lloyd, nProbe=3
    // probed cells, exact re-rank, k=3, queries = media ids < 6
    "multimodal_knn" ->
      s"""${duckFeatureCtes(64)},
         |${duckMediaKmeans(8, 2)},
         | asg AS (SELECT kind, vec_id, cid FROM (
         |   SELECT e.kind, e.vec_id, c.cid, row_number() OVER (PARTITION BY e.kind, e.vec_id
         |     ORDER BY round(${Similarity.duckCos("e.emb", "c.c_emb")}, 6) DESC, c.cid ASC) AS rn
         |   FROM ev e JOIN cents c ON c.kind = e.kind) WHERE rn = 1),
         | probes AS (SELECT kind, query_id, cid FROM (
         |   SELECT q.kind, q.vec_id AS query_id, c.cid, row_number() OVER (PARTITION BY q.kind, q.vec_id
         |     ORDER BY round(${Similarity.duckCos("q.emb", "c.c_emb")}, 6) DESC, c.cid ASC) AS rn
         |   FROM ev q JOIN cents c ON c.kind = q.kind WHERE q.vec_id < 6) WHERE rn <= 3),
         | cand AS (SELECT p.kind, p.query_id, a.vec_id AS neighbor_id
         |   FROM probes p JOIN asg a ON a.kind = p.kind AND a.cid = p.cid
         |   WHERE a.vec_id <> p.query_id),
         | scored AS (SELECT cand.kind, cand.query_id, cand.neighbor_id,
         |     round(${Similarity.duckCos("eq.emb", "ec.emb")}, 6) AS cos_sim
         |   FROM cand JOIN ev eq ON eq.vec_id = cand.query_id
         |   JOIN ev ec ON ec.vec_id = cand.neighbor_id)
         |SELECT kind, query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY kind, query_id
         |    ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM scored)
         |WHERE rank <= 3 ORDER BY kind, query_id, rank""".stripMargin.replace('\n', ' '),
    // cross-modal alignment: the feature replay joined to the embedding
    // table on the shared id, same rounded-cosine parity as near_dup
    "multimodal_align" ->
      s"""${duckFeatureCtes(64)},
         | al AS (SELECT e.vec_id AS media_id, e.kind,
         |   round(${Similarity.duckCos("e.emb", "emb.embedding")}, 6) AS align_score
         |   FROM ev e JOIN embeddings emb ON emb.vec_id = e.vec_id)
         |SELECT media_id, kind, align_score,
         |  CAST(CASE WHEN align_score >= 0.0 THEN 1 ELSE 0 END AS INT) AS keep
         |FROM al ORDER BY media_id""".stripMargin.replace('\n', ' '),
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
