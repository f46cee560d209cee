package graft.flow

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's enrichment-processor roadmap
  * (`/root/reference/README.md:44-51`: "IP addresses can be mapped to
  * countries, ASN or customer information … extending the GoFlow protobuf
  * with new fields"), realized Spark-first:
  *
  *  - the EXTENDED wire schema — the production fields 100-103
  *    (`/root/reference/pb-ext/flow.pb.go:140-143`: SrcCountry, DstCountry,
  *    SrcASDB, DstASDB) — decodes/encodes via [[graft.sources.ProtoCodec]]
  *    `decodeExt`/`encodeExt` into [[FlowMessageExt]];
  *  - [[enrichFlows]] is the enrichment JOIN itself: a BROADCAST left join
  *    of the flow relation against a small AS dimension on SrcAS and DstAS.
  *    At 100 TB the dimension (≤ ~100k ASNs worldwide) always broadcasts;
  *    the fact side streams through two codegen'd broadcast-hash-join
  *    stages with zero shuffle;
  *  - [[enrichExt]] is the "consume → enrich → re-inject" processor shape:
  *    typed flow records join the dimension and come back as
  *    [[FlowMessageExt]] ready for `encodeExt` re-injection.
  *
  * The registry dimension is derived deterministically from the TPC-H
  * `nation ⋈ region` tables (asn = 65000 + n_nationkey), so the DuckDB
  * oracle reproduces the whole operator end-to-end.
  */
object FlowEnrich {

  /** The extended record: the 17 light fields plus the enrichment columns
    * of the production schema (fields 100-103). */
  final case class FlowMessageExt(
      flowType: Int, timeReceived: Long, sequenceNum: Long, samplingRate: Long,
      samplerAddress: Array[Byte], timeFlowStart: Long, timeFlowEnd: Long,
      bytes: Long, packets: Long, srcAddr: Array[Byte], dstAddr: Array[Byte],
      etype: Int, proto: Int, srcPort: Int, dstPort: Int, srcAS: Int, dstAS: Int,
      srcCountry: String, dstCountry: String, srcASDB: Int, dstASDB: Int)

  object FlowMessageExt {
    def from(m: FlowMessage, srcCountry: String, dstCountry: String,
        srcASDB: Int, dstASDB: Int): FlowMessageExt =
      FlowMessageExt(m.flowType, m.timeReceived, m.sequenceNum, m.samplingRate,
        m.samplerAddress, m.timeFlowStart, m.timeFlowEnd, m.bytes, m.packets,
        m.srcAddr, m.dstAddr, m.etype, m.proto, m.srcPort, m.dstPort,
        m.srcAS, m.dstAS, srcCountry, dstCountry, srcASDB, dstASDB)
  }

  /** AS dimension (asn, as_name, country). Registry fixture: nation ⋈
    * region with asn = 65000 + n_nationkey — 25 deterministic rows whose
    * first three match the adapter's AS range. */
  def asDims(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .join(Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .select((lit(65000) + col("n_nationkey")).cast("int").as("asn"),
        col("n_name").as("as_name"), col("r_name").as("country"))

  /** The enrichment join: left-broadcast the AS dimension onto the src and
    * dst AS columns; unmatched ASNs render the reference's "unset" default
    * (empty proto3 string → "--" for display parity with dashboards that
    * label unknown geo with a dash). */
  def enrichFlows(flows: DataFrame, dims: DataFrame): DataFrame = {
    val src = broadcast(dims.select(col("asn").as("src_as"),
      col("as_name").as("src_as_name"), col("country").as("src_country")))
    val dst = broadcast(dims.select(col("asn").as("dst_as"),
      col("as_name").as("dst_as_name"), col("country").as("dst_country")))
    flows.join(src, Seq("src_as"), "left").join(dst, Seq("dst_as"), "left")
      .withColumn("src_as_name", coalesce(col("src_as_name"), lit("--")))
      .withColumn("src_country", coalesce(col("src_country"), lit("--")))
      .withColumn("dst_as_name", coalesce(col("dst_as_name"), lit("--")))
      .withColumn("dst_country", coalesce(col("dst_country"), lit("--")))
  }

  /** The enrichment join for the case the broadcast path can't cover: a
    * dimension too large to broadcast against Zipfian fact keys (real AS
    * traffic — a handful of eyeball/content ASNs carry most flows, so a
    * plain hash join sends most of the table through the hot keys' tasks).
    * [[graft.operators.Skew.saltedEquiJoin]] scatters each key over
    * `salts` sub-keys and replicates the dimension per salt: the hot ASN's
    * rows spread across `salts` tasks, output row-identical to
    * [[enrichFlows]]. Cost: dims × salts extra rows hashed — the right
    * trade exactly when dims ≫ broadcast threshold but ≪ fact side. */
  def enrichFlowsSalted(flows: DataFrame, dims: DataFrame, salts: Int = 8): DataFrame = {
    import graft.operators.Skew
    val src = dims.select(col("asn").as("src_as"),
      col("as_name").as("src_as_name"), col("country").as("src_country"))
    val dst = dims.select(col("asn").as("dst_as"),
      col("as_name").as("dst_as_name"), col("country").as("dst_country"))
    val joined = Skew.saltedEquiJoin(
      Skew.saltedEquiJoin(flows, src, "src_as", salts, "left"),
      dst, "dst_as", salts, "left")
    joined
      .withColumn("src_as_name", coalesce(col("src_as_name"), lit("--")))
      .withColumn("src_country", coalesce(col("src_country"), lit("--")))
      .withColumn("dst_as_name", coalesce(col("dst_as_name"), lit("--")))
      .withColumn("dst_country", coalesce(col("dst_country"), lit("--")))
  }

  /** The processor: typed flows in, extended (fields-100-103-populated)
    * records out — ready for `ProtoCodec.encodeExt` re-injection
    * (`README.md:44-51`). `asdb` tags which AS database release attributed
    * the mapping, the production schema's SrcASDB/DstASDB. */
  def enrichExt(flows: Dataset[FlowMessage], dims: DataFrame,
      asdb: Int): Dataset[FlowMessageExt] = {
    import flows.sparkSession.implicits._
    val enriched = enrichFlows(
      flows.toDF()
        .withColumnRenamed("srcAS", "src_as").withColumnRenamed("dstAS", "dst_as"),
      dims)
    enriched
      .withColumnRenamed("src_as", "srcAS").withColumnRenamed("dst_as", "dstAS")
      .select(col("flowType"), col("timeReceived"), col("sequenceNum"),
        col("samplingRate"), col("samplerAddress"), col("timeFlowStart"),
        col("timeFlowEnd"), col("bytes"), col("packets"), col("srcAddr"),
        col("dstAddr"), col("etype"), col("proto"), col("srcPort"),
        col("dstPort"), col("srcAS"), col("dstAS"),
        // on the WIRE an unenriched endpoint stays the proto3 unset
        // default "" (so the record remains byte-identical to its base
        // encoding); "--" is strictly a display rendering
        when(col("src_country") =!= "--", col("src_country")).otherwise(lit(""))
          .as("srcCountry"),
        when(col("dst_country") =!= "--", col("dst_country")).otherwise(lit(""))
          .as("dstCountry"),
        when(col("src_country") =!= "--", lit(asdb)).otherwise(lit(0)).as("srcASDB"),
        when(col("dst_country") =!= "--", lit(asdb)).otherwise(lit(0)).as("dstASDB"))
      .as[FlowMessageExt]
  }

  // --------------------------------------------------------------- registry

  type Q = (SparkSession, String) => DataFrame

  /** flow_enrich: the enriched flow surface — every flow row annotated with
    * AS name + geo on both endpoints via the broadcast dimension join. */
  def flowEnrich(spark: SparkSession, dir: String): DataFrame =
    enrichFlows(FlowAdapter.flows(spark, dir), asDims(spark, dir))
      .select(col("seq"), col("src_as"), col("src_as_name"), col("src_country"),
        col("dst_as"), col("dst_as_name"), col("dst_country"), col("bytes"))
      .orderBy("seq")

  /** flow_enrich_geo: the dashboard cut over the enriched surface —
    * country-pair traffic matrix. */
  def flowEnrichGeo(spark: SparkSession, dir: String): DataFrame =
    enrichFlows(FlowAdapter.flows(spark, dir), asDims(spark, dir))
      .groupBy("src_country", "dst_country")
      .agg(sum("bytes").as("sum_bytes"), count(lit(1)).as("flow_count"))
      .orderBy("src_country", "dst_country")

  /** flow_enrich_salted: the same enriched surface through the salted
    * join — the skew-mitigation plan, oracle-checked against the identical
    * SQL as flow_enrich (salting must be invisible in the result). */
  def flowEnrichSalted(spark: SparkSession, dir: String): DataFrame =
    enrichFlowsSalted(FlowAdapter.flows(spark, dir), asDims(spark, dir))
      .select(col("seq"), col("src_as"), col("src_as_name"), col("src_country"),
        col("dst_as"), col("dst_as_name"), col("dst_country"), col("bytes"))
      .orderBy("seq")

  val queries: Map[String, Q] = Map(
    "flow_enrich" -> (flowEnrich _),
    "flow_enrich_salted" -> (flowEnrichSalted _),
    "flow_enrich_geo" -> (flowEnrichGeo _))

  private val dimsCte =
    """dims AS (
      |  SELECT CAST(65000 + n_nationkey AS INT) AS asn, n_name AS as_name, r_name AS country
      |  FROM nation JOIN region ON r_regionkey = n_regionkey
      |)""".stripMargin

  private val enrichSql =
    s"""${FlowAdapter.ducksql.trim}, $dimsCte
       |SELECT f.seq, f.src_as, coalesce(s.as_name, '--') AS src_as_name,
       |  coalesce(s.country, '--') AS src_country,
       |  f.dst_as, coalesce(d.as_name, '--') AS dst_as_name,
       |  coalesce(d.country, '--') AS dst_country, f.bytes
       |FROM flows f
       |LEFT JOIN dims s ON s.asn = f.src_as
       |LEFT JOIN dims d ON d.asn = f.dst_as
       |ORDER BY seq""".stripMargin.replace('\n', ' ')

  val oracles: Map[String, String] = Map(
    "flow_enrich_salted" -> enrichSql, // salting must be result-invisible
    "flow_enrich" -> enrichSql,
    "flow_enrich_geo" ->
      s"""${FlowAdapter.ducksql.trim}, $dimsCte
         |SELECT coalesce(s.country, '--') AS src_country,
         |  coalesce(d.country, '--') AS dst_country,
         |  CAST(sum(f.bytes) AS BIGINT) AS sum_bytes,
         |  CAST(count(*) AS BIGINT) AS flow_count
         |FROM flows f
         |LEFT JOIN dims s ON s.asn = f.src_as
         |LEFT JOIN dims d ON d.asn = f.dst_as
         |GROUP BY 1, 2 ORDER BY src_country, dst_country""".stripMargin.replace('\n', ' '))
}
