package graft.flow

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  // ------------------------------------------------- longest-prefix match

  /** Prefix lengths the LPM dimension carries. A real route/geo table has
    * lengths /8../32; the dimension generator below emits one prefix per
    * nation across these five widths (the ladder is tight — /8../16 — so
    * the synthetic corpus actually lands on the finer widths and the
    * deepest-match rule is exercised in the registry data, not only in
    * specs). The set is STATIC — candidate expansion cost is |PrefixLens|
    * per fact row, fixed at plan time. */
  val PrefixLens: Seq[Int] = Seq(8, 10, 12, 14, 16)

  /** 2^(32-len) divisor for masking a uint32 to a /len network — a
    * when-chain over the static length set, so the masking arithmetic
    * stays whole-stage-codegen'd integer math (Spark's `shiftleft` needs a
    * literal shift count; the length here is a column). */
  private def lenDivisor(plen: Column): Column =
    PrefixLens.tail.foldLeft(when(plen === PrefixLens.head, lit(1L << (32 - PrefixLens.head)))) {
      (acc, l) => acc.when(plen === l, lit(1L << (32 - l)))
    }

  /** CIDR/route dimension (prefix_len, prefix_ip, origin) for the LPM
    * join — the "map IPs to announced prefixes / origin networks" half of
    * the reference's enrichment roadmap (`README.md:44-51` names ASN and
    * customer mapping; a routing-table LPM is how production does it).
    * Registry fixture: derived deterministically from `nation` — nations
    * group into 5 families (`n_nationkey div 5`), each family owning one
    * /8 whose finer /12../24 prefixes NEST inside it, so longest-match
    * semantics are actually exercised (a fact IP inside a family's /8 may
    * match several widths; the deepest wins). Pure integer arithmetic —
    * the DuckDB oracle rebuilds the identical table. */
  def prefixDims(spark: SparkSession, dir: String): DataFrame = {
    val k = col("n_nationkey")
    // the family's /8 network base, then a per-nation offset inside it
    val base8 =
      expr("((((n_nationkey div 5) * 2654435761) % 4294967296) div 16777216) * 16777216")
    Tables.nation(spark, dir)
      .select((lit(8) + (k % 5).cast("int") * 2).as("prefix_len"),
        (base8 + (k * 99999989L) % 16777216L).as("raw"),
        col("n_name").as("origin"))
      .withColumn("__d", lenDivisor(col("prefix_len")))
      .select(col("prefix_len"), (expr("raw div __d") * col("__d")).as("prefix_ip"),
        col("origin"))
  }

  /** Longest-prefix-match of `src_ip` against the prefix dimension —
    * Spark-first LPM: EXPLODE each fact row into one candidate per static
    * prefix width (masked network at that width), equi-join the candidates
    * against the BROADCAST dimension on (len, network), then keep the
    * deepest match per flow with one hash aggregate.
    *
    * Scale shape: the expansion factor is the fixed |PrefixLens| (5), the
    * dimension join is a BroadcastHashJoin (a full IPv4 table is ~1M
    * routes ≈ tens of MB — always broadcastable), and the only shuffle
    * keys (seq) — no range join, no per-row binary search, no UDF. The
    * classic alternative (sort the routing table, range-join) shuffles
    * the fact table by IP; this shape never moves the fact rows except
    * for the final per-flow reduction, and when the caller aggregates
    * afterwards (see [[flowLpmSummary]]) that reduction IS the query's
    * own group-by. Left join + max(struct) keeps unmatched flows with a
    * NULL best (the "default route"). */
  def lpmJoin(flows: DataFrame, pfx: DataFrame): DataFrame = {
    // dedupe on (len, network) with the max-origin rule so the decode join
    // below is 1:1 even if two dimension rows collide on one width
    val dim = pfx.select(col("prefix_len"), col("prefix_ip").as("network"), col("origin"))
      .groupBy("prefix_len", "network").agg(max("origin").as("origin"))
    val cands = flows
      .select(col("seq"), col("src_ip"), col("bytes"), col("sampling_rate"))
      .withColumn("prefix_len", explode(array(PrefixLens.map(lit): _*)))
      .withColumn("__d", lenDivisor(col("prefix_len")))
      .withColumn("network", expr("src_ip div __d") * col("__d"))
      .drop("__d")
    // the deepest-match reduction runs on ONE packed long
    // (len·2^32 + network) so it plans as a partial+final HashAggregate —
    // a struct-valued max would force SortAggregate (a per-partition sort
    // of the whole candidate stream at 100 TB); origin is recovered
    // afterwards by a second broadcast probe of the same tiny dimension
    val matched = cands.join(broadcast(dim), Seq("prefix_len", "network"), "left")
      .select(col("seq"), col("src_ip"), col("bytes"), col("sampling_rate"),
        when(col("origin").isNotNull,
          col("prefix_len").cast("long") * 4294967296L + col("network")).as("pk"))
      .groupBy("seq", "src_ip", "bytes", "sampling_rate")
      .agg(max("pk").as("pk"))
      .withColumn("bplen", expr("pk div 4294967296").cast("int"))
      .withColumn("bnet", col("pk") % 4294967296L)
    matched.join(broadcast(dim.select(col("prefix_len").as("bplen"),
        col("network").as("bnet"), col("origin"))), Seq("bplen", "bnet"), "left")
      .select(col("seq"), col("src_ip"), col("bytes"), col("sampling_rate"),
        when(col("pk").isNotNull,
          struct(col("bplen").as("prefix_len"), col("bnet").as("network"),
            col("origin"))).as("best"))
  }

  /** flow_lpm_enrich: every flow annotated with its longest matching
    * prefix (rendered `a.b.c.d/len`) and origin network; unmatched flows
    * carry the default-route rendering. */
  def flowLpmEnrich(spark: SparkSession, dir: String): DataFrame = {
    import graft.GraftFunctions.ip4_ntoa
    lpmJoin(FlowAdapter.flows(spark, dir), prefixDims(spark, dir))
      .select(col("seq"), col("src_ip"),
        coalesce(col("best.prefix_len"), lit(0)).as("prefix_len"),
        when(col("best").isNotNull,
          concat(ip4_ntoa(col("best.network")), lit("/"),
            col("best.prefix_len").cast("string")))
          .otherwise(lit("0.0.0.0/0")).as("prefix"),
        coalesce(col("best.origin"), lit("--")).as("origin"),
        col("bytes"))
      .orderBy("seq")
  }

  /** flow_lpm_summary: sampled traffic per matched prefix — the
    * "top announced prefixes by volume" dashboard cut over the LPM
    * surface. Second aggregate runs over the per-flow reduction. */
  def flowLpmSummary(spark: SparkSession, dir: String): DataFrame = {
    import graft.GraftFunctions.ip4_ntoa
    lpmJoin(FlowAdapter.flows(spark, dir), prefixDims(spark, dir))
      .select(
        when(col("best").isNotNull,
          concat(ip4_ntoa(col("best.network")), lit("/"),
            col("best.prefix_len").cast("string")))
          .otherwise(lit("0.0.0.0/0")).as("prefix"),
        coalesce(col("best.origin"), lit("--")).as("origin"),
        (col("bytes") * col("sampling_rate")).as("sampled_bytes"))
      .groupBy("prefix", "origin")
      .agg(sum("sampled_bytes").as("sum_bytes"), count(lit(1)).as("flow_count"))
      .orderBy(desc("sum_bytes"), asc("prefix"), asc("origin"))
  }

  /** flow_as_balance: per-AS ingress/egress byte balance — the peering
    * diagnostic behind "is this AS a source, a sink, or symmetric" (a
    * CDN AS is egress-heavy, an eyeball AS ingress-heavy; a sudden flip
    * marks a routing leak or a reflection attack). ONE fact pass reduces
    * flows to the (src_as, dst_as) pair grain — the traffic-matrix grain,
    * dashboard-sized at any SF — then egress and ingress re-aggregate
    * from THAT relation and full-outer-join on the AS key (an AS seen
    * only as destination still reports, with egress 0). Share is one
    * rounded division of exact integer sums; names attach via the
    * broadcast dimension. */
  def flowAsBalance(spark: SparkSession, dir: String): DataFrame = {
    val pairs = FlowAdapter.flows(spark, dir)
      .groupBy(col("src_as"), col("dst_as"))
      .agg(sum(col("bytes") * col("sampling_rate")).as("b"))
      .transform(graft.Storage.materializeOnce)
    val egress = pairs.groupBy(col("src_as").as("asn"))
      .agg(sum("b").as("egress_bytes"))
    val ingress = pairs.groupBy(col("dst_as").as("asn"))
      .agg(sum("b").as("ingress_bytes"))
    val dims = broadcast(asDims(spark, dir).select(col("asn").as("d_asn"), col("as_name")))
    egress.join(ingress, Seq("asn"), "full_outer")
      .select(col("asn"),
        coalesce(col("egress_bytes"), lit(0L)).as("egress_bytes"),
        coalesce(col("ingress_bytes"), lit(0L)).as("ingress_bytes"))
      .join(dims, col("asn") === col("d_asn"), "left")
      .select(col("asn"), coalesce(col("as_name"), lit("--")).as("as_name"),
        col("egress_bytes"), col("ingress_bytes"),
        round(col("egress_bytes").cast("double") /
          (col("egress_bytes") + col("ingress_bytes")).cast("double"), 6)
          .as("egress_share"))
      .orderBy("asn")
  }

  val queries: Map[String, Q] = Map(
    "flow_enrich" -> (flowEnrich _),
    "flow_enrich_salted" -> (flowEnrichSalted _),
    "flow_enrich_geo" -> (flowEnrichGeo _),
    "flow_as_balance" -> (flowAsBalance _),
    "flow_lpm_enrich" -> (flowLpmEnrich _),
    "flow_lpm_summary" -> (flowLpmSummary _))

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

  /** DuckDB rebuild of [[prefixDims]] + the per-flow longest match —
    * masking via integer shifts (exact on BIGINT), deepest match picked
    * by the same (len, network, origin) ordering as the Spark
    * max(struct). */
  private val lpmCte = {
    val d = "(1::BIGINT << (32 - prefix_len))"
    val dp = "(1::BIGINT << (32 - p.prefix_len))"
    s"""pfx AS (
       |  SELECT CAST(8 + (n_nationkey % 5) * 2 AS INT) AS prefix_len,
       |    ((((n_nationkey // 5) * 2654435761) % 4294967296) // 16777216) * 16777216
       |      + (n_nationkey::BIGINT * 99999989) % 16777216 AS raw,
       |    n_name AS origin
       |  FROM nation
       |), pfx2 AS (
       |  SELECT prefix_len, (raw // $d) * $d AS prefix_ip, origin FROM pfx
       |), best AS (
       |  SELECT f.seq, p.prefix_len, p.prefix_ip, p.origin
       |  FROM flows f JOIN pfx2 p
       |    ON (f.src_ip // $dp) * $dp = p.prefix_ip
       |  QUALIFY row_number() OVER (PARTITION BY f.seq
       |    ORDER BY p.prefix_len DESC, p.prefix_ip DESC, p.origin DESC) = 1
       |)""".stripMargin
  }

  private def lpmDotted(n: String): String =
    s"printf('%d.%d.%d.%d', ($n // 16777216) % 256, ($n // 65536) % 256, ($n // 256) % 256, $n % 256)"

  private val lpmPrefixExpr =
    s"CASE WHEN b.seq IS NOT NULL THEN ${lpmDotted("b.prefix_ip")} || '/' || b.prefix_len::VARCHAR ELSE '0.0.0.0/0' END"

  val oracles: Map[String, String] = Map(
    "flow_enrich_salted" -> enrichSql, // salting must be result-invisible
    "flow_enrich" -> enrichSql,
    "flow_as_balance" ->
      s"""${FlowAdapter.ducksql.trim}, $dimsCte, p AS (
         |  SELECT src_as, dst_as, CAST(sum(bytes * sampling_rate) AS BIGINT) AS b
         |  FROM flows GROUP BY 1, 2),
         | e AS (SELECT src_as AS asn, CAST(sum(b) AS BIGINT) AS egress_bytes FROM p GROUP BY 1),
         | i AS (SELECT dst_as AS asn, CAST(sum(b) AS BIGINT) AS ingress_bytes FROM p GROUP BY 1),
         | j AS (SELECT coalesce(e.asn, i.asn) AS asn,
         |   coalesce(egress_bytes, 0) AS egress_bytes,
         |   coalesce(ingress_bytes, 0) AS ingress_bytes
         | FROM e FULL OUTER JOIN i ON e.asn = i.asn)
         |SELECT j.asn, coalesce(dims.as_name, '--') AS as_name,
         |  CAST(egress_bytes AS BIGINT) AS egress_bytes,
         |  CAST(ingress_bytes AS BIGINT) AS ingress_bytes,
         |  round(CAST(egress_bytes AS DOUBLE)
         |    / CAST(egress_bytes + ingress_bytes AS DOUBLE), 6) AS egress_share
         |FROM j LEFT JOIN dims ON j.asn = dims.asn
         |ORDER BY j.asn""".stripMargin.replace('\n', ' '),
    "flow_lpm_enrich" ->
      s"""${FlowAdapter.ducksql.trim}, $lpmCte
         |SELECT f.seq, f.src_ip, coalesce(b.prefix_len, 0) AS prefix_len,
         |  $lpmPrefixExpr AS prefix,
         |  coalesce(b.origin, '--') AS origin, f.bytes
         |FROM flows f LEFT JOIN best b USING (seq)
         |ORDER BY seq""".stripMargin.replace('\n', ' '),
    "flow_lpm_summary" ->
      s"""${FlowAdapter.ducksql.trim}, $lpmCte, bf AS (
         |  SELECT $lpmPrefixExpr AS prefix, coalesce(b.origin, '--') AS origin,
         |    f.bytes * f.sampling_rate AS sampled_bytes
         |  FROM flows f LEFT JOIN best b USING (seq))
         |SELECT prefix, origin, CAST(sum(sampled_bytes) AS BIGINT) AS sum_bytes,
         |  count(*) AS flow_count
         |FROM bf GROUP BY 1, 2
         |ORDER BY sum_bytes DESC, prefix, origin""".stripMargin.replace('\n', ' '),
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
