package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.flow.FlowAdapter

/** AS-OF JOIN: match each fact row to the latest dimension version whose
  * effective time is ≤ the fact's time — enrichment against time-versioned
  * dimensions (the reference's processor roadmap maps IPs/ASNs "to
  * countries, ASN or customer information", `/root/reference/README.md:
  * 44-51`; real AS/geo databases are released in dated versions, so the
  * historically-correct join is as-of, not equality: a flow from March must
  * join March's database, not today's).
  *
  * Spark has no asof-join operator. The scalable composition (preference
  * (a) of the custom-op ladder) is union + ordered forward-fill:
  *
  *  1. tag dim rows (side 0) and fact rows (side 1) into one relation;
  *  2. ONE hash exchange on the join key, sort within partitions by
  *     (time, side) — dim versions sort before facts at the same instant,
  *     so a version effective AT t applies to facts at t;
  *  3. running `last(dim_payload, ignoreNulls)` over the ordered frame
  *     forward-fills each fact row with the newest version at-or-before
  *     it; the payload rides ONE struct column, so the fill is row-atomic
  *     (a later version's null field never inherits an older version's
  *     value);
  *  4. keep side 1, expand the struct: left-join semantics — facts before
  *     the first version carry nulls.
  *
  * Scale shape: exactly one shuffle, keyed on the join key, sized by the
  * fact table; no range-bucket explosion, no per-row binary search, and —
  * unlike a broadcast of the whole version history — the dimension can be
  * arbitrarily large. Skewed keys sort more rows per partition but the
  * window frame is running-last (O(1) state per row, no buffering).
  * Catalyst plans it as Exchange → Sort → Window → Filter → Project, all
  * but Window whole-stage-codegen'd.
  */
object AsofJoin {

  /** Left as-of join. `fact`'s columns pass through; `dim`'s payload
    * columns (everything but `dimKey`/`dimTime`) append, null where no
    * version is effective yet. Payload names must not collide with fact
    * names (rename on the way in). */
  def asofJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      factTime: String, dimTime: String): DataFrame = {
    val factCols = fact.columns.toSeq
    val dimPayload = dim.columns.toSeq.filterNot(c => c == dimKey || c == dimTime)
    require(dimPayload.nonEmpty, "dim must carry payload columns beyond key+time")
    val clash = factCols.intersect(dimPayload)
    require(clash.isEmpty, s"dim payload collides with fact columns: $clash")
    val keyT = fact.schema(factKey).dataType
    val timeT = fact.schema(factTime).dataType
    val dimSide = dim.select(
      col(dimKey).cast(keyT).as("__k"), col(dimTime).cast(timeT).as("__t"),
      lit(0).as("__side"), struct(dimPayload.map(col): _*).as("__dim"))
    val factSide = fact.select(
      col(factKey).as("__k"), col(factTime).as("__t"),
      lit(1).as("__side"), struct(factCols.map(col): _*).as("__fact"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dimSide.unionByName(factSide, allowMissingColumns = true)
      .withColumn("__v", last("__dim", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(factCols.map(c => col(s"__fact.$c").as(c))
        ++ dimPayload.map(c => col(s"__v.$c").as(c)): _*)
  }

  // --------------------------------------------------------------- registry

  type Q = (SparkSession, String) => DataFrame

  /** Time-versioned AS dimension fixture: three dated releases (v0..v2) of
    * the nation⋈region AS database, effective at the quarter points of the
    * flow time range (computed via a broadcast 1-row bounds aggregate, no
    * driver round-trip). `+1` on the epoch start leaves the earliest
    * flow(s) before ANY version — exercising the left semantics. */
  def versionedAsDims(spark: SparkSession, dir: String): DataFrame = {
    val flows = FlowAdapter.flows(spark, dir)
    val bounds = flows.agg(min("time_received").as("tmin"), max("time_received").as("tmax"))
    val versions = spark.range(3).toDF("v")
    Tables.nation(spark, dir)
      .crossJoin(broadcast(bounds)).crossJoin(broadcast(versions))
      .select((lit(65000) + col("n_nationkey")).cast("int").as("asn"),
        concat(col("n_name"), lit("/v"), col("v")).as("as_name"),
        (col("v") + 1).cast("int").as("asdb"),
        (col("tmin") + lit(1L) + col("v") * expr("(tmax - tmin) div 4")).as("valid_from"))
  }

  /** flow_enrich_asof: every flow annotated with the AS-database release
    * that was current when it was observed. */
  def flowEnrichAsof(spark: SparkSession, dir: String): DataFrame = {
    val flows = FlowAdapter.flows(spark, dir)
      .select("seq", "time_received", "src_as", "bytes")
    asofJoin(flows, versionedAsDims(spark, dir),
      "src_as", "asn", "time_received", "valid_from")
      .select(col("seq"), col("src_as"),
        coalesce(col("as_name"), lit("--")).as("src_as_name"),
        coalesce(col("asdb"), lit(0)).as("asdb"), col("bytes"))
      .orderBy("seq")
  }

  val queries: Map[String, Q] = Map("flow_enrich_asof" -> (flowEnrichAsof _))

  val oracles: Map[String, String] = Map(
    "flow_enrich_asof" ->
      s"""${FlowAdapter.ducksql.trim}, vd AS (
         |  SELECT CAST(65000 + n_nationkey AS INT) AS asn,
         |    n_name || '/v' || CAST(v AS VARCHAR) AS as_name,
         |    CAST(v + 1 AS INT) AS asdb,
         |    (SELECT min(time_received) FROM flows) + 1
         |      + v * (((SELECT max(time_received) FROM flows)
         |              - (SELECT min(time_received) FROM flows)) // 4) AS valid_from
         |  FROM nation, (SELECT unnest([0, 1, 2]) AS v) vs
         |)
         |SELECT f.seq, f.src_as, coalesce(d.as_name, '--') AS src_as_name,
         |  CAST(coalesce(d.asdb, 0) AS INT) AS asdb, f.bytes
         |FROM flows f ASOF LEFT JOIN vd d
         |  ON f.src_as = d.asn AND f.time_received >= d.valid_from
         |ORDER BY seq""".stripMargin.replace('\n', ' '))
}
