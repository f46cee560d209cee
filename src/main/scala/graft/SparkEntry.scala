package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.flow.{FlowEnrich, FlowQueries}
import graft.operators.{AsofJoin, Bpe, Dedup, EventOps, Multimodal, OpsMetrics, Pq, RelQueries, Similarity, TextOps}
// registry spans: flow dashboards, enrichment, ops metrics, relational,
// text/dedup/similarity/multimodal training-pipeline operators

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries; every key here has a matching
  * DuckDB oracle in [[oracleSql]] unless the operator is genuinely not
  * SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Top source addresses by sampled bytes — the reference's marquee
    * dashboard panel (viz-ch.json:233): scan → derive → conditional IP
    * render → hash agg → top-N. */
  def entry(spark: SparkSession): DataFrame =
    FlowQueries.topSrcIp(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FlowQueries.queries ++ FlowEnrich.queries ++ OpsMetrics.queries ++
      RelQueries.queries ++ TextOps.queries ++ AsofJoin.queries ++
      Dedup.queries ++ Similarity.queries ++ Pq.queries ++
      Multimodal.queries ++ EventOps.queries ++ Bpe.queries ++ Map(
      "q1_agg" -> ((s: SparkSession, dir: String) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    FlowQueries.oracles ++ FlowEnrich.oracles ++ OpsMetrics.oracles ++
      RelQueries.oracles ++ TextOps.oracles ++ AsofJoin.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Pq.oracles ++
      Multimodal.oracles ++ EventOps.oracles ++ Bpe.oracles ++ Map(
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
          | round(sum(l_extendedprice), 2) AS sum_base_price, count(*) AS count_order
          | FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin.replace('\n', ' '))
}
