package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.flow.FlowAdapter

/** A7: the ops-dashboard query surface — the reference monitors itself
  * with PromQL over its Prometheus counters (`compose/grafana/dashboards/
  * perfs.json`: `sum(rate(metric[5m])) by (...)`, `avg(...) by
  * (quantile)`). The counters exist in this engine (S12,
  * [[graft.streaming.FlowMetrics]]); this module adds the QUERY side as
  * plain DataFrame window operators over a (metric, instance, ts, value)
  * counter-sample relation:
  *
  *  - [[perStepIncrease]]: per-sample positive delta, counter-RESET aware
  *    (a decrease means the process restarted; the new value IS the
  *    increase since the reset — Prometheus's rate/increase rule);
  *  - [[rate]]: sliding-range sum of those deltas / range seconds —
  *    `rate(c[N])` at every scrape point, one range-frame window over the
  *    series partition (no self-join);
  *  - [[sumRateBy]]: `sum(rate(c[N])) by (labels)`.
  *
  * Simplification vs Prometheus: no boundary extrapolation (Prometheus
  * scales the window delta by range/covered-time; at fixed scrape
  * intervals the difference is the partial first interval only) —
  * documented, deterministic, and identically expressible in the DuckDB
  * oracle's window SQL.
  *
  * Scale shape: one hash exchange on the series key for the windows, then
  * a hash aggregate for the BY clause. Series cardinality bounds state,
  * exactly like Prometheus itself.
  */
object OpsMetrics {
  type Q = (SparkSession, String) => DataFrame

  private val series = Seq(col("metric"), col("instance"))

  /** Histogram bucket upper bounds (`le` labels) shared by BOTH
    * renderings of histogram_quantile — the Spark CASE cascade AND the
    * DuckDB oracle (CTE columns + cascade). Single definition so the two
    * engines cannot drift (same anti-drift rule as EventOps.WeekSec). */
  private[graft] val HistLes = Seq(500L, 1000L, 2000L, 4000L)

  /** Deterministic counter-sample fixture from the flow relation:
    * cumulative flow and byte counters per src_as "instance", scraped at
    * 30-s boundaries — the shape FlowMetrics would expose over a day. */
  def counterSamples(spark: SparkSession, dir: String): DataFrame = {
    val flows = FlowAdapter.flows(spark, dir)
    val perSlot = flows
      .groupBy(col("src_as").cast("string").as("instance"),
        ((col("time_received") / 30).cast("long") * 30).as("ts"))
      .agg(count(lit(1)).as("flows"), sum("bytes").as("bytes"))
    // one scan + explode instead of a per-metric union (which would run
    // the slot aggregation once per branch); the running sum of per-slot
    // increments IS the counter series
    val w = Window.partitionBy("metric", "instance").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perSlot
      .select(col("instance"), col("ts"), explode(array(
        struct(lit("graft_flows_total").as("metric"), col("flows").cast("double").as("v")),
        struct(lit("graft_bytes_total").as("metric"), col("bytes").cast("double").as("v")))).as("m"))
      .select(col("m.metric").as("metric"), col("instance"), col("ts"), col("m.v").as("v"))
      .withColumn("value", sum("v").over(w))
      .drop("v")
  }

  /** Positive per-sample delta with Prometheus reset handling: value
    * dropped ⇒ the counter restarted at 0 and the whole new value is
    * growth. The first sample of a series contributes nothing (no
    * interval). */
  def perStepIncrease(samples: DataFrame): DataFrame = {
    val w = Window.partitionBy(series: _*).orderBy("ts")
    val prev = lag("value", 1).over(w)
    samples.withColumn("d",
      when(prev.isNull, lit(0.0))
        .when(col("value") >= prev, col("value") - prev)
        .otherwise(col("value")))
  }

  /** `increase(counter[rangeSec])`: sum of reset-corrected deltas over
    * (t - rangeSec, t] — kept UNDIVIDED so downstream sums stay
    * integer-valued doubles (exact in any aggregation order; the single
    * division happens last — that's what keeps the DuckDB hash compare
    * bit-stable). */
  def slidingIncrease(samples: DataFrame, rangeSec: Long): DataFrame = {
    val frame = Window.partitionBy(series: _*).orderBy(col("ts"))
      .rangeBetween(-(rangeSec - 1), Window.currentRow)
    perStepIncrease(samples)
      .withColumn("increase", sum("d").over(frame))
      .drop("d")
  }

  /** `rate(counter[rangeSec])` evaluated at every scrape point. */
  def rate(samples: DataFrame, rangeSec: Long): DataFrame =
    slidingIncrease(samples, rangeSec)
      .withColumn("rate", col("increase") / rangeSec)
      .drop("increase")

  /** `sum(rate(counter[rangeSec])) by (instance)` — the perfs.json panel
    * shape; grouping keys beyond the metric name are the BY clause. */
  def sumRateBy(samples: DataFrame, rangeSec: Long, by: Seq[Column]): DataFrame =
    rate(samples, rangeSec)
      .groupBy(col("metric") +: by: _*)
      .agg(sum("rate").as("rate_sum"))

  /** Gauge-sample fixture with a `quantile` LABEL — the shape of
    * Prometheus summary metrics (perfs.json's `avg(...) by (quantile)`
    * panels read pre-computed quantile labels; the label is opaque to the
    * query layer). Gauges stay integer-valued so the BY-average divides
    * exactly once. */
  def summarySamples(spark: SparkSession, dir: String): DataFrame =
    FlowAdapter.flows(spark, dir)
      .groupBy(
        ((col("time_received") / 30).cast("long") * 30).as("ts"),
        when(col("proto") === 6, "0.5").otherwise(
          when(col("etype") === 2048, "0.9").otherwise("0.99")).as("quantile"))
      .agg(sum("bytes").cast("double").as("value"))
      .select(lit("graft_flush_duration").as("metric"), col("quantile"), col("ts"), col("value"))

  /** `avg(metric) by (quantile)` — the summary-panel aggregation. */
  def avgByQuantile(samples: DataFrame): DataFrame =
    samples.groupBy("metric", "quantile")
      .agg(round(sum("value") / count(lit(1)), 6).as("avg_value"))

  // --------------------------------------------------------------- registry

  def opsRateSum(spark: SparkSession, dir: String): DataFrame =
    slidingIncrease(counterSamples(spark, dir), 300L)
      .groupBy("metric", "ts")
      .agg(round(sum("increase") / 300, 6).as("rate_sum"))
      .orderBy("metric", "ts")

  def opsAvgByQuantile(spark: SparkSession, dir: String): DataFrame =
    avgByQuantile(summarySamples(spark, dir)).orderBy("metric", "quantile")

  /** `histogram_quantile(φ, bucket)` — the PromQL histogram finalizer:
    * per instance, cumulative `le`-bucket counts over the byte sizes
    * (the shape a Prometheus client exports), then linear interpolation
    * inside the first bucket whose cumulative count reaches `φ·total`,
    * with the standard edge rules (the +Inf bucket clamps to the highest
    * finite `le`; the first bucket interpolates from 0). Both cascades
    * (p50, p95) are CASE chains whose arithmetic — integer counts, one
    * `φ·total` product, one subtraction pair, one division — is written
    * in the SAME expression shape in the oracle, so every branch is
    * bit-deterministic across engines. One hash aggregate; bucket count
    * is a constant (4 finite les), so the row is fixed-width however
    * many flows an instance saw. */
  def histogramQuantile(spark: SparkSession, dir: String): DataFrame = {
    val flows = FlowAdapter.flows(spark, dir)
    val les = HistLes
    val hist = flows
      .groupBy(col("src_as").cast("string").as("instance"))
      .agg(count(lit(1)).as("total"),
        les.map(le => sum(when(col("bytes") <= le, 1L).otherwise(0L)).as(s"le_$le")): _*)
    def hq(phi: Double): Column = {
      val target = lit(phi) * col("total")
      val bounds = (0L +: les).sliding(2).toSeq // (lower, upper) per bucket
      val cases = bounds.foldRight(lit(les.last.toDouble)) { (b, els) =>
        val (lo, hi) = (b.head, b.last)
        val cumLo = if (lo == 0L) lit(0L) else col(s"le_$lo")
        val cumHi = col(s"le_$hi")
        when(cumHi >= target,
          lit(lo.toDouble) + (lit((hi - lo).toDouble) * ((target - cumLo) / (cumHi - cumLo))))
          .otherwise(els)
      }
      round(cases, 6)
    }
    hist.select(col("instance") +: col("total") +:
        les.map(le => col(s"le_$le")) :+
        hq(0.5).as("p50") :+ hq(0.95).as("p95"): _*)
      .orderBy("instance")
  }

  val queries: Map[String, Q] = Map(
    "ops_rate_sum" -> (opsRateSum _),
    "ops_histogram_quantile" -> (histogramQuantile _),
    "ops_avg_by_quantile" -> (opsAvgByQuantile _))

  /** The histogram_quantile CASE cascade in DuckDB SQL, generated from
    * the SAME les/bounds so the two renderings cannot drift (the
    * EventOps WeekSec interpolation rule). */
  private def duckHq(phi: String): String = {
    val les = HistLes
    val target = s"(CAST($phi AS DOUBLE) * total)"
    val cases = (0L +: les).sliding(2).map { b =>
      val (lo, hi) = (b.head, b.last)
      val cumLo = if (lo == 0L) "0" else s"le_$lo"
      s"WHEN le_$hi >= $target THEN CAST($lo AS DOUBLE) + " +
        s"(CAST(${hi - lo} AS DOUBLE) * (($target - $cumLo) / (le_$hi - $cumLo)))"
    }.mkString(" ")
    s"round(CASE $cases ELSE CAST(${les.last} AS DOUBLE) END, 6)"
  }

  val oracles: Map[String, String] = Map(
    "ops_histogram_quantile" ->
      s"""${FlowAdapter.ducksql.trim},
         | hist AS (
         |   SELECT CAST(src_as AS VARCHAR) AS instance, count(*) AS total,
         |     ${HistLes.map(le => s"CAST(sum(CASE WHEN bytes <= $le THEN 1 ELSE 0 END) AS BIGINT) AS le_$le").mkString(", ")}
         |   FROM flows GROUP BY 1)
         | SELECT instance, total, ${HistLes.map(le => s"le_$le").mkString(", ")},
         |   ${duckHq("0.5")} AS p50, ${duckHq("0.95")} AS p95
         | FROM hist ORDER BY instance""".stripMargin.replace('\n', ' '),
    "ops_rate_sum" ->
      s"""${FlowAdapter.ducksql.trim},
         | per_slot AS (
         |   SELECT CAST(src_as AS VARCHAR) AS instance,
         |     (time_received // 30) * 30 AS ts,
         |     count(*) AS flows, CAST(sum(bytes) AS BIGINT) AS bytes
         |   FROM flows GROUP BY 1, 2),
         | samples AS (
         |   SELECT 'graft_flows_total' AS metric, instance, ts,
         |     CAST(sum(flows) OVER (PARTITION BY instance ORDER BY ts
         |       ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS value FROM per_slot
         |   UNION ALL
         |   SELECT 'graft_bytes_total' AS metric, instance, ts,
         |     CAST(sum(bytes) OVER (PARTITION BY instance ORDER BY ts
         |       ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS value FROM per_slot),
         | deltas AS (
         |   SELECT metric, instance, ts,
         |     CASE WHEN lag(value) OVER w IS NULL THEN 0.0
         |          WHEN value >= lag(value) OVER w THEN value - lag(value) OVER w
         |          ELSE value END AS d
         |   FROM samples WINDOW w AS (PARTITION BY metric, instance ORDER BY ts)),
         | incs AS (
         |   SELECT metric, instance, ts,
         |     sum(d) OVER (PARTITION BY metric, instance ORDER BY ts
         |       RANGE BETWEEN 299 PRECEDING AND CURRENT ROW) AS increase
         |   FROM deltas)
         | SELECT metric, ts, round(sum(increase) / 300, 6) AS rate_sum
         | FROM incs GROUP BY 1, 2 ORDER BY metric, ts""".stripMargin.replace('\n', ' '),
    "ops_avg_by_quantile" ->
      s"""${FlowAdapter.ducksql.trim},
         | samples AS (
         |   SELECT 'graft_flush_duration' AS metric,
         |     CASE WHEN proto = 6 THEN '0.5'
         |          WHEN etype = 2048 THEN '0.9' ELSE '0.99' END AS quantile,
         |     (time_received // 30) * 30 AS ts,
         |     CAST(sum(bytes) AS DOUBLE) AS value
         |   FROM flows GROUP BY 1, 2, 3)
         | SELECT metric, quantile, round(sum(value) / count(*), 6) AS avg_value
         | FROM samples GROUP BY 1, 2 ORDER BY metric, quantile""".stripMargin.replace('\n', ' '))
}
