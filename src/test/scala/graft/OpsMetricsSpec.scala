package graft

import org.apache.spark.sql.functions._
import graft.operators.OpsMetrics

/** PromQL-semantics checks for the ops query surface (A7): reset-aware
  * increase, sliding rate, BY-clause sums.
  */
class OpsMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private def samples(rows: (String, Long, Double)*) =
    rows.toSeq.toDF("instance", "ts", "value")
      .select(lit("c_total").as("metric"), col("instance"), col("ts"), col("value"))

  test("counter reset: the post-restart value counts as growth, monotone deltas are diffs") {
    val s = samples(
      ("a", 0L, 10.0), ("a", 30L, 25.0), ("a", 60L, 5.0), ("a", 90L, 8.0))
    val d = OpsMetrics.perStepIncrease(s)
      .orderBy("ts").select("d").collect().map(_.getDouble(0))
    // first sample no interval; +15; RESET (5 < 25) -> 5; +3
    assert(d.toSeq === Seq(0.0, 15.0, 5.0, 3.0))
  }

  test("rate window covers exactly (t - range, t]") {
    val s = samples(
      ("a", 0L, 0.0), ("a", 30L, 30.0), ("a", 60L, 90.0), ("a", 120L, 120.0))
    val r = OpsMetrics.rate(s, 60L).orderBy("ts")
      .select("ts", "rate").collect().map(x => (x.getLong(0), x.getDouble(1)))
    // t=60: deltas at 30 (+30) and 60 (+60) are inside (0, 60] -> 90/60
    assert(r.find(_._1 == 60L).get._2 === 1.5)
    // t=120: only the delta at 120 (+30) is inside (60, 120] -> 30/60
    assert(r.find(_._1 == 120L).get._2 === 0.5)
  }

  test("sum(rate) by instance aggregates series, not samples") {
    val s = samples(
      ("a", 0L, 0.0), ("a", 30L, 60.0),
      ("b", 0L, 0.0), ("b", 30L, 120.0))
    val out = OpsMetrics.sumRateBy(s, 60L, Seq(col("ts")))
      .filter(col("ts") === 30L).select("rate_sum").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(3.0)) // (60 + 120) / 60
  }
}
