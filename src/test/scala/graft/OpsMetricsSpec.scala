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

  test("histogram_quantile: interpolation + edge rules replay driver-side (r12)") {
    val rows = OpsMetrics.histogramQuantile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    val les = Seq(500L, 1000L, 2000L, 4000L)
    def replay(phi: Double, total: Long, cums: Seq[Long]): Double = {
      val target = phi * total
      val bounds = (0L +: les).zip(les).zip(0L +: cums).zip(cums)
      bounds.collectFirst {
        case (((lo, hi), cumLo), cumHi) if cumHi >= target =>
          lo.toDouble + ((hi - lo).toDouble * ((target - cumLo) / (cumHi - cumLo)))
      }.map(v => math.rint(v * 1e6) / 1e6).getOrElse(les.last.toDouble)
    }
    rows.foreach { case (inst, total, l5, l10, l20, l40, p50, p95) =>
      val cums = Seq(l5, l10, l20, l40)
      assert(math.abs(p50 - replay(0.5, total, cums)) < 1e-6, s"$inst p50")
      assert(math.abs(p95 - replay(0.95, total, cums)) < 1e-6, s"$inst p95")
      // cumulative les are monotone and bounded by total
      assert(cums === cums.sorted && l40 <= total)
      // the quantile lives inside the bucket bounds
      assert(p50 >= 0.0 && p50 <= les.last && p95 >= p50)
    }
  }
}
