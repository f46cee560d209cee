package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import graft.GraftFunctions._
import graft.flow.FlowAdapter
import graft.functions.Ip4Ntoa
import graft.plans.RenderAfterAggregate

class RenderAfterAggregateSpec extends SparkTestBase {

  test("group-by-rendered-address rewrites to numeric grouping with post-agg render") {
    def naiveDf() = FlowAdapter.flows(spark, sf)
      .filter(col("etype") === 2048)
      .groupBy(ip4_ntoa(col("src_ip")).as("addr"))
      .agg(count(lit(1)).as("n"), sum(col("bytes")).as("b"))
    try {
      spark.experimental.extraOptimizations = Seq(RenderAfterAggregate)
      val withRule = naiveDf()
      val aggs = withRule.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
      assert(aggs.nonEmpty)
      // the rendered codec no longer appears in any grouping key
      aggs.foreach { a =>
        assert(!a.groupingExpressions.exists(_.exists(_.isInstanceOf[Ip4Ntoa])),
          s"render still in grouping: ${a.groupingExpressions}")
      }
      val got = withRule.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

      spark.experimental.extraOptimizations = Nil
      val expected = naiveDf().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("v4 renders group on the MASKED input: longs equal mod 2^32 stay one group") {
    import spark.implicits._
    try {
      spark.experimental.extraOptimizations = Seq(RenderAfterAggregate)
      // 4294967295 and -1 render identically ('255.255.255.255'); 5 and
      // 2^32+5 render '0.0.0.5' — grouping on the raw long would split
      // each pair into two rows with identical addr (r7 review finding)
      val df = Seq(4294967295L, -1L, 5L, 4294967301L, 5L).toDF("ip")
        .groupBy(ip4_ntoa(col("ip")).as("addr"))
        .agg(count(lit(1)).as("n"))
      val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === Map("255.255.255.255" -> 2L, "0.0.0.5" -> 3L))
      // and the rewrite actually fired (no render left in grouping keys)
      val aggs = df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
      aggs.foreach(a =>
        assert(!a.groupingExpressions.exists(_.exists(_.isInstanceOf[Ip4Ntoa]))))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("renders nested inside aggregate functions are left untouched") {
    try {
      spark.experimental.extraOptimizations = Seq(RenderAfterAggregate)
      // addr appears inside max(...) — not a bare grouping reference, so the
      // conservative guard must refuse the rewrite and keep results correct
      val df = FlowAdapter.flows(spark, sf)
        .filter(col("etype") === 2048)
        .groupBy(ip4_ntoa(col("src_ip")).as("addr"))
        .agg(max(ip4_ntoa(col("src_ip"))).as("m"))
      val rows = df.collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getString(0) === r.getString(1)))
    } finally spark.experimental.extraOptimizations = Nil
  }
}
