package graft

import graft.flow.{DashboardSql, FlowQueries, TimeRange}

/** The SQL-text surface contract: every panel SQL string produces exactly
  * the rows (values, names, order) of its DataFrame library counterpart —
  * which is the oracle-checked registry query, so the SQL surface inherits
  * driver-verified correctness transitively.
  */
class DashboardSqlSpec extends SparkTestBase {

  test("every panel SQL string reproduces its DataFrame query exactly") {
    DashboardSql.register(spark, sf)
    val expects = Map(
      "instant_traffic_30s" -> FlowQueries.rate30s(spark, sf),
      "instant_traffic_1m" -> FlowQueries.rate1m(spark, sf),
      "top_src_ip" -> FlowQueries.topSrcIp(spark, sf),
      "top_dst_ip" -> FlowQueries.topDstIp(spark, sf),
      "top_src_port" -> FlowQueries.topSrcPort(spark, sf),
      "top_dst_port" -> FlowQueries.topDstPort(spark, sf),
      "rollup_read" -> FlowQueries.rollupReagg(spark, sf))
    assert(DashboardSql.panels.keySet === expects.keySet,
      "every panel has a DataFrame counterpart and vice versa")
    expects.foreach { case (name, df) =>
      val viaSql = DashboardSql.run(spark, name)
      assert(viaSql.schema.fieldNames.toSeq === df.schema.fieldNames.toSeq,
        s"$name: column names/order differ")
      val got = viaSql.collect().map(_.toSeq).toSeq
      val want = df.collect().map(_.toSeq).toSeq
      assert(got.nonEmpty, s"$name: empty result")
      assert(got === want, s"$name: SQL text and DataFrame results differ")
    }
  }

  test("time-bounded panels: $timeFilter binds (from, until) and matches the range-filtered twin") {
    DashboardSql.register(spark, sf)
    // a 5-min-aligned half-open range covering the lower half of the data:
    // non-trivial (drops rows) for every panel, aligned so raw-row and
    // bucket-level filtering agree on the rollup
    val mm = spark.table("flows_raw")
      .agg(org.apache.spark.sql.functions.min("time_received"),
        org.apache.spark.sql.functions.max("time_received")).head()
    val (t0, t1) = (mm.getLong(0), mm.getLong(1))
    val range = TimeRange(t0, t0 + (((t1 - t0) / 2) / 300).max(1) * 300)
    val expects = Map(
      "instant_traffic_30s" -> FlowQueries.rate30s(spark, sf, Some(range)),
      "instant_traffic_1m" -> FlowQueries.rate1m(spark, sf, Some(range)),
      "top_src_ip" -> FlowQueries.topSrcIp(spark, sf, Some(range)),
      "top_dst_ip" -> FlowQueries.topDstIp(spark, sf, Some(range)),
      "top_src_port" -> FlowQueries.topSrcPort(spark, sf, Some(range)),
      "top_dst_port" -> FlowQueries.topDstPort(spark, sf, Some(range)),
      "rollup_read" -> FlowQueries.rollupReagg(spark, sf, Some(range)))
    assert(expects.keySet === DashboardSql.panels.keySet)
    expects.foreach { case (name, df) =>
      val sql = DashboardSql.render(spark, name, Some(range))
      assert(!sql.contains("$timeFilter"), s"$name: unbound placeholder")
      val viaSql = spark.sql(sql)
      assert(viaSql.schema.fieldNames.toSeq === df.schema.fieldNames.toSeq,
        s"$name: column names/order differ")
      val got = viaSql.collect().map(_.toSeq).toSeq
      val want = df.collect().map(_.toSeq).toSeq
      assert(got.nonEmpty, s"$name: empty time-bounded result")
      assert(got === want, s"$name: time-bounded SQL and DataFrame twin differ")
    }
    // the bound is real: at least one panel loses rows vs the all-time form
    val allBuckets = DashboardSql.run(spark, "instant_traffic_30s").count()
    val boundBuckets = DashboardSql.run(spark, "instant_traffic_30s", Some(range)).count()
    assert(boundBuckets < allBuckets, "time filter should exclude some buckets")
  }
}
