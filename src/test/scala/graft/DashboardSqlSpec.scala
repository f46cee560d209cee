package graft

import graft.flow.{DashboardSql, FlowQueries}

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
}
