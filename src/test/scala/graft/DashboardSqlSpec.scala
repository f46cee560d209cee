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
      "instant_traffic_interval" -> FlowQueries.rateInterval(spark, sf, 30L),
      "instant_traffic_1m_interval" -> FlowQueries.rate1mInterval(spark, sf, 30L),
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
      "instant_traffic_interval" -> FlowQueries.rateInterval(spark, sf, 30L, Some(range)),
      "instant_traffic_1m_interval" -> FlowQueries.rate1mInterval(spark, sf, 30L, Some(range)),
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
    // and the SQL surface gets the same parquet pushdown as the DataFrame
    // path: the raw-ts companion bound must reach the scan (r10: the NTZ
    // regeneration silently dropped it for a round)
    val rawPlan = spark.sql(DashboardSql.render(spark, "top_src_ip", Some(range)))
      .queryExecution.sparkPlan.toString
    assert(rawPlan.contains("GreaterThanOrEqual(ts") && rawPlan.contains("LessThan(ts"),
      s"raw-ts bound not pushed on the SQL surface:\n${rawPlan.take(2000)}")
  }

  test("managed twins: panel SQL equals the managed DataFrame twin; cold files skip at the manifest (r9)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.flow.{FlowGen, FlowMessage}
    import graft.streaming.{FlowStreams, ManifestTable}
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def tmp(): String = java.nio.file.Files.createTempDirectory("graft_dash_m").toString
    val rawT = tmp(); val rollT = tmp()
    val src = MemoryStream[FlowMessage]
    val q1 = FlowStreams.startRawMVManaged(src.toDF(), rawT, tmp())
    val q2 = FlowStreams.startRollupMVManaged(src.toDF(), rollT, tmp())
    // two batches two days apart → committed files with disjoint recorded
    // (min,max) timeReceived / timeslot
    val day1 = 1704067200L
    val b1 = FlowGen.flows(spark, 300, seed = 91, baseTime = day1).collect().toSeq
    val b2 = FlowGen.flows(spark, 300, seed = 92, baseTime = day1 + 2 * 86400).collect().toSeq
    src.addData(b1); q1.processAllAvailable(); q2.processAllAvailable()
    src.addData(b2); q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()
    val range = TimeRange(day1, day1 + 86400)
    DashboardSql.registerManaged(spark, rawT, rollT, Some(range))
    // the range covers only batch 1: batch-2 files must be skipped AT THE
    // MANIFEST for both tables (no footer read, no Spark file listing)
    val (rSel, rTot) = ManifestTable.lastPruneStats(rawT).get
    assert(rSel < rTot, s"raw manifest skip must drop cold files: $rSel of $rTot")
    val (sSel, sTot) = ManifestTable.lastPruneStats(rollT).get
    assert(sSel < sTot, s"rollup manifest skip must drop cold files: $sSel of $sTot")
    // panel SQL == DataFrame twin over the SAME managed range reads
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
    val trafficTwin = FlowStreams.readRawManagedRange(spark, rawT, range.from, range.until)
      .groupBy(((col("timeReceived") / 30).cast("long") * 30).as("bucket"))
      .agg((sum(col("bytes") * col("samplingRate")) * 8).as("sum_bits"),
        ((sum(col("bytes") * col("samplingRate")) * 8) / 30.0d).as("rate_bps"))
      .orderBy("bucket")
    val trafficSql = DashboardSql.runManaged(spark, "m_instant_traffic_30s", Some(range))
    assert(trafficSql.schema.fieldNames.toSeq === trafficTwin.schema.fieldNames.toSeq)
    assert(rows(trafficSql).nonEmpty && rows(trafficSql) === rows(trafficTwin))
    val topTwin = FlowStreams.readRawManagedRange(spark, rawT, range.from, range.until)
      .select(expr(
        "IF(etype = 2048, ip4_ntoa(reinterpret_uint32(srcAddr)), ip6_ntoa(srcAddr))").as("addr"),
        col("bytes"), col("samplingRate"))
      .groupBy("addr")
      .agg(count(lit(1)).as("flow_count"),
        sum(col("bytes") * col("samplingRate")).as("sum_bytes"))
      .orderBy(desc("sum_bytes"), asc("addr")).limit(10)
    val topSql = DashboardSql.runManaged(spark, "m_top_src_ip", Some(range))
    assert(rows(topSql).nonEmpty && rows(topSql) === rows(topTwin),
      "m_top_src_ip must equal the managed DataFrame twin")
    // r11: the remaining four panels (viz-ch.json:74,358,479,604) bind the
    // managed path too — every reference dashboard panel now has a
    // manifest-range twin
    assert(DashboardSql.managedPanels.keySet === Set(
      "m_instant_traffic_30s", "m_instant_traffic_1m", "m_instant_traffic_interval",
      "m_instant_traffic_1m_interval",
      "m_top_src_ip", "m_top_dst_ip", "m_top_src_port", "m_top_dst_port",
      "m_rollup_read"),
      "all seven reference panels (+ both $__interval forms) must have managed twins")
    val traffic1mTwin = FlowStreams.readRawManagedRange(spark, rawT, range.from, range.until)
      .groupBy(((col("timeReceived") / 60).cast("long") * 60).as("bucket"))
      .agg(sum(col("bytes") * col("samplingRate")).as("sum_bytes"))
      .withColumn("bucket_ms", col("bucket") * 1000)
      .orderBy("bucket")
    val traffic1mSql = DashboardSql.runManaged(spark, "m_instant_traffic_1m", Some(range))
    assert(traffic1mSql.schema.fieldNames.toSeq === traffic1mTwin.schema.fieldNames.toSeq)
    assert(rows(traffic1mSql).nonEmpty && rows(traffic1mSql) === rows(traffic1mTwin),
      "m_instant_traffic_1m must equal the managed DataFrame twin")
    val topDstTwin = FlowStreams.readRawManagedRange(spark, rawT, range.from, range.until)
      .select(expr(
        "IF(etype = 2048, ip4_ntoa(reinterpret_uint32(dstAddr)), ip6_ntoa(dstAddr))").as("addr"),
        col("bytes"), col("samplingRate"))
      .groupBy("addr")
      .agg(count(lit(1)).as("flow_count"),
        sum(col("bytes") * col("samplingRate")).as("sum_bytes"))
      .orderBy(desc("sum_bytes"), asc("addr")).limit(10)
    val topDstSql = DashboardSql.runManaged(spark, "m_top_dst_ip", Some(range))
    assert(rows(topDstSql).nonEmpty && rows(topDstSql) === rows(topDstTwin),
      "m_top_dst_ip must equal the managed DataFrame twin")
    def portTwin(c: String) = FlowStreams.readRawManagedRange(spark, rawT, range.from, range.until)
      .groupBy(col(c).as("port"))
      .agg(count(lit(1)).as("flow_count"),
        sum(col("bytes") * col("samplingRate")).as("sum_bytes"))
      .orderBy(desc("sum_bytes"), asc("port")).limit(10)
    for ((panel, wireCol) <- Seq("m_top_src_port" -> "srcPort", "m_top_dst_port" -> "dstPort")) {
      val twin = portTwin(wireCol)
      val viaSql = DashboardSql.runManaged(spark, panel, Some(range))
      assert(viaSql.schema.fieldNames.toSeq === twin.schema.fieldNames.toSeq)
      assert(rows(viaSql).nonEmpty && rows(viaSql) === rows(twin),
        s"$panel must equal the managed DataFrame twin")
    }
    val rollTwin = FlowStreams.readRollupManagedRange(spark, rollT, range.from, range.until)
      .groupBy(col("srcAS").as("src_as"), col("dstAS").as("dst_as"))
      .agg(sum("sum_bytes").as("total_bytes"), sum("sum_packets").as("total_packets"),
        sum("flow_count").as("total_flows"))
      .orderBy("src_as", "dst_as")
    val rollSql = DashboardSql.runManaged(spark, "m_rollup_read", Some(range))
    assert(rows(rollSql).nonEmpty && rows(rollSql) === rows(rollTwin),
      "m_rollup_read must equal the managed DataFrame twin")
    // unbounded registration reads everything: the range view was a strict
    // subset (the bound is real, not a tautology)
    DashboardSql.registerManaged(spark, rawT, rollT, None)
    val allBuckets = DashboardSql.runManaged(spark, "m_instant_traffic_30s").count()
    assert(trafficSql.count() < allBuckets,
      "the bounded managed view must exclude the cold day's buckets")
  }

  test("$__interval panel: two widths both match their DataFrame twin; width 30 IS the pinned panel (r14)") {
    DashboardSql.register(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
    // width 30: the parameterized form reproduces the oracle-checked
    // pinned panel bit-for-bit (rate_bps divisions run in the same engine)
    val at30 = DashboardSql.run(spark, "instant_traffic_interval", intervalSec = 30L)
    assert(rows(at30).nonEmpty && rows(at30) === rows(FlowQueries.rate30s(spark, sf)))
    // a NON-panel width: SQL text and DataFrame twin agree (the DataFrame
    // form is itself oracle-checked at width 120 via flow_rate_interval)
    val at45 = DashboardSql.run(spark, "instant_traffic_interval", intervalSec = 45L)
    assert(rows(at45).nonEmpty && rows(at45) === rows(FlowQueries.rateInterval(spark, sf, 45L)))
    // widths genuinely differ (45 s coarsens the bucket count)
    assert(at45.count() < at30.count())
    // time bound composes with the interval binding
    val mm = spark.table("flows_raw")
      .agg(org.apache.spark.sql.functions.min("time_received"),
        org.apache.spark.sql.functions.max("time_received")).head()
    val range = TimeRange(mm.getLong(0), mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2)
    val bound = DashboardSql.run(spark, "instant_traffic_interval", Some(range), 45L)
    assert(rows(bound) === rows(FlowQueries.rateInterval(spark, sf, 45L, Some(range))))
  }

  test("$__interval byte-sum panel: width 60 IS the pinned 1m panel; non-panel width matches its twin (r15)") {
    DashboardSql.register(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
    val at60 = DashboardSql.run(spark, "instant_traffic_1m_interval", intervalSec = 60L)
    assert(rows(at60).nonEmpty && rows(at60) === rows(FlowQueries.rate1m(spark, sf)))
    // the DataFrame form is oracle-checked at width 90 via
    // flow_rate_1m_interval; here SQL text and DataFrame agree at 90 too
    val at90 = DashboardSql.run(spark, "instant_traffic_1m_interval", intervalSec = 90L)
    assert(rows(at90).nonEmpty && rows(at90) === rows(FlowQueries.rate1mInterval(spark, sf, 90L)))
    assert(at90.count() < at60.count(), "90 s coarsens the bucket count")
  }
}
