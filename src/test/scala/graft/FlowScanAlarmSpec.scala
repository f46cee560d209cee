package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.flow.{FlowGen, FlowMessage}
import graft.streaming.FlowScanAlarm

class FlowScanAlarmSpec extends SparkTestBase {
  import spark.implicits._

  private def msgsAt(n: Int, seed: Long, baseTime: Long): Seq[FlowMessage] =
    FlowGen.flows(spark, n, seed, baseTime, ratePerSec = 10).collect().toSeq

  private def withPorts(base: FlowMessage, ports: Seq[Int], t0: Long): Seq[FlowMessage] =
    ports.zipWithIndex.map { case (p, i) =>
      base.copy(dstPort = p, timeReceived = t0 + i)
    }

  test("scan alarm fires once at the threshold crossing; quiet hosts stay quiet") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val q = FlowScanAlarm.alarms(src.toDF(), windowSeconds = 3600, minPorts = 5,
        lateness = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("alarms").start()
    val scanner = msgsAt(1, seed = 61, baseTime = 1704067200L).head
    val quiet = msgsAt(1, seed = 62, baseTime = 1704067200L).head
    // distinct srcAddr for the two roles
    val scannerMsgs = withPorts(scanner, Seq(10, 11, 12, 13, 14, 15, 16), 1704067200L)
    val quietMsgs = withPorts(quiet.copy(srcAddr = scanner.srcAddr.map(b => (b ^ 0x7).toByte)),
      Seq(20, 20, 20, 21), 1704067200L)
    src.addData(scannerMsgs ++ quietMsgs); q.processAllAvailable()
    q.stop()
    val got = spark.table("alarms").as[FlowScanAlarm.ScanAlarm].collect()
    assert(got.length === 1, s"exactly one alarm, got ${got.toSeq}")
    val a = got.head
    assert(a.n_ports === 5)
    // 5th distinct port (port 14) arrives at t0+4
    assert(a.fired_at === 1704067204L)
    // batch oracle set parity
    val oracle = FlowScanAlarm.alarmsBatch((scannerMsgs ++ quietMsgs).toDS().toDF(),
      windowSeconds = 3600, minPorts = 5)
      .select("src", "window_start").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.map(x => (x.src, x.window_start)).toSet === oracle)
  }

  test("distinct ports accumulate across micro-batches; no re-fire after crossing") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val q = FlowScanAlarm.alarms(src.toDF(), windowSeconds = 3600, minPorts = 5,
        lateness = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("alarms2").start()
    val base = msgsAt(1, seed = 63, baseTime = 1704067200L).head
    // batch 1: three distinct ports — below threshold, state must carry
    src.addData(withPorts(base, Seq(1, 2, 3), 1704067200L)); q.processAllAvailable()
    assert(spark.table("alarms2").isEmpty, "below threshold must not fire")
    // batch 2: two more distinct (plus a repeat, which must not count)
    src.addData(withPorts(base, Seq(3, 4, 5), 1704067210L)); q.processAllAvailable()
    // batch 3: more scanning in the SAME window — absorbed, no second alarm
    src.addData(withPorts(base, Seq(6, 7, 8, 9), 1704067220L)); q.processAllAvailable()
    q.stop()
    val got = spark.table("alarms2").as[FlowScanAlarm.ScanAlarm].collect()
    assert(got.length === 1, s"one alarm across batches, got ${got.toSeq}")
    // port 3 repeats, so the crossing is at port 5's arrival (t0+12)
    assert(got.head.fired_at === 1704067212L)
  }

  test("bounded-buffer crossing: reverse-arrival flood resolves the same fired_at as the sorted replay") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val q = FlowScanAlarm.alarms(src.toDF(), windowSeconds = 3600, minPorts = 5,
        lateness = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("alarms_flood").start()
    val base = msgsAt(1, seed = 64, baseTime = 1704067200L).head
    // batch 1: two distinct ports carried in state -> need = 3 next batch
    src.addData(withPorts(base, Seq(900, 901), 1704067200L)); q.processAllAvailable()
    // batch 2: 100 distinct NEW ports, port i at t0+i, fed in REVERSE ts
    // order (worst case for the size-capped earliest-per-port map: every
    // observation evicts the current max), plus late duplicates of the
    // early ports and repeats of the already-counted state ports
    val t0 = 1704067300L
    val flood = (100 to 1 by -1).map(i => base.copy(dstPort = i, timeReceived = t0 + i)) ++
      Seq(base.copy(dstPort = 1, timeReceived = t0 + 500),
        base.copy(dstPort = 900, timeReceived = t0 + 1),
        base.copy(dstPort = 901, timeReceived = t0 + 2))
    src.addData(flood); q.processAllAvailable()
    q.stop()
    val got = spark.table("alarms_flood").as[FlowScanAlarm.ScanAlarm].collect()
    assert(got.length === 1, s"one alarm, got ${got.toSeq}")
    // sorted replay: new-port first occurrences at t0+1, t0+2, t0+3 —
    // the 3rd new distinct port (5th overall) completes at t0+3
    assert(got.head.fired_at === t0 + 3, s"got ${got.head}")
  }

  test("windows are independent: the same source re-alarms in a later window; state GCs on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val q = FlowScanAlarm.alarms(src.toDF(), windowSeconds = 3600, minPorts = 3,
        lateness = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("alarms3").start()
    val base = msgsAt(1, seed = 64, baseTime = 1704067200L).head
    src.addData(withPorts(base, Seq(1, 2, 3), 1704067200L)); q.processAllAvailable()
    // next window (+2h pushes the watermark past window 1's timeout)
    src.addData(withPorts(base, Seq(1, 2, 3), 1704067200L + 7200)); q.processAllAvailable()
    q.stop()
    val got = spark.table("alarms3").as[FlowScanAlarm.ScanAlarm].collect()
      .sortBy(_.window_start)
    assert(got.length === 2, s"one alarm per window, got ${got.toSeq}")
    assert(got(0).window_start + 7200 === got(1).window_start)
  }
}
