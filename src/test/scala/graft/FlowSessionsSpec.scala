package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.flow.{FlowGen, FlowMessage}
import graft.streaming.FlowSessions

class FlowSessionsSpec extends SparkTestBase {
  import spark.implicits._

  private def msgsAt(n: Int, seed: Long, baseTime: Long): Seq[FlowMessage] =
    FlowGen.flows(spark, n, seed, baseTime, ratePerSec = 10).collect().toSeq

  test("streaming sessionization: gap timeout closes sessions; totals match batch oracle") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val q = FlowSessions.sessionize(src.toDF(), gapSeconds = 60, lateness = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    // burst 1 at t0, burst 2 same records' keys at t0+1h (> gap) —
    // same 5-tuples reappear, so burst 1's sessions must close
    val b1 = msgsAt(50, seed = 31, baseTime = 1704067200L)
    val b2 = b1.map(m => m.copy(timeReceived = m.timeReceived + 3600))
    // far-future records push the watermark past earlier sessions' timeouts
    val p1 = msgsAt(1, seed = 32, baseTime = 1704200000L)
    val p2 = msgsAt(1, seed = 33, baseTime = 1704300000L)
    src.addData(b1); q.processAllAvailable()
    src.addData(b2); q.processAllAvailable()
    src.addData(p1); q.processAllAvailable()
    src.addData(p2); q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions")
    // batch oracle over the identical input
    val oracle = FlowSessions.sessionizeBatch((b1 ++ b2 ++ p1 ++ p2).toDS().toDF(), gapSeconds = 60)
    // every burst-1 session must be closed and equal the oracle rows
    val got = sessions.select("key", "start", "end", "bytes", "packets", "flows")
      .collect().map(_.toSeq).toSet
    val want = oracle.select("key", "start", "end", "bytes", "packets", "flows")
      .collect().map(_.toSeq).toSet
    assert(got.subsetOf(want), "streaming emitted a session the batch oracle doesn't have")
    // burst-1 sessions (ended before t0+1h) are all closed
    val wantClosed = oracle.filter(col("end") < 1704067200L + 3600)
      .select("key", "start", "end", "bytes", "packets", "flows")
      .collect().map(_.toSeq).toSet
    assert(wantClosed.subsetOf(got), s"missing closed sessions: ${(wantClosed -- got).size}")
    assert(got.nonEmpty)
  }

  test("late cross-batch observation lowers the session start (r7 review)") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val q = FlowSessions.sessionize(src.toDF(), gapSeconds = 300, lateness = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("late_sessions").start()
    val base = msgsAt(1, seed = 41, baseTime = 2000L).head
    // batch 1: ts=2000 opens the session; batch 2: a LATE ts=1900 within
    // both the watermark and the gap envelope must merge AND lower start
    // (the old merge kept start=2000, a session containing bytes from
    // before its own start); a far-future key then closes it via timeout
    src.addData(base.copy(timeReceived = 2000L)); q.processAllAvailable()
    src.addData(base.copy(timeReceived = 1900L)); q.processAllAvailable()
    val pusher = msgsAt(1, seed = 42, baseTime = 100000L)
    src.addData(pusher); q.processAllAvailable()
    src.addData(msgsAt(1, seed = 43, baseTime = 200000L)); q.processAllAvailable()
    q.stop()
    val s = spark.table("late_sessions").filter(col("start") < 100000L)
      .select("start", "end", "flows").collect()
    assert(s.length === 1, s"expected one merged session, got ${s.toSeq}")
    assert(s.head.getLong(0) === 1900L, "late observation must lower the start")
    assert(s.head.getLong(1) === 2000L)
    assert(s.head.getLong(2) === 2L)
  }

  test("out-of-era late observations within gap merge into one session (r7 advisory)") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    // generous lateness so the out-of-era rows are admitted by the watermark
    val q = FlowSessions.sessionize(src.toDF(), gapSeconds = 60, lateness = "3 hours")
      .writeStream.outputMode("append").format("memory").queryName("stale_sessions").start()
    val base = msgsAt(1, seed = 51, baseTime = 10000L).head
    // batch 1: the live era opens at ts=10000
    src.addData(base.copy(timeReceived = 10000L)); q.processAllAvailable()
    // batch 2: three observations hours BEFORE the live era, 30s apart
    // (within one gap of each other) plus one isolated at ts=500 — state
    // for their era is gone, but the three must emit as ONE session and
    // the isolated one as its own, not four singletons
    src.addData(Seq(
      base.copy(timeReceived = 500L),
      base.copy(timeReceived = 3000L),
      base.copy(timeReceived = 3030L),
      base.copy(timeReceived = 3060L)))
    q.processAllAvailable()
    // push the watermark to close everything
    src.addData(msgsAt(1, seed = 52, baseTime = 200000L)); q.processAllAvailable()
    src.addData(msgsAt(1, seed = 53, baseTime = 400000L)); q.processAllAvailable()
    q.stop()
    val s = spark.table("stale_sessions").filter(col("start") < 10000L)
      .orderBy("start").select("start", "end", "flows").collect()
    assert(s.length === 2, s"expected two stale sessions, got ${s.toSeq}")
    assert(s(0).getLong(0) === 500L && s(0).getLong(2) === 1L)
    assert(s(1).getLong(0) === 3000L && s(1).getLong(1) === 3060L && s(1).getLong(2) === 3L)
  }

  test("stale observation inside the FINAL lowered envelope folds into the live session (r8 review)") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val q = FlowSessions.sessionize(src.toDF(), gapSeconds = 60, lateness = "2 hours")
      .writeStream.outputMode("append").format("memory").queryName("fold_sessions").start()
    val base = msgsAt(1, seed = 61, baseTime = 10000L).head
    // batch 1 opens the era at ts=10000
    src.addData(base.copy(timeReceived = 10000L)); q.processAllAvailable()
    // batch 2 sorted = [9935, 9945]: 9935 is classified stale against the
    // era start 10000, then 9945 merges and LOWERS the start to 9945 —
    // bringing 9935 inside the final gap envelope. It must fold into the
    // live session, not emit as a singleton.
    src.addData(Seq(base.copy(timeReceived = 9935L), base.copy(timeReceived = 9945L)))
    q.processAllAvailable()
    src.addData(msgsAt(1, seed = 62, baseTime = 200000L)); q.processAllAvailable()
    src.addData(msgsAt(1, seed = 63, baseTime = 400000L)); q.processAllAvailable()
    q.stop()
    val s = spark.table("fold_sessions").filter(col("start") < 100000L)
      .select("start", "end", "flows").collect()
    assert(s.length === 1, s"expected ONE folded session, got ${s.toSeq}")
    assert(s.head.getLong(0) === 9935L && s.head.getLong(1) === 10000L)
    assert(s.head.getLong(2) === 3L)
  }

  test("stale-session fold runs to a fixpoint in descending end order (r9 advisory)") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val q = FlowSessions.sessionize(src.toDF(), gapSeconds = 60, lateness = "2 hours")
      .writeStream.outputMode("append").format("memory").queryName("fixpoint_sessions").start()
    val base = msgsAt(1, seed = 71, baseTime = 10000L).head
    src.addData(base.copy(timeReceived = 10000L)); q.processAllAvailable()
    // one batch, sorted pass: 9500 stale, 9700 stale, 9930 stale (vs the
    // era start 10000), 9945 merges and lowers the start to 9945. The fold
    // then walks stale sessions by DESCENDING end: [9930] is adjacent to
    // the lowered envelope and folds in; [9700] and [9500] stay separate
    // (each > gap below the envelope even after every preceding fold).
    src.addData(Seq(
      base.copy(timeReceived = 9500L),
      base.copy(timeReceived = 9700L),
      base.copy(timeReceived = 9930L),
      base.copy(timeReceived = 9945L)))
    q.processAllAvailable()
    src.addData(msgsAt(1, seed = 72, baseTime = 200000L)); q.processAllAvailable()
    src.addData(msgsAt(1, seed = 73, baseTime = 400000L)); q.processAllAvailable()
    q.stop()
    val s = spark.table("fixpoint_sessions").filter(col("start") < 100000L)
      .orderBy("start").select("start", "end", "flows").collect()
    assert(s.length === 3, s"expected three sessions, got ${s.toSeq}")
    assert(s(0).getLong(0) === 9500L && s(0).getLong(2) === 1L)
    assert(s(1).getLong(0) === 9700L && s(1).getLong(2) === 1L)
    assert(s(2).getLong(0) === 9930L && s(2).getLong(1) === 10000L && s(2).getLong(2) === 3L)
  }

  test("batch sessionization merges within gap, splits across it") {
    val base = 1704067200L
    val mk = (ts: Long) => FlowGen.flows(spark, 1, seed = 40, baseTime = ts).head()
    val one = mk(base)
    val flows = Seq(one, one.copy(timeReceived = base + 30),
      one.copy(timeReceived = base + 500))
    val s = FlowSessions.sessionizeBatch(flows.toDS().toDF(), gapSeconds = 60)
      .orderBy("start").collect()
    assert(s.length === 2)
    assert(s(0).getAs[Long]("flows") === 2 && s(1).getAs[Long]("flows") === 1)
    assert(s(0).getAs[Long]("duration") === 30)
  }
}
