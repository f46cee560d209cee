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
