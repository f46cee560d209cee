package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.flow.{FlowGen, FlowMessage}
import graft.streaming.FlowStreams

/** End-to-end MV cascade over a MemoryStream source: raw projection table,
  * partial-append rollup with read-time re-merge (SummingMergeTree
  * semantics), OPTIMIZE-style compaction, late-data folding, watermarked
  * variant, micro-flush sink.
  */
class FlowStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_stream").toString

  private def genBatch(n: Long, seed: Long, baseTime: Long): Seq[FlowMessage] =
    FlowGen.flows(spark, n, seed, baseTime).collect().toSeq

  test("raw MV: projection + date partitioning, exactly-once append") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val out = tmp(); val cp = tmp()
    val q = FlowStreams.startRawMV(src.toDF(), out, cp)
    src.addData(genBatch(500, seed = 1, baseTime = 1704067200L))
    q.processAllAvailable()
    src.addData(genBatch(300, seed = 2, baseTime = 1704153600L)) // next day
    q.processAllAvailable()
    q.stop()
    val written = spark.read.parquet(out)
    assert(written.count() === 800)
    assert(written.select("event_date").distinct().count() === 2)
    // partition pruning works: date filter reads one partition
    val oneDay = written.filter(col("event_date") === "2024-01-02")
    assert(oneDay.count() === 300)
  }

  test("rollup MV: partials append across batches, re-merge equals direct agg, optimize folds") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val out = tmp(); val cp = tmp()
    val q = FlowStreams.startRollupMV(src.toDF(), out, cp)
    val b1 = genBatch(400, seed = 3, baseTime = 1704067200L)
    // batch 2 overlaps the same 5-min slots (late/duplicate-key data, T4)
    val b2 = genBatch(400, seed = 4, baseTime = 1704067200L)
    src.addData(b1); q.processAllAvailable()
    src.addData(b2); q.processAllAvailable()
    q.stop()

    // unmerged parts: equal keys appear once per batch (partial rows)
    val partsCount = spark.read.parquet(out).count()
    val merged = FlowStreams.readRollup(spark, out)
    val mergedCount = merged.count()
    assert(partsCount > mergedCount, "expected unmerged partial rows")

    // read-time re-merge equals a direct batch aggregation over all input
    val all = (b1 ++ b2).toDS().toDF()
    val direct = FlowStreams.rollupPartials(all)
      .select("timeslot", "srcAS", "dstAS", "sum_bytes", "flow_count")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet
    val viaStream = merged
      .select("timeslot", "srcAS", "dstAS", "sum_bytes", "flow_count")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet
    assert(direct === viaStream)

    // OPTIMIZE: folds to one row per key; reads unchanged
    FlowStreams.optimizeRollup(spark, out)
    val afterOpt = spark.read.parquet(out)
    assert(afterOpt.count() === mergedCount)
    val reread = FlowStreams.readRollup(spark, out)
      .select("timeslot", "srcAS", "dstAS", "sum_bytes", "flow_count")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet
    assert(reread === direct)
  }

  test("watermarked rollup: update-mode incremental aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val agg = FlowStreams.watermarkedRollup(src.toDF())
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("wm_rollup").start()
    src.addData(genBatch(200, seed = 5, baseTime = 1704067200L))
    q.processAllAvailable()
    val n1 = spark.table("wm_rollup").count()
    src.addData(genBatch(200, seed = 6, baseTime = 1704067500L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_rollup")
    assert(n1 > 0 && out.count() > n1)
    assert(out.select("window").distinct().count() >= 2)
  }

  test("micro-flush sink: every batch delivered exactly once to the writer") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[FlowMessage]
    val cp = tmp()
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = FlowStreams.startMicroFlushSink(src.toDF(), cp,
      batch => seen.addAndGet(batch.count()))
    src.addData(genBatch(123, seed = 7, baseTime = 1704067200L))
    q.processAllAvailable()
    src.addData(genBatch(77, seed = 8, baseTime = 1704067200L))
    q.processAllAvailable()
    q.stop()
    assert(seen.get() === 200)
  }
}
