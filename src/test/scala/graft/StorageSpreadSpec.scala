package graft

import org.apache.spark.sql.functions._

/** Focused tests for the r18 optimization helpers: [[Storage.spreadScan]]
  * (input-layout adaptation) and [[Storage.concurrently]]/[[Storage.par2]]
  * (overlapping independent driver action chains). */
class StorageSpreadSpec extends SparkTestBase {
  import spark.implicits._

  test("spreadScan widens a narrow scan to default parallelism, row set unchanged") {
    val narrow = (1L to 100L).toDF("id").coalesce(1)
    assert(narrow.rdd.getNumPartitions === 1)
    val spread = Storage.spreadScan(narrow, col("id"))
    assert(spread.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    assert(spread.collect().map(_.getLong(0)).sorted.toSeq === (1L to 100L))
  }

  test("spreadScan keyless round-robin keeps the row set") {
    val narrow = (1L to 50L).toDF("id").coalesce(1)
    val spread = Storage.spreadScan(narrow)
    assert(spread.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    assert(spread.collect().map(_.getLong(0)).sorted.toSeq === (1L to 50L))
  }

  test("spreadScan is the identity on an already-wide relation") {
    val target = spark.sparkContext.defaultParallelism
    val wide = (1L to 100L).toDF("id").repartition(target)
    // identity: the SAME plan comes back (no extra exchange appended)
    assert(Storage.spreadScan(wide, col("id")).queryExecution.logical eq
      wide.queryExecution.logical)
  }

  test("concurrently preserves input order and runs every item") {
    val out = Storage.concurrently(Seq(3, 1, 2))(i => i * 10)
    assert(out === Seq(30, 10, 20))
  }

  test("concurrently propagates the original exception, not ExecutionException") {
    val boom = intercept[IllegalArgumentException] {
      Storage.concurrently(Seq(1, 2)) { i =>
        if (i == 2) throw new IllegalArgumentException("boom") else i
      }
    }
    assert(boom.getMessage === "boom")
  }

  test("par2 returns both results; concurrent Spark actions agree with serial") {
    val df = (1L to 1000L).toDF("id")
    val (a, b) = Storage.par2(
      df.agg(sum("id")).head().getLong(0),
      df.agg(count(lit(1))).head().getLong(0))
    assert(a === 500500L && b === 1000L)
  }
}
