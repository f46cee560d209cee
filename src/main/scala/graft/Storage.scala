package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-layout helpers for the 100 TB posture.
  *
  * Bucketing pre-shuffles a fact table ONCE at write time: every later
  * equi-join or aggregation on the bucket key reads co-located buckets and
  * plans with zero exchanges (`PruneFileSourcePartitions` + bucket-aware
  * scan). For the flow tables the analog is `partitionBy(event_date)` (time
  * pruning) + bucketing by the frequent join/group key; for TPC-H-shaped
  * facts it is the join key, as BucketingSpec demonstrates with
  * lineitem ⋈ orders.
  */
object Storage {

  /** Write `df` as a bucketed, in-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Shuffle shape for a partitioned columnar append that needs BOTH a
    * bounded file count and full encode parallelism (r17 verdict #1).
    *
    * The two naive shapes each lose one property: writing the batch
    * as-is emits one file per (input split × partition value) — every
    * core encodes, but a batch spanning d dates amplifies to
    * `tasks × d` small files; `repartition(partCol)` collapses that to
    * one file per date, but then only d encode tasks are busy and the
    * write is CPU-ceilinged at d/`parallelism` of the machine. This
    * helper hash-partitions on (partCol, salt) with just enough salt
    * slots to fill `parallelism` tasks: files per batch stay ≈
    * `parallelism` (each task writes ~1 partition value), and every
    * core encodes. The partition-value count is measured from the batch
    * itself (one approx-distinct job — batches are persisted by the
    * callers on this path, so the extra pass re-reads executor-local
    * blocks, not the source). */
  def repartitionForWrite(df: DataFrame, partCol: String, parallelism: Int,
      saltOn: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val nVals = df.select(approx_count_distinct(col(partCol)).as("n"))
      .head().getLong(0).toInt.max(1)
    val slots = math.max(1, parallelism / nVals)
    // deterministic salt (a nondeterministic one would break shuffle-retry
    // consistency): caller-named cheap key column, else a hash of the row
    val salt = saltOn.getOrElse(xxhash64(df.columns.map(col): _*))
    df.repartition(parallelism, col(partCol), pmod(salt, lit(slots)))
  }

  /** Materialize a shared intermediate relation once (executor-local
    * blocks, lineage cut) so diamond-shaped plans — several consumers of
    * one expensive subtree — compute it exactly once.
    *
    * EAGER on purpose: a lazy `localCheckpoint(false)` drops the
    * pre-checkpoint plan (and its weakly-registered SQL-metric
    * accumulators) as soon as the caller's expression ends; when the RDD
    * materializes later, its task closures still report those accumulator
    * ids, the driver can no longer resolve them, and the DAGScheduler logs
    * an "attempted to access non-existent accumulator" ERROR stack per
    * task — the r2 bench-tail noise. Materializing while the plan is on
    * the call stack keeps every metric resolvable; the only cost is that
    * the cache-fill job runs now instead of at first use. */
  def materializeOnce(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Free the executor blocks behind a [[materializeOnce]] result once no
    * later consumer needs them — the iterative-loop hygiene ADVICE r16
    * asked for: each training round checkpoints a new token relation, and
    * without an explicit release the superseded rounds' blocks accumulate
    * until session end. `Dataset.unpersist` can't do it (localCheckpoint
    * persists the underlying RDD directly, bypassing the cache manager),
    * so this walks the plan to the `LogicalRDD` the checkpoint left and
    * unpersists that RDD. Blocking=false: eviction is hygiene, not a
    * correctness edge — the checkpointed consumer was materialized eagerly
    * before its input is released. No-op on non-checkpointed plans. */
  def unpersistMaterialized(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Reliable variant of [[materializeOnce]]: blocks go to `checkpointDir`
    * on the table filesystem instead of executor memory/disk.
    *
    * Contract difference that matters at cluster scale: localCheckpoint
    * blocks are executor-resident and NON-RECOMPUTABLE — lineage is
    * truncated, so losing one executor mid-computation fails every job
    * that still needs its blocks. For a short diamond-shaped reuse that
    * is a fine trade; for ITERATIVE algorithms (connected components)
    * whose rounds each stake the accumulated work on every executor
    * surviving, a 1000-executor / hours-long run wants the checkpoint on
    * durable storage — any executor can re-read it, none can lose it.
    * The cost is a filesystem round-trip per round instead of a memory
    * write, which is why it is opt-in rather than the default. */
  private val lastCheckpointDir = new java.util.concurrent.atomic.AtomicReference[String]()

  def materializeReliable(df: DataFrame, checkpointDir: String): DataFrame = {
    val sc = df.sparkSession.sparkContext
    // track the last dir WE set: SparkContext qualifies the path and
    // appends a random UUID subdirectory, so comparing against
    // getCheckpointDir never matches and the old guard re-set (and
    // re-mkdir'd a fresh UUID dir) on every call (r7 review)
    if (lastCheckpointDir.getAndSet(checkpointDir) != checkpointDir)
      sc.setCheckpointDir(checkpointDir)
    df.checkpoint(true)
  }

  /** Recursively delete a directory tree (children before parents).
    * Shared by staging/scratch cleanup in FlowStreams, ManifestTable and
    * BenchScale. */
  def deleteTree(root: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(root)) return
    val s = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toList.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    } finally s.close()
  }
}
