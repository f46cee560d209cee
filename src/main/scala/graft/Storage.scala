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

  /** Input-layout adaptation for kernel-heavy scans (opt guide §2.5,
    * "input skew: one huge unsplittable file … repartition immediately
    * after the read"): a single-row-group parquet file scans as ONE
    * partition no matter how many cores the session has, so every
    * downstream per-row kernel (window md5s, shingle hashing, feature
    * decode, pair generation) runs on one core while the rest idle —
    * the r18 profile showed 0.8–2.3 s single-task map jobs dominating
    * the hottest queries at sf0.1. Round-robin repartition to the
    * session default parallelism in EXACTLY that case; when the scan is
    * already at least `minFraction` of default parallelism wide (any
    * production-scale table), this is the identity — no exchange is
    * added, so it is layout adaptation, not a constant tuned for a box.
    * Row-set semantics are unchanged (round-robin repartition reorders
    * rows only; the sort-before-repartition default keeps the
    * assignment deterministic under task retry). Inspecting the scan
    * width plans the input subtree once without running a job — apply
    * this to (near-)bare table scans, not deep subtrees. */
  def spreadScan(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    // guard (ADVICE r18): with AQE on, probing width via .rdd on a subtree
    // that CONTAINS an exchange materializes its shuffle query stages at
    // DataFrame-construction time — real jobs run during plan building.
    // The "(near-)bare scan" restriction was doc-comment-only; now an
    // exchange-bearing subtree short-circuits to the identity — its
    // partitioning is already managed by that exchange, and the width
    // probe below never runs on it. sparkPlan inspection is
    // planning-only (no jobs).
    if (df.queryExecution.sparkPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.rdd.getNumPartitions
    if (parts >= math.max(1, target / 2)) df
    // hash repartition on the caller's (unique, deterministic) key: unlike
    // keyless round-robin it skips the sort-before-repartition pass and
    // stays retry-deterministic (guide §2.5)
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }

  /** Run independent driver actions concurrently (opt guide §2.6,
    * "overlap independent jobs"): Spark's scheduler happily runs several
    * jobs at once inside one application — actions are only sequential
    * because driver code calls them sequentially. Multi-model queries
    * (per-modality index serves, per-m codebook trainings) are chains of
    * small jobs whose tails leave the cluster idle; submitting the
    * independent chains from a bounded pool lets the next chain's tasks
    * back-fill. FIFO scheduling (the default) gives exactly the
    * back-fill behaviour. Results are returned in input order, so a
    * deterministic caller stays deterministic. */
  def concurrently[A, B](items: Seq[A], maxThreads: Int = 4)(f: A => B): Seq[B] =
    if (items.sizeIs <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(items.size, maxThreads))
      // ADVICE r18: on first failure, stop paying for the sibling chains —
      // cancel(true) the remaining futures, shutdownNow() the pool, and
      // cancel each chain's Spark job group (interruptOnCancel) so
      // in-flight cluster work stops instead of running to completion on
      // non-daemon threads and delaying error propagation
      val gid = "graft-conc-" + java.util.UUID.randomUUID()
      val sc = org.apache.spark.sql.SparkSession.getDefaultSession.map(_.sparkContext)
      try {
        val futs = items.zipWithIndex.map { case (a, i) =>
          pool.submit(new java.util.concurrent.Callable[B] { def call(): B = {
            // keep the inherited job description (thread-locals copy from
            // the submitting thread); only the group id + interrupt change
            sc.foreach(s => s.setJobGroup(s"$gid-$i",
              s.getLocalProperty("spark.job.description"),
              interruptOnCancel = true))
            f(a)
          } })
        }
        try futs.map { fu =>
          try fu.get()
          catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
        } catch { case t: Throwable =>
          futs.foreach(_.cancel(true))
          pool.shutdownNow()
          sc.foreach(s => items.indices.foreach(i => s.cancelJobGroup(s"$gid-$i")))
          throw t
        }
      } finally pool.shutdown()
    }

  /** Two-sided [[concurrently]]: run two independent driver action chains
    * at once and return both results (typed; avoids Either juggling). */
  def par2[A, B](fa: => A, fb: => B): (A, B) = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    val gid = "graft-par2-" + java.util.UUID.randomUUID()
    val sc = org.apache.spark.sql.SparkSession.getDefaultSession.map(_.sparkContext)
    try {
      val fut = pool.submit(new java.util.concurrent.Callable[B] { def call(): B = {
        sc.foreach(s => s.setJobGroup(gid,
          s.getLocalProperty("spark.job.description"),
          interruptOnCancel = true))
        fb
      } })
      // ADVICE r18: if the foreground chain fails, cancel the background
      // one (future + its Spark job group) instead of letting it run to
      // completion before the error propagates
      val a = try fa catch { case t: Throwable =>
        fut.cancel(true)
        pool.shutdownNow()
        sc.foreach(_.cancelJobGroup(gid))
        throw t
      }
      val b = try fut.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      (a, b)
    } finally pool.shutdown()
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

  /** True when `df` is (a cheap projection/filter over) an
    * already-materialized relation — a [[materializeOnce]] result or a
    * driver-collected LocalRelation — so pin-for-the-loop helpers
    * ([[graft.operators.Pq.trainOnQ]], kmeans training) don't stack a
    * second copy of blocks that already sit in executor storage. */
  def isMaterialized(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project, SubqueryAlias}
    @annotation.tailrec
    def strip(p: LogicalPlan): Boolean = p match {
      case p: Project       => strip(p.child)
      case f: Filter        => strip(f.child)
      case s: SubqueryAlias => strip(s.child)
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: LocalRelation => true
      case _                => false
    }
    strip(df.queryExecution.analyzed)
  }

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
