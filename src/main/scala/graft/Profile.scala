package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev profiling main (optimization guide §1: measure first): runs the
  * queries named in `SPARK_GRAFT_ONLY` (comma-separated; required) for
  * `SPARK_GRAFT_REPS` passes under a SparkListener and prints, per query
  * pass, the wall time plus a per-JOB breakdown (job wall, stage count,
  * task count, description) so "where does a 6-second query spend its
  * time" is readable without the UI (disabled in this sandbox).
  *
  * Same session shape as [[Bench]] — local[$SPARK_GRAFT_CPUS], AQE on,
  * 32 shuffle partitions — so findings transfer to bench numbers.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "5000"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class JobRec(id: Int, t0: Long, var t1: Long = 0L,
        var desc: String = "", var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val r = JobRec(e.jobId, e.time)
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        r.stages = e.stageInfos.size
        r.tasks = e.stageInfos.map(_.numTasks).sum
        jobs(e.jobId) = r
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY",
      sys.error("set SPARK_GRAFT_ONLY=q1,q2")).split(",").toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // JVM/parquet warm-up, same as Bench
    try SparkEntry.entry(spark).foreachPartition { (_: Iterator[org.apache.spark.sql.Row]) => () }
    catch { case _: Throwable => () }
    only.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        fn(spark, sfDir).foreachPartition { (_: Iterator[org.apache.spark.sql.Row]) => () }
        val wall = (System.nanoTime() - t0) / 1e9
        val snap = jobs.synchronized(jobs.values.toSeq)
        println(f"\n=== $name rep $rep: wall $wall%.3f s, ${snap.size} jobs, " +
          f"${snap.map(_.stages).sum} stages, ${snap.map(_.tasks).sum} tasks ===")
        snap.foreach { j =>
          val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1e3 else -1.0
          println(f"  job ${j.id}%4d ${dur}%8.3f s  stages=${j.stages}%3d " +
            f"tasks=${j.tasks}%4d  ${j.desc.take(90)}")
        }
        val gaps = snap.sliding(2).collect {
          case Seq(a, b) if b.t0 - a.t1 > 50 => (a.id, b.id, (b.t0 - a.t1) / 1e3)
        }.toSeq
        if (gaps.nonEmpty) {
          println("  driver gaps > 50ms between jobs:")
          gaps.foreach { case (a, b, g) => println(f"    after job $a -> $b: $g%.3f s") }
        }
      }
    }
    spark.stop()
  }
}
