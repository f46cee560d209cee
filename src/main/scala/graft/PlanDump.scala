package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

/** Dev artifact generator for the optimization rounds: dumps
  * `explain(formatted)` for the named queries into
  * `plans/<tag>/<query>_<suffix>.txt` (one file per query) so before/after
  * plan evidence is committable. Run:
  * `sbt "runMain graft.PlanDump <tag> <suffix> q1,q2,..."`
  * e.g. `sbt "runMain graft.PlanDump r18 before sim_knn_ivfpq,multimodal_knn"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <q1,q2,...> [sfDir]")
    val (tag, suffix, names) = (args(0), args(1), args(2).split(",").toSeq)
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans", tag)
    Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
