package graft
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries (or the whole registry)
  * to one file per query — the plan-shape evidence the optimization rounds
  * commit under plans/rNN/. Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> [suffix] [name ...]
  * writes <outDir>/<name><suffix>.txt (suffix e.g. "_before"/"_after").
  * Planning only — no query is executed, so this is cheap at any SF. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args: @unchecked
    val (suffix, only) = rest.toList match {
      case s :: names if s.startsWith("_") => (s, names)
      case names => ("", names)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    Session.silenceAllLogs()
    val spark = Session.build(s"local[$cpus]", cpus, "graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only.toSet).toMap
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), plan)
        println(s"[plandump] $name -> $outDir/$name$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
