package graft
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries (or the whole registry)
  * to one file per query — the plan-shape evidence the optimization rounds
  * commit under plans/rNN/. Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> [suffix] [name ...]
  * writes <outDir>/<name><suffix>.txt (suffix e.g. "_before"/"_after").
  *
  * MOSTLY planning-only — but NOT for every query (ADVICE r15): a few
  * entry points are EAGER AT CONSTRUCTION, so dumping them runs real jobs
  * and their dumped "plan" is the reassembled LocalRelation shell, not the
  * serving plan: `text_retrieval_quality` executes all three arms
  * ([[graft.ext.Hybrid.retrievalQuality]]), the RM3 arms materialize the
  * expanded term set ([[graft.ext.TextIndex.searchRm3]]), and any first
  * use of a session-shared model artifact ([[graft.ext.SessionVal]] /
  * session stores) pays that build. For those queries the committed plan
  * evidence is their ARM plans (`text_bm25_index_search`,
  * `text_bm25_rm3_indexed`, `text_hybrid_rrf_indexed`), which this tool
  * dumps lazily. Everything else is planning-only and cheap at any SF. */
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
