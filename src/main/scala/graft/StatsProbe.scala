package graft

/** Interleaved control-anchored probe for the `stats_profile_incremental`
  * round-over-round swing (VERDICT r14 watch item: 5.38 → 7.67 s min
  * between self-bench windows with ZERO diff touching `ext/Sketch` — the
  * only ≥5 s mover whose code did not change). Cross-process bench pairs
  * cannot adjudicate this on the throttling build VM, so the probe runs
  * the suspect and two UNTOUCHED controls alternating in ONE JVM:
  *
  *  - `suspect`  — `stats_profile_incremental` (the swung query);
  *  - `control`  — `stats_table_profile` (same family, same sources,
  *    same sketch kernels; also untouched in r14);
  *  - `far`      — `text_langid_confusion` (different subsystem entirely,
  *    no session stores, ~same cost class) — separates "the stats path
  *    regressed" from "this VM window is slow".
  *
  * Read: suspect_min ≈ its r13 level → r14's swing was VM phase (the r14
  * window's throttle 1.202 vs 1.131 supports this). suspect_min elevated
  * while both controls hold their r14-window levels → a real regression
  * on a shared path (SessionOnce? store geometry?) worth bisecting.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_PROBE_PASSES (default 3 per query).
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt
    Session.silenceAllLogs()
    val spark = Session.build(s"local[$cpus]", cpus, "graft-stats-probe")
    val queries = Seq(
      "suspect" -> "stats_profile_incremental",
      "control" -> "stats_table_profile",
      "far" -> "text_langid_confusion")
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // Bench.runPass isolation, outside the window
      dt
    }
    // one untimed warm-up (scans + codegen), then alternate within passes
    queries.foreach { case (_, q) => time(q) }
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to passes).foreach { _ =>
      queries.foreach { case (label, q) => samples(label) :+= time(q) }
    }
    def r3(x: Double) = math.floor(x * 1000 + 0.5) / 1000
    val fields = queries.map { case (label, q) =>
      s""""${label}_min":${r3(samples(label).min)},"$label":[${
        samples(label).map(r3).mkString(",")}],"${label}_query":"$q"""" }
      .mkString(",")
    println(s"""{"metric":"stats_profile_control_probe","unit":"sec",$fields,""" +
      s""""passes":$passes,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
