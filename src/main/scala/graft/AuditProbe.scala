package graft

/** Interleaved wall-clock ablations of the recall audit's build phase
  * (VERDICT r13 #2 + #7). Cross-process bench pairs are useless for this
  * on the build VM (throttle ratios over 1.3 between adjacent runs), so
  * this probe times three settings of `recallAuditAt` ALTERNATING in one
  * session and prints ONE JSON line for the round's scaling artifact:
  *
  *  - `shared`   — the deployment shape: ONE hierStructure feeds the
  *    hier, PQ and flat arms; builds on parallel threads; the n² exact
  *    pass overlaps the structure builds (r14).
  *  - `unshared` — the flat arm rebuilds its own structure (the r13
  *    independent-builds shape). shared vs unshared = the wall cost of
  *    the duplicated quantizer build (VERDICT r13 #2's ablation).
  *  - `serial`   — every build on ONE thread after the exact pass.
  *    serial vs shared = the measured overlap factor of the threaded
  *    build phase (VERDICT r13 #7's concurrency-honesty probe: the
  *    Lloyd collects serialize on the driver, so threading may buy less
  *    than the fork count suggests).
  *
  * All three settings produce IDENTICAL output rows (ExtSpec pins the
  * seeded-identity; serial is a pure scheduling change), so the oracle
  * surface is untouched.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_PROBE_PASSES (default 3 per setting).
  */
object AuditProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt
    Session.silenceAllLogs()
    val spark = Session.build(s"local[$cpus]", cpus, "graft-audit-probe")
    val withRp = graft.ext.Similarity.AuditRpArm
    def time(share: Boolean, serial: Boolean): Double = {
      val t0 = System.nanoTime()
      // useCache=false: the probe measures BUILD shapes — the session
      // cache would serve every arm a prebuilt structure after the first
      // call and erase the very difference the ablation times
      graft.ext.Similarity.recallAuditAt(spark, sfDir, withRp,
        shareStruct = share, serial = serial, useCache = false).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      // per-run isolation exactly as Bench.runPass does it: teardown
      // OUTSIDE the timed window (inside, it biases the overlap ratio)
      spark.catalog.clearCache()
      dt
    }
    val settings = Seq(
      "shared" -> (() => time(share = true, serial = false)),
      "unshared" -> (() => time(share = false, serial = false)),
      "serial" -> (() => time(share = true, serial = true)))
    // one untimed warm-up (source scans + codegen caches), then alternate
    // settings within each pass so slow VM phases hit all three equally
    settings.foreach { case (_, f) => f() }
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to passes).foreach { _ =>
      settings.foreach { case (name, f) => samples(name) :+= f() }
    }
    def r3(x: Double) = math.floor(x * 1000 + 0.5) / 1000
    val mins = settings.map { case (name, _) => name -> samples(name).min }.toMap
    val fields = settings.map { case (name, _) =>
      s""""${name}_min":${r3(mins(name))},"$name":[${
        samples(name).map(r3).mkString(",")}]""" }.mkString(",")
    println(s"""{"metric":"recall_audit_build_ablation","unit":"sec",$fields,""" +
      s""""saved_build_sec":${r3(mins("unshared") - mins("shared"))},""" +
      s""""overlap_factor":${r3(mins("serial") / mins("shared"))},""" +
      s""""with_rp":$withRp,"passes":$passes,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
