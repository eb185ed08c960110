package graft

/** Interleaved A/B wall-clock ablation of the recall audit's `ann_ivf_rp`
  * arm (round-13 follow-up to VERDICT r12 #1/#2, which pull in opposite
  * directions: #1 asks the audit back to its r11 cost, #2 adds a fourth
  * in-audit quantizer build). Cross-process bench pairs are useless for
  * this on the build VM (throttle ratios over 1.3 between adjacent runs),
  * so this probe times `recallAuditAt(withRp = true/false)` ALTERNATING in
  * one session, reports per-setting mins, and prints ONE JSON line for the
  * round's scaling artifact.
  *
  * What it isolates: the rp arm's in-audit cost is a MODEL BUILD (Lloyd
  * collects + per-round codegen compiles — driver-latency-bound at fixture
  * sizes), not the shared n² pass (that one now scores both spaces in a
  * single join, see Similarity.knnWithRpFrom).
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
    def time(withRp: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.ext.Similarity.recallAuditAt(spark, sfDir, withRp).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // one untimed warm-up per setting (source scans + codegen caches), then
    // alternate so slow VM phases hit both settings equally
    time(withRp = true); time(withRp = false)
    val (withA, without) = (Vector.newBuilder[Double], Vector.newBuilder[Double])
    (1 to passes).foreach { _ =>
      withA += time(withRp = true)
      without += time(withRp = false)
    }
    def r3(x: Double) = math.floor(x * 1000 + 0.5) / 1000
    val a = withA.result(); val b = without.result()
    println(s"""{"metric":"recall_audit_rp_ablation","unit":"sec",""" +
      s""""with_rp_min":${r3(a.min)},"without_rp_min":${r3(b.min)},""" +
      s""""rp_arm_cost_sec":${r3(a.min - b.min)},""" +
      s""""with_rp":[${a.map(r3).mkString(",")}],""" +
      s""""without_rp":[${b.map(r3).mkString(",")}],""" +
      s""""passes":$passes,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
