package graft

import org.apache.spark.sql.functions._

/** Interleaved phase probe for the MinHash-LSH kernel (OPTIMIZATION r15):
  * times (a) the fused signature pass, (b) band-bucket candidate
  * generation, (c) the Jaccard verify tail, (d) the full pair query, and
  * (e) the CC rounds of `dedup_clusters` — 3 passes each, same-JVM, so the
  * phase split is honest under this VM's throttle noise. Emits one JSON
  * line; measurement evidence for OPTIMIZATION_r15.md. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Session.silenceAllLogs()
    val spark = Session.build(s"local[$cpus]", cpus, "graft-dedupprobe")
    import graft.ext.Dedup
    import graft.engine.Sources
    def docs = Sources.documents(spark, sfDir)
    def time(label: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime(); body
      label -> (System.nanoTime() - t0) / 1e9
    }
    val phases = Seq[(String, () => Unit)](
      "sigs" -> (() =>
        Dedup.minhashSignatureArray(docs).write.format("noop")
          .mode("overwrite").save()),
      "bands" -> (() =>
        Dedup.bandBuckets(docs).write.format("noop").mode("overwrite").save()),
      "pairs_full" -> (() =>
        Dedup.minhashLshPairsOf(docs).write.format("noop")
          .mode("overwrite").save()),
      "clusters_full" -> (() =>
        Dedup.clusters(spark, sfDir).write.format("noop")
          .mode("overwrite").save()))
    // pass-major interleave, 3 passes; per-phase min reported
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to 3; (label, body) <- phases) {
      spark.sparkContext.setJobDescription(s"dedup-probe: $label")
      val (_, dt) = time(label)(body())
      samples(label) = dt :: samples(label)
      spark.catalog.clearCache()
    }
    spark.stop()
    val parts = phases.map { case (l, _) =>
      s""""$l":${"%.3f".format(samples(l).min)}""" }
    println(s"""{"probe":"dedup_phases","mins":{${parts.mkString(",")}},"sf":"$sfDir"}""")
  }
}
