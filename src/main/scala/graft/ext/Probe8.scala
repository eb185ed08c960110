package graft.ext

// dev scratch (round 8): phase timing of the refactored recallAudit
object Probe8 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Session.build("local[32]", "32", "graft-probe8")
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.engine.Sources
    def t[A](name: String)(f: => A): A = {
      val w0 = System.nanoTime()
      val r = f
      println(f"[probe8] $name%-28s ${(System.nanoTime() - w0) / 1e9}%7.2f s")
      r
    }
    // warmup
    graft.SparkEntry.queries("bronze_orders")(spark, dir).count()
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val pins = new Similarity.Pins
      val vecs = pins.pin(Similarity.withNorm(Sources.embeddings(spark, dir)))
      t("vecs materialize")(vecs.count())
      val exact = pins.pin(Similarity.knnBruteForceFrom(vecs)
        .select(col("query_id"), col("neighbor_id")))
      t("exact materialize")(exact.count())
      val m = t("hierModel")(Similarity.hierModel(vecs))
      pins.track(m.subs)
      val scored = pins.pin(Similarity.hierScored(vecs, m.l1, m.subs, m.nProbe))
      t("scored materialize")(scored.count())
      t("arm ivf")(Similarity.annIvfPinned(spark, dir, pins).count())
      t("arm hier")(Similarity.hierArm(scored).count())
      t("arm kmeans")(Similarity.annIvfKmeansFrom(vecs, pins).count())
      val books = t("pq codebooks")(Pq.pqCodebooksLocal(vecs))
      t("arm pq")(Pq.annIvfPqFrom(vecs, scored, books).count())
      t("arm lsh")(Similarity.annLsh(spark, dir).count())
      t("arm qknn")(Similarity.quantizedKnn(spark, dir).count())
      t("full audit")(graft.SparkEntry.queries("sim_recall_audit")(spark, dir).count())
      pins.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
