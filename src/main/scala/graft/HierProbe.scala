package graft

import org.apache.spark.sql.functions._
import graft.ext.{Sampling, Similarity}
import graft.ext.Similarity._

// dev scratch — sampled recall + wall time of the hierarchical IVF vs the
// flat k-means IVF at each SF (round-7 item 1 design check).
object HierProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.build("local[32]", "32", "graft-hier-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = sys.env.getOrElse("SPARK_GRAFT_SF_DIRS",
      "/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/target/sf1").split(",").toSeq
    val sampleQ = 500
    for (dir <- dirs) {
      val vecs = withNorm(graft.engine.Sources.embeddings(spark, dir)).persist()
      val n = vecs.count()
      val qids = vecs.select(col("vec_id"))
        .orderBy(Sampling.mixHash(col("vec_id")), col("vec_id")).limit(sampleQ)
        .select(col("vec_id").as("query_id")).persist()
      val q = vecs.join(qids, vecs("vec_id") === qids("query_id"))
        .select(col("query_id"), col("v").as("va"), col("norm").as("na"))
      val nn = vecs.select(col("vec_id").as("neighbor_id"), col("v").as("vb"), col("norm").as("nb"))
      val exact = q.join(nn, col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", graft.engine.Num.r(
          dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
        .groupBy("query_id")
        .agg(graft.functions.TopKByScore.topK(col("cosine"), col("neighbor_id"), TopK).as("top"))
        .select(col("query_id"), explode(col("top")).as("e"))
        .select(col("query_id"), col("e.id").as("neighbor_id"))
        .persist()
      exact.count()
      for ((name, fn) <- Seq(
          "hier" -> ((d: String) => annIvfHier(spark, d)),
          "kmeans" -> ((d: String) => annIvfKmeans(spark, d)))) {
        val t0 = System.nanoTime()
        val approx = fn(dir).select(col("query_id"), col("neighbor_id"))
          .join(qids, Seq("query_id"))
        val recall = exact.join(approx.withColumn("_hit", lit(1)),
            Seq("query_id", "neighbor_id"), "left")
          .agg((count(col("_hit")).cast("double") / count(lit(1))).as("r"))
          .collect()(0).getDouble(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[hier] dir=$dir n=$n method=$name%-7s recall=$recall%.3f ${dt}%6.2f s")
        spark.catalog.clearCache()
        vecs.persist(); qids.persist(); exact.persist(); exact.count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
