package graft

import org.apache.spark.sql.functions._
import graft.ext.{Sampling, Similarity}
import graft.ext.Similarity._

// dev scratch — recall-vs-nProbe sweep for the k-means IVF quantizer, the
// empirical basis for the nProbe scaling policy (round-7 item 2). Queries are
// sampled (lowest mixHash) at larger SFs so the exact arm stays tractable.
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.build("local[32]", "32", "graft-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = sys.env.getOrElse("SPARK_GRAFT_SF_DIRS",
      "/root/testdata/sf0.01,/root/testdata/sf0.1,/root/repo/target/sf1").split(",").toSeq
    val sampleQ = 500
    for (dir <- dirs) {
      val vecs = withNorm(graft.engine.Sources.embeddings(spark, dir)).persist()
      val n = vecs.count()
      val k = math.ceil(math.sqrt(n.toDouble)).toInt
      val cents = kmeansCentroidsLocal(vecs)
      val qids = vecs.select(col("vec_id"))
        .orderBy(Sampling.mixHash(col("vec_id")), col("vec_id")).limit(sampleQ)
        .select(col("vec_id").as("query_id")).persist()
      // exact ground truth on the sampled queries
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
      val maxP = math.min(k, 64)
      val scored = vecs
        .select(col("vec_id"), col("v"), col("norm"),
          posexplode(nearestCells(cents, maxP)).as(Seq("_pos", "_cell")))
        .select(col("vec_id"), col("v"), col("norm"),
          (col("_pos") + 1).as("_crank"), col("_cell").getField("cl").as("cl"))
        .persist()
      scored.count()
      for (p <- Seq(4, 6, 8, 12, 16, 24, 32, 48).filter(_ <= maxP)) {
        val t0 = System.nanoTime()
        val inverted = scored.where(col("_crank") === 1)
          .select(col("cl"), col("vec_id").as("neighbor_id"),
            col("v").as("vb"), col("norm").as("nb"))
        val probes = scored.where(col("_crank") <= p)
          .join(qids, scored("vec_id") === qids("query_id"))
          .select(col("cl"), col("query_id"), col("v").as("va"), col("norm").as("na"))
        val pairs = probes.join(inverted, "cl")
          .where(col("query_id") =!= col("neighbor_id"))
          .withColumn("cosine", graft.engine.Num.r(
            dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
        val approx = pairs
          .groupBy("query_id")
          .agg(graft.functions.TopKByScore.topK(col("cosine"), col("neighbor_id"), TopK).as("top"))
          .select(col("query_id"), explode(col("top")).as("e"))
          .select(col("query_id"), col("e.id").as("neighbor_id"))
        val recall = exact.join(approx.withColumn("_hit", lit(1)),
            Seq("query_id", "neighbor_id"), "left")
          .agg((count(col("_hit")).cast("double") / count(lit(1))).as("r"))
          .collect()(0).getDouble(0)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[recall] dir=$dir n=$n K=$k nProbe=$p scan=${p.toDouble / k}%.3f " +
          f"recall=$recall%.3f  ${dt}%6.2f s")
      }
      scored.unpersist(); exact.unpersist(); qids.unpersist(); vecs.unpersist()
      // the deployment arms as registered (calibrated nProbe chosen
      // internally by nProbeFromThresh): what a user actually gets per SF
      for (row <- Similarity.recallAuditSampled(spark, dir).collect())
        println(s"[audit] dir=$dir ${row.mkString(" ")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
