package graft
import org.apache.spark.sql.SparkSession
// dev scratch — not shipped; deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val t0 = System.nanoTime()
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val n = df.count()
      println(f"[scratch] $name%-28s rows=$n%-8d ${(System.nanoTime()-t0)/1e9}%.1fs")
      df.show(5, false)
    }
    t("dedup_exact")(ext.Dedup.exact(spark, d))
    t("dedup_ngram")(ext.Dedup.ngramJaccardPairs(spark, d))
    t("dedup_minhash_lsh")(ext.Dedup.minhashLshPairs(spark, d))
    t("dedup_simhash")(ext.Dedup.simhashPairs(spark, d))
    t("dedup_embedding")(ext.Dedup.embeddingCosinePairs(spark, d))
    t("sim_knn")(ext.Similarity.knnBruteForce(spark, d))
    t("sim_ann")(ext.Similarity.annLsh(spark, d))
    spark.stop()
  }
}
