package graft
import org.apache.spark.sql.SparkSession
// dev scratch — not shipped; deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"[scratch] $name%-28s rows=$n%-8d ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    t("sim_knn")(ext.Similarity.knnBruteForce(spark, d))
    t("sim_ann")(ext.Similarity.annLsh(spark, d))
    t("dedup_embedding")(ext.Dedup.embeddingCosinePairs(spark, d))
    t("dedup_simhash")(ext.Dedup.simhashPairs(spark, d))
    t("text_fingerprint")(ext.Text.fingerprint(spark, d))
    spark.stop()
  }
}
