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
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-30s n=$n%-8d ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    t("sim_knn")(ext.Similarity.knnBruteForce(spark, d).count())
    t("sim_ann_lsh")(ext.Similarity.annLsh(spark, d).count())
    t("sim_ann_ivf")(ext.Similarity.annIvf(spark, d).count())
    spark.stop()
  }
}
