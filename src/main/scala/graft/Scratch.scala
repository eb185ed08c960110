package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// dev scratch — intentionally minimal; used for ad-hoc plan/timing probes
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-30s n=$n%-8d ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    t("minhash_alone")(ext.Dedup.minhashLshPairs(spark, d).count())
    t("stats_alone")(ext.Text.stats(spark, d).count())
    t("split_alone")(ext.Sampling.trainValTestSplit(spark, d).count())
    t("preprocess_full")(ext.Corpus.preprocess(spark, d).count())
    t("preprocess_again")(ext.Corpus.preprocess(spark, d).count())
    spark.stop()
  }
}
