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
      println(f"[scratch] $name%-34s n=$n%-9d ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    t("gold_monthly_sales_trends")(SparkEntry.queries("gold_monthly_sales_trends")(spark, d).count())
    t("events_user_rolling_daily")(SparkEntry.queries("events_user_rolling_daily")(spark, d).count())
    t("events_sessions")(SparkEntry.queries("events_sessions")(spark, d).count())
    t("gold_monthly_again")(SparkEntry.queries("gold_monthly_sales_trends")(spark, d).count())
    t("sim_ann_lsh")(SparkEntry.queries("sim_ann_lsh")(spark, d).count())
    spark.stop()
  }
}
