package graft
import org.apache.spark.sql.SparkSession
// dev scratch — not shipped; deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    def audit(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      val bcasts = "BroadcastExchange".r.findAllIn(plan).length
      val wscg = "WholeStageCodegen".r.findAllIn(plan).length
      println(s"== $name: shuffles=$exchanges broadcasts=$bcasts wscg_spans=$wscg")
      plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("ReadSchema")).take(8)
        .foreach(l => println("   " + l.trim.take(150)))
    }
    audit("silver_order_details")(engine.Silver.orderDetails(spark, d))
    audit("silver_supplier_parts")(engine.Silver.supplierParts(spark, d))
    audit("gold_monthly")(engine.Gold.monthlySalesTrends(engine.Silver.orderDetails(spark, d)))
    audit("text_stats")(ext.Text.stats(spark, d))
    audit("events_sessions")(ext.Events.sessions(spark, d))
    audit("dedup_minhash")(ext.Dedup.minhashLshPairs(spark, d))
    audit("sim_ann_lsh")(ext.Similarity.annLsh(spark, d))
    audit("sim_ann_ivf")(ext.Similarity.annIvf(spark, d))
    audit("quality_referential")(engine.Quality.referentialIntegrity(spark, d))
    spark.stop()
  }
}
