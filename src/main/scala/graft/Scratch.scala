package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.AtomicLong
// dev scratch — intentionally minimal; used for ad-hoc plan/timing probes
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.build("local[32]", "32", "graft-scratch")
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    val probes = sys.env.get("SPARK_GRAFT_PROBES").map(_.split(",").toSeq).getOrElse(Seq(
      "silver_customer_orders", "gold_customer_lifetime_value",
      "consumer_top_clv", "consumer_strategic_suppliers",
      "gold_supplier_performance", "dedup_clusters"))
    SparkEntry.queries("bronze_orders")(spark, d).count() // warmup
    for (rep <- 1 to 2; name <- probes) {
      Thread.sleep(300) // let listener drain
      val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
      val w0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      spark.catalog.clearCache()
      Thread.sleep(300)
      println(f"[scratch] rep$rep $name%-32s ${(System.nanoTime() - w0) / 1e9}%7.2f s  " +
        f"jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d tasks=${tasks.get - t0}%5d")
    }
    spark.stop()
  }
}
