package graft
import org.apache.spark.sql.SparkSession
// dev scratch — intentionally minimal; used for ad-hoc plan/timing probes
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val entry = SparkEntry.entry(spark)
    println(s"[scratch] entry rows = ${entry.count()}")
    entry.show(5)
    spark.stop()
  }
}
