package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// dev scratch — not shipped; deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val a = Seq((1L,"x"),(2L,"y")).toDF("k","rg2")
    val b = Seq((1L,1.0),(2L,2.0)).toDF("k","v")
    def base = b.join(a, Seq("k")).select(col("rg2").as("_rg"), col("v"))
    // attempt 1: alias + qualified
    try {
      base.as("j").rollup(col("j._rg")).agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .toDF("r","n","gid").show()
      println("[scratch] qualified-alias works")
    } catch { case e: Exception => println("[scratch] qualified-alias FAILS: " + e.getMessage.take(80)) }
    // attempt 2: localCheckpoint-free logical barrier via rdd round-trip? try spark.createDataFrame
    // attempt 3: SQL path
    base.createOrReplaceTempView("jv")
    spark.sql("SELECT _rg, count(*) AS n, grouping_id() AS gid FROM jv GROUP BY ROLLUP(_rg)").show()
    println("[scratch] sql path works")
    spark.stop()
  }
}
