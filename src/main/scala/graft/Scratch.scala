package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// dev scratch — not shipped; deleted before commit
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq("a bb  c", "hello, world42 x", "abc", "the a fox the").toDF("text")
    df.select(
      size(split(col("text"), " ")).as("ws_n"),
      split(col("text"), "").as("chars"),
      size(expr("filter(split(text,' '), w -> w IN ('the','a'))")).as("marker_n"),
      expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)").as("bpe"),
      expr("aggregate(split(text,''), 0L, (a,c) -> (a*131 + ascii(c)) % 2147483647)").as("rollhash")
    ).show(false)
    spark.stop()
  }
}
