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
    // optional subset (comma-separated names) — used by the sf0.1-vs-sf1
    // scaling run, which times only the expensive queries at both SFs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
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
    val results = names.map(n => n -> median(samples(n)))
    // The driver tail-captures a fixed number of trailing stdout chars; the
    // JSON must fit whole or the parse fails. The suite has grown past the
    // point where a full 3-decimal per-query map always fits, so the map
    // keeps the most expensive queries (the ones a reader scans for
    // outliers) at full precision and collapses the cheap tail into
    // `_rest` (count `_rest_n`); `value` is always the full-suite total.
    def fmt(v: Double): String = {
      val s = "%.3f".format(v)
      s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
    }
    val total = fmt(results.map(_._2).sum)
    val byCost = results.sortBy { case (k, v) => (-v, k) }
    def encode(keep: Int): String = {
      val (kept, rest) = byCost.splitAt(keep)
      val entries = kept.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + fmt(v) } ++
        (if (rest.isEmpty) Nil
         else Seq("\"_rest\":" + fmt(rest.map(_._2).sum), "\"_rest_n\":" + rest.size))
      val qs = entries.mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    val line = (results.size to 0 by -1).map(encode).find(_.length <= 1900).getOrElse(encode(0))
    spark.stop() // stop first: the JSON must be the last line of stdout
    println(line)
    System.out.flush()
  }
}
