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
  * throttle episode from any single query's three samples.
  *
  * Self-auditing (r5 shipped a 3x throttle-inflated snapshot with no
  * cross-check): the JSON also carries per-query `mins`, the suite
  * `throttle_ratio` = Σmedian / Σmin, and the pass count — and when the
  * ratio exceeds [[ThrottleLimit]] the bench runs EXTRA interleaved passes
  * (up to SPARK_GRAFT_BENCH_MAX_PASSES) until the medians settle, so a
  * throttle episode widens the sample instead of poisoning the artifact.
  *
  * Modes:
  *  - SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the timed set; the output then
  *    carries `"partial":true` so a subset total is never compared against
  *    full-run baselines.
  *  - SPARK_GRAFT_SF_DIRS=dirA,dirB times every query at SEVERAL scale
  *    factors in one process, interleaved at the query grain (each query
  *    runs at both SFs back-to-back), so throttle episodes hit the SFs
  *    alike and sf-vs-sf ratios are honest — the scaling-table mode. One
  *    JSON line per SF is printed.
  *
  * The JSON line(s) are printed after `spark.stop()` so they are the final
  * stdout lines, and values are rounded to 3 decimals to keep each line well
  * under tail-capture limits.
  */
object Bench {

  val ThrottleLimit = 1.5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sfDirs = sys.env.get("SPARK_GRAFT_SF_DIRS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq(sfDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val maxPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_PASSES", "7").toInt
    // The driver's tail capture must contain ONLY the JSON line(s), and it
    // reads a merged stream — per-package level whack-a-mole (r6 #6, r8 #3,
    // r9 #4: WindowExec, SparkStringUtils, BlockManager-init INFO, …) kept
    // losing to startup lines emitted BEFORE setLogLevel could run. Silence
    // log4j entirely before any Spark class initializes it; query failures
    // still surface — Bench prints them itself on stderr and counts them in
    // the JSON `errors` map.
    Session.silenceAllLogs()
    val spark = Session.build(s"local[$cpus]", cpus, "graft-bench")
    // warmup: exercise scans/joins/windows/aggs once at tiny SF so the first
    // timed query doesn't absorb JVM + whole-stage-codegen compilation
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // optional subset (comma-separated names) — used by the sf0.1-vs-sf1
    // scaling run, which times only the expensive queries at both SFs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // multi-SF scaling mode: beyond the smallest SF (dirs are ordered
    // smallest-first), the declared small-n baselines are excluded — they
    // are quadratic by construction (SparkEntry.smallNOnly; measured r6:
    // sim_ann_ivf 242.8 s at sf1) and a deployment runs their scale twins.
    // Each line carries the exclusion count so a subset total is never
    // read as a full-suite total.
    def namesFor(dir: String): Seq[String] =
      if (sfDirs.size > 1 && dir != sfDirs.head)
        names.filterNot(SparkEntry.smallNOnly) else names
    val samples = scala.collection.mutable.Map.empty[(String, String), List[Double]]
      .withDefaultValue(Nil)
    // a throwing query must never masquerade as a (fast) timing sample — its
    // wall time measures the failure, not the query. Count it here instead;
    // the JSON carries an `errors` map whenever any run failed.
    val failures = scala.collection.mutable.Map.empty[(String, String), Int]
      .withDefaultValue(0)
    def runPass(): Unit =
      for (name <- names; dir <- sfDirs; if namesFor(dir).contains(name)) {
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, dir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"bench FAIL $name @ $dir: ${e.getClass.getName}: " +
              String.valueOf(e.getMessage).takeWhile(_ != '\n').take(200))
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // per-query isolation: queries cache intermediates (shingle sets,
        // normalized embeddings) for their own multi-use plans; letting those
        // accumulate across 58 sequential queries turns the storage pool into
        // an eviction battleground (observed 3 s -> 95 s on a late query)
        spark.catalog.clearCache()
        if (ok) samples((dir, name)) = dt :: samples((dir, name))
        else failures((dir, name)) += 1
      }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      s(s.size / 2) // odd sample counts -> true median; even -> upper-median
    }
    def ratio(): Double = {
      val meds = samples.values.map(median).sum
      val mins = samples.values.map(_.min).sum
      if (mins > 0) meds / mins else 1.0
    }
    var done = 0
    while (done < passes) { runPass(); done += 1 }
    // throttle sentinel: a ratio past the limit means at least one query's
    // median is riding a throttle episode — widen the sample rather than
    // committing a poisoned artifact
    while (ratio() > ThrottleLimit && done < maxPasses) { runPass(); done += 1 }
    // The driver tail-captures a fixed number of trailing stdout chars; each
    // JSON line must fit whole or the parse fails. The suite has grown past
    // the point where a full 3-decimal per-query map always fits, so the map
    // keeps the most expensive queries (the ones a reader scans for
    // outliers) at full precision and collapses the cheap tail into
    // `_rest` (count `_rest_n`); `value` is always the run's total.
    def fmt(v: Double): String = {
      val s = "%.3f".format(v)
      s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
    }
    def lineFor(dir: String, keepAll: Boolean = false): String = {
      val dirNames = namesFor(dir)
      // a query whose every run failed has no samples — reported as -1 with
      // its failure count in `errors`, and excluded from the total
      val results = dirNames.map { n =>
        val xs = samples((dir, n))
        n -> (if (xs.isEmpty) -1.0 else median(xs))
      }
      val mins = dirNames.map { n =>
        val xs = samples((dir, n))
        n -> (if (xs.isEmpty) -1.0 else xs.min)
      }.toMap
      val good = results.filter(_._2 >= 0)
      val total = fmt(good.map(_._2).sum)
      val tr = fmt {
        val m = good.map(_._2).sum
        val lo = good.map { case (k, _) => mins(k) }.sum
        if (lo > 0) m / lo else 1.0
      }
      val byCost = results.sortBy { case (k, v) => (-v, k) }
      def encode(keep: Int): String = {
        val (kept, rest) = byCost.splitAt(keep)
        val entries = kept.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + fmt(v) } ++
          (if (rest.isEmpty) Nil
           else Seq("\"_rest\":" + fmt(rest.map(_._2).sum), "\"_rest_n\":" + rest.size))
        val minEntries = kept.sortBy(_._1).map { case (k, _) => "\"" + k + "\":" + fmt(mins(k)) }
        val qs = entries.mkString("{", ",", "}")
        val ms = minEntries.mkString("{", ",", "}")
        val partial = if (only.isDefined) "\"partial\":true," else ""
        val excluded = names.size - dirNames.size
        val excl = if (excluded > 0) s""""excluded_small_n":$excluded,""" else ""
        val errs = {
          val fs = dirNames.flatMap(n => failures.get((dir, n)).map(n -> _))
          if (fs.isEmpty) ""
          else fs.map { case (k, c) => "\"" + k + "\":" + c }
            .mkString("\"errors\":{", ",", "},")
        }
        s"""{"metric":"total","value":$total,"unit":"sec",$partial$excl$errs"throttle_ratio":$tr,"passes":$done,"queries":$qs,"mins":$ms,"sf":"$dir"}"""
      }
      // the driver tail-captures a fixed TOTAL trailing-char budget; in
      // multi-SF mode every line must fit together or the earlier line(s)
      // get pushed out of the capture window — divide the budget
      val lineBudget = math.max(600, 1900 / sfDirs.size)
      if (keepAll) encode(results.size)
      else (results.size to 0 by -1).map(encode).find(_.length <= lineBudget)
        .getOrElse(encode(0))
    }
    val lines = sfDirs.map(lineFor(_))
    // full-precision artifact path: per-query medians AND mins for every
    // query with no `_rest` collapse — the stdout lines stay inside the
    // driver's tail-capture budget, the file carries the whole map (the
    // scaling artifacts need every exponent, not just the expensive tail)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      // a bad path must not kill the stdout JSON lines after a full bench
      // run: create parents, log-and-continue on failure (ADVICE r9)
      try {
        val path = java.nio.file.Paths.get(p)
        Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(path,
          sfDirs.map(lineFor(_, keepAll = true)).mkString("", "\n", "\n"))
      } catch { case scala.util.control.NonFatal(e) =>
        // NonFatal only: an OOM/LinkageError here must not be swallowed
        // into a healthy-looking bench line (ADVICE r10)
        System.err.println(s"[bench] SPARK_GRAFT_BENCH_OUT write failed: ${e.getMessage}")
      }
    }
    spark.stop() // stop first: the JSON must be the last line(s) of stdout
    lines.foreach(println)
    System.out.flush()
  }
}
