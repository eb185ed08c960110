package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Sources

/** Noop-isolated phase split of the round-16 optimization targets — the
  * measurement step the guide (§1.4) prescribes before touching anything:
  * each labeled phase is evaluated to a noop write (every column of every
  * row computed, nothing collected) for SPARK_GRAFT_PROBE_PASSES passes in
  * ONE JVM, interleaved pass-major like [[graft.Bench]], and the per-phase
  * MIN is reported as one JSON line. Store-backed phases run against the
  * session stores (warmed by the first pass — the serving shape the bench
  * mins measure).
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_PROBE_PASSES (default 3).
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt
    graft.Session.silenceAllLogs()
    val spark = graft.Session.build(s"local[$cpus]", cpus, "graft-phase-probe")

    def docs() = Sources.documents(spark, sfDir)
    def scrubbedFrame() = Pii.redactedOf(docs())
      .select(col("doc_id"), col("lang"), col("source"),
        col("redacted_text").as("text"))

    // (label, thunk). Thunks rebuild their frame per pass — the bench shape.
    val phases: Seq[(String, () => DataFrame)] = Seq(
      // --- serving stack (BM25 index + dense index, warm session stores)
      "bm25_queries_local" -> (() =>
        Text.bm25BoundedQueriesShared(spark, sfDir)),
      "bm25_search" -> (() =>
        TextIndex.search(spark, TextIndex.sessionStore(spark, sfDir),
          Text.bm25BoundedQueriesShared(spark, sfDir))),
      "bm25_postings_scan" -> (() => {
        val store = TextIndex.sessionStore(spark, sfDir)
        TextIndex.livePostings(spark, store)
      }),
      "bm25_tf_join" -> (() => {
        val store = TextIndex.sessionStore(spark, sfDir)
        val queries = Text.bm25BoundedQueriesShared(spark, sfDir)
        val qterms = Text.bm25QueryTerms(queries)
        TextIndex.livePostings(spark, store)
          .join(broadcast(qterms.select("token").distinct()), Seq("token"))
          .select("token", "doc_id", "tf", "dl")
      }),
      "bm25_stats_tots" -> (() => {
        val store = TextIndex.sessionStore(spark, sfDir)
        TextIndex.liveStats(spark, store)
          .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
            coalesce(sum(col("t")), lit(0L)).as("t"))
      }),
      "bm25_rm3_search" -> (() =>
        TextIndex.searchRm3(spark, TextIndex.sessionStore(spark, sfDir),
          Text.bm25BoundedQueriesShared(spark, sfDir))),
      "dense_search" -> (() => {
        val queries = Text.bm25BoundedQueriesShared(spark, sfDir)
        val qvecs = Similarity.withNorm(Sources.embeddings(spark, sfDir))
          .join(broadcast(queries.select(col("qid").as("vec_id"))), Seq("vec_id"))
        VectorIndex.search(spark, VectorIndex.sessionStore(spark, sfDir), qvecs)
      }),
      "hybrid_rrf_indexed" -> (() => Hybrid.hybridRrfIndexed(spark, sfDir)),
      // --- batch BM25 harness phases
      "bm25_topk_batch" -> (() => Text.bm25TopK(spark, sfDir)),
      // --- release-manifest phases
      "scrub_redact" -> (() => scrubbedFrame()),
      "scrub_plus_lsh" -> (() => Dedup.minhashLshPairsOf(scrubbedFrame())),
      "lsh_raw_docs" -> (() => Dedup.minhashLshPairsOf(docs())),
      "quality_sample" -> (() => Corpus.qualitySampleOf(scrubbedFrame())),
      "decontaminate" -> (() => {
        val s = scrubbedFrame()
        val bucket = Sampling.mixHash(col("doc_id")) % 100
        Text.decontaminateOf(
          s.where(bucket < 100 - Text.ContamEvalPct),
          s.where(bucket >= 100 - Text.ContamEvalPct))
      }),
      "cross_modal_from_store" -> (() =>
        Multimodal.crossModalDupsFromStore(spark, scrubbedFrame(),
          FpStore.sessionStore(spark, sfDir))),
      "manifest_full" -> (() => Corpus.releaseManifest(spark, sfDir)),
      // --- CC / preprocess phases
      "clusters_full" -> (() => Dedup.clusters(spark, sfDir)),
      "preprocess_full" -> (() => Corpus.preprocess(spark, sfDir)),
      "text_stats" -> (() => Text.stats(spark, sfDir)),
      "split_assign" -> (() => Sampling.trainValTestSplit(spark, sfDir)),
      "cluster_split_full" -> (() => Sampling.clusterSafeSplit(spark, sfDir))
    )

    // per-job wall times, tagged with the active phase label — the "where
    // do the seconds go" evidence (jobs ≈ broadcast builds + the main
    // action; their wall-clock sum vs the phase wall shows driver gaps)
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Double)]
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]
    @volatile var active = ""
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, (active, System.nanoTime()))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(je.jobId)).foreach { case (lbl, t0) =>
          jobLog.add((lbl, je.jobId, (System.nanoTime() - t0) / 1e9))
        }
      }
    })
    val mins = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(Double.MaxValue)
    for (p <- 1 to passes; (label, thunk) <- phases) {
      spark.sparkContext.setJobDescription(s"phase:$label pass:$p")
      active = s"$label#$p"
      val t0 = System.nanoTime()
      try {
        thunk().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        mins(label) = math.min(mins(label), dt)
      } catch { case e: Throwable =>
        System.err.println(s"phase $label FAIL: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    if (sys.env.contains("GRAFT_PROBE_JOBS")) {
      import scala.jdk.CollectionConverters._
      val byPhase = jobLog.asScala.toSeq.groupBy(_._1)
      byPhase.toSeq.sortBy(_._1).foreach { case (lbl, js) =>
        val tot = js.map(_._3).sum
        System.err.println(f"JOBS $lbl%-28s n=${js.size}%3d sumJobWall=$tot%7.3f " +
          js.sortBy(_._2).map(j => f"${j._3}%.2f").mkString(" "))
      }
    }
    def r3(x: Double) = math.floor(x * 1000 + 0.5) / 1000
    val body = phases.map(_._1).map(l => s""""$l":${r3(mins(l))}""").mkString(",")
    println(s"""{"metric":"phase_probe_r16","unit":"sec","passes":$passes,"mins":{$body},"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
