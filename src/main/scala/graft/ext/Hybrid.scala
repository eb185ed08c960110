package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Num, Sources}

/** HYBRID RETRIEVAL — reciprocal-rank fusion (RRF; Cormack, Clarke &
  * Büttcher, SIGIR 2009) of a lexical and a dense ranking over the same
  * query set: the fusion layer every modern retrieval stack (RAG corpus
  * search, known-item lookup over a training corpus) runs on top of the
  * BM25 and ANN arms this library already ships.
  *
  * RRF is rank-only — `score(d) = Σ_arms 1/(K + rank_arm(d))` — which is
  * exactly what makes it exact here: no score normalization across arms
  * (BM25 micro-nats vs cosine are incomparable scales; rank fusion
  * sidesteps the calibration problem entirely, the reason the paper's
  * simple method beats learned fusion baselines), and the contribution is
  * a ratio of small integers, computed as micro-units with a single BIGINT
  * division — both engines agree bit-for-bit with zero float surface.
  *
  * Scale shape: the fusion itself is O(queries × k) — two top-k lists
  * full-outer-joined on (qid, doc_id) — vanishing next to its arms. The
  * arms ARE the cost, and both are this library's deployment-shaped ones:
  * BM25 broadcasts query terms into the (optionally indexed) postings
  * scan, the dense arm probes the √n k-means IVF with the full-corpus
  * index build amortized across the query batch and the probe side
  * restricted to the query subset. Neither arm is rebuilt per query at
  * deployment (persisted TextIndex / VectorIndex stores); the registered
  * twin rebuilds both per run as its verification harness.
  */
object Hybrid {

  /** The RRF smoothing constant — K=60 from the paper; large enough that
    * a rank-1 hit in one arm cannot drown consensus across arms. */
  val RrfK = 60L

  /** Fused results kept per query. */
  val FusedTopK = 5

  /** Micro-unit RRF contribution of a 1-based rank; 0 marks "not retrieved
    * by this arm" and contributes nothing. 1e6 ÷ (K+rank) as one BIGINT
    * division — DuckDB twin `1000000 // (K + rank)`. */
  private def contrib(rank: Column): Column =
    when(rank === 0L, lit(0L))
      .otherwise(Num.idiv(lit(1000000L), lit(RrfK) + rank))

  /** PRODUCTION ENTRY — fuse ANY two (qid, doc_id, rank) top-k lists.
    * Output per qid: the [[FusedTopK]] docs by descending micro-unit RRF
    * score (ties → lower doc_id), with each arm's rank carried through
    * (0 = the arm did not retrieve the doc). A doc retrieved by BOTH arms
    * at middling ranks outranks a single-arm rank-1 hit exactly when
    * 2/(K+r) beats 1/(K+1) — consensus-weighting, the point of RRF. */
  def rrfFuseOf(lex: DataFrame, dense: DataFrame): DataFrame = {
    val l = lex.select(col("qid"), col("doc_id"),
      col("rank").cast("long").as("lex_rank"))
    val d = dense.select(col("qid"), col("doc_id"),
      col("rank").cast("long").as("dense_rank"))
    val fused = l.join(d, Seq("qid", "doc_id"), "full")
      .select(col("qid"), col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0L)).as("dense_rank"))
      .withColumn("rrf_mn",
        contrib(col("lex_rank")) + contrib(col("dense_rank")))
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy("qid").orderBy(col("rrf_mn").desc, col("doc_id"))))
      .where(col("rank") <= FusedTopK)
      .select("qid", "rank", "doc_id", "rrf_mn", "lex_rank", "dense_rank")
  }

  /** The registered twin: BM25 over the fixture's known-item probe queries
    * (qid = the probed doc's id) fused with the √n k-means IVF dense arm
    * probing the SAME ids' embeddings — the fixture links the two
    * modalities by id (doc_id ≡ vec_id, the multimodal-table key
    * contract). The lexical arm scores the query doc itself (known-item
    * self-hit); the dense arm excludes self like every ANN arm here — so
    * the fused self-hit carries only the lexical contribution, and a doc
    * both arms agree on can legitimately outrank it. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    val lex = Text.bm25TopKOf(docs, Text.bm25FixtureQueries(docs))
      .select(col("qid"), col("doc_id"), col("rank"))
    val qBucket =
      Sampling.mixHash(col("vec_id")) % 100 >= lit(100 - Text.Bm25QueryPct)
    val dense = Similarity.annIvfKmeansQueries(spark, dir, qBucket)
      .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
        col("rank"))
    rrfFuseOf(lex, dense)
  }

  /** The DEPLOYMENT-shaped twin: the same fusion over the two PERSISTED
    * stores — [[TextIndex]] postings for the lexical arm, the hier-IVF
    * [[VectorIndex]] for the dense arm — with a fixed
    * [[Text.Bm25SearchQueries]]-query batch and both stores built at most
    * once per session. This arm's bench number is the end-to-end hybrid
    * search cost a serving stack pays per query batch: two store probes
    * (each exchange-free on its store side) plus the O(queries × k)
    * fusion. Oracle: the bounded BM25 twin fused with the hier-IVF twin
    * restricted to the same qids. */
  def hybridRrfIndexed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    val queries = Text.bm25BoundedQueries(docs)
    val lex = TextIndex.search(spark, TextIndex.sessionStore(spark, dir), queries)
      .select(col("qid"), col("doc_id"), col("rank"))
    val qvecs = Similarity.withNorm(Sources.embeddings(spark, dir))
      .join(broadcast(queries.select(col("qid").as("vec_id"))), Seq("vec_id"))
    val dense = VectorIndex.search(spark, VectorIndex.sessionStore(spark, dir), qvecs)
      .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
        col("rank"))
    rrfFuseOf(lex, dense)
  }
}
