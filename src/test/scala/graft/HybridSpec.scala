package graft

import org.apache.spark.sql.functions._
import graft.ext.{Hybrid, Sampling, Similarity, Text}

/** Hybrid retrieval ([[graft.ext.Hybrid]]): exact integer RRF arithmetic,
  * consensus ordering, tie-breaks, the top-k cap, and the probe-filter
  * identity (the filtered dense arm ≡ the full k-means IVF arm restricted
  * to the query ids) — oracle parity of `text_hybrid_rrf` is Verify's
  * job. */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(rows: Seq[(Long, Long, Int)]) =
    rows.toDF("qid", "doc_id", "rank")

  private def key(r: org.apache.spark.sql.Row) = (
    r.getAs[Long]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
    r.getAs[Long]("rrf_mn"), r.getAs[Long]("lex_rank"),
    r.getAs[Long]("dense_rank"))

  test("RRF fusion is exact integer arithmetic: consensus at rank (2,1) " +
      "outranks a single-arm rank-1 hit") {
    val lex = ranks(Seq((1L, 10L, 1), (1L, 11L, 2)))
    val dense = ranks(Seq((1L, 11L, 1), (1L, 12L, 2)))
    val got = Hybrid.rrfFuseOf(lex, dense)
      .orderBy("qid", "rank").collect().map(key).toSeq
    // 1e6//61 = 16393, 1e6//62 = 16129
    assert(got === Seq(
      (1L, 1, 11L, 16393L + 16129L, 2L, 1L), // both arms: consensus wins
      (1L, 2, 10L, 16393L, 1L, 0L),          // lexical-only rank 1
      (1L, 3, 12L, 16129L, 0L, 2L)))         // dense-only rank 2
  }

  test("equal fused scores tie-break to the lower doc_id") {
    val got = Hybrid.rrfFuseOf(
        ranks(Seq((7L, 20L, 1))), ranks(Seq((7L, 5L, 1))))
      .orderBy("rank").collect().map(key).toSeq
    assert(got === Seq(
      (7L, 1, 5L, 16393L, 0L, 1L),
      (7L, 2, 20L, 16393L, 1L, 0L)))
  }

  test("fusion keeps at most FusedTopK docs per query") {
    val lex = ranks((1 to 8).map(i => (1L, 100L + i, i)))
    val dense = ranks((1 to 8).map(i => (1L, 200L + i, i)))
    val got = Hybrid.rrfFuseOf(lex, dense).collect()
    assert(got.length === Hybrid.FusedTopK)
    assert(got.map(_.getAs[Int]("rank")).sorted.toSeq ===
      (1 to Hybrid.FusedTopK))
  }

  test("end-to-end hybrid: every BM25 query fused, ranks contiguous, " +
      "scores non-increasing, both arms contribute somewhere") {
    val out = Hybrid.hybridRrf(spark, sf).collect().map(key).toSeq.sorted
    assert(out.nonEmpty)
    val wantQids = Text.bm25FixtureQueries(
        graft.engine.Sources.documents(spark, sf))
      .select("qid").collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet === wantQids)
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._2) === (1 to byRank.size), s"ranks not contiguous for $qid")
      val scores = byRank.map(_._4)
      assert(scores === scores.sorted.reverse, s"scores not monotone for $qid")
    }
    // each arm contributed docs the other missed
    assert(out.exists(r => r._5 > 0 && r._6 == 0), "no lexical-only doc")
    assert(out.exists(r => r._6 > 0 && r._5 == 0), "no dense-only doc")
    // consensus (both-arms) rows must surface IFF the arms' top lists
    // overlap. Whether they overlap is a fixture coincidence of the dense
    // quantizer (the pre-r14 sqrt(n) cells happened to produce one at
    // sf0.001; the hier-cell arm does not) — so assert the EQUIVALENCE,
    // not bare existence; the RRF sum arithmetic itself is pinned by the
    // integer unit test above. A consensus row always outranks every
    // single-arm row (2·(1e6//(61+7)) > 1e6//61), so overlap in the arms
    // implies a both-ranks row inside the fused top-k.
    val docs = graft.engine.Sources.documents(spark, sf)
    val lexPairs = Text.bm25TopKOf(docs, Text.bm25FixtureQueries(docs))
      .select("qid", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val qBucket = Sampling.mixHash(col("query_id")) % 100 >=
      lit(100 - Text.Bm25QueryPct)
    val densePairs = Similarity.annIvfKmeans(spark, sf).where(qBucket)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = lexPairs intersect densePairs
    assert(out.exists(r => r._5 > 0 && r._6 > 0) === overlap.nonEmpty,
      s"consensus rows inconsistent with arm overlap (${overlap.size} pairs)")
  }

  test("indexed hybrid equals the batch arms: persisted BM25 postings + " +
      "persisted hier-IVF store fuse bit-identically to bounded BM25 + " +
      "the hier arm restricted to the same qids") {
    val docs = graft.engine.Sources.documents(spark, sf)
    val queries = Text.bm25BoundedQueries(docs)
    val qids = queries.select("qid").collect().map(_.getLong(0)).toSet
    val lex = Text.bm25TopKOf(docs, queries)
      .select(col("qid"), col("doc_id"), col("rank"))
    val dense = Similarity.annIvfHier(spark, sf)
      .where(col("query_id").isin(qids.toSeq: _*))
      .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
        col("rank"))
    val want = Hybrid.rrfFuseOf(lex, dense).collect().map(key).toSeq.sorted
    val got = Hybrid.hybridRrfIndexed(spark, sf).collect().map(key).toSeq.sorted
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("probe-filter identity: the hybrid's dense arm equals the full " +
      "k-means IVF arm restricted to the query ids") {
    val docs = graft.engine.Sources.documents(spark, sf)
    val lex = Text.bm25TopKOf(docs, Text.bm25FixtureQueries(docs))
      .select(col("qid"), col("doc_id"), col("rank"))
    val qBucket = Sampling.mixHash(col("query_id")) % 100 >=
      lit(100 - Text.Bm25QueryPct)
    val fullArm = Similarity.annIvfKmeans(spark, sf).where(qBucket)
      .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
        col("rank"))
    val want = Hybrid.rrfFuseOf(lex, fullArm).collect().map(key).toSeq.sorted
    val got = Hybrid.hybridRrf(spark, sf).collect().map(key).toSeq.sorted
    assert(got === want)
  }

  test("retrieval quality: exact integer hit/MRR arithmetic over self-hits") {
    val res = ranks(Seq(
      (1L, 1L, 1),  // qid 1: self at rank 1 -> rr 1000000
      (1L, 9L, 2),
      (2L, 7L, 1),
      (2L, 2L, 3),  // qid 2: self at rank 3 -> rr 1000000//3 = 333333
      (3L, 8L, 1))) // qid 3: no self-hit
    val nq = Seq(3L).toDF("n_queries")
    val got = Hybrid.retrievalQualityOf("arm", res, nq).collect().head
    assert(got.getAs[String]("arm") === "arm")
    assert(got.getAs[Long]("n_queries") === 3L)
    assert(got.getAs[Long]("hits_at_k") === 2L)
    assert(got.getAs[Long]("mrr_ppm") === (1000000L + 333333L) / 3L) // 444444
  }

  test("retrieval quality: zero self-hits yields mrr 0, never null") {
    val got = Hybrid.retrievalQualityOf("arm",
        ranks(Seq((1L, 9L, 1))), Seq(5L).toDF("n_queries")).collect().head
    assert(got.getAs[Long]("hits_at_k") === 0L)
    assert(got.getAs[Long]("mrr_ppm") === 0L)
  }

  test("context pack: greedy prefix stops at the first overflow; the budget " +
      "boundary is inclusive; an oversized rank-1 doc packs nothing") {
    def doc(id: Long, tokens: Int) = (id, Seq.fill(tokens)("w").mkString(" "))
    val docs = Seq(doc(10L, 60), doc(11L, 50), doc(12L, 30), doc(13L, 200))
      .toDF("doc_id", "text")
    val res = ranks(Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // 60, 110, 140 cumulative
      (2L, 13L, 1), (2L, 12L, 2)))              // rank-1 doc alone overflows
    val got = Hybrid.contextPackOf(res, docs, 128L)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("doc_tokens"),
        r.getAs[Long]("cum_tokens"))).toSeq
    // qid 1 keeps ranks 1-2 (cum 60, 110 <= 128), drops rank 3 (140);
    // qid 2's rank-1 doc is 200 tokens: the prefix is empty, and rank 2 is
    // NOT admitted past it (prefix packing preserves rank order)
    assert(got === Seq((1L, 1, 10L, 60L, 60L), (1L, 2, 11L, 50L, 110L)))
    // boundary: budget exactly at the running total keeps the row
    val exact = Hybrid.contextPackOf(res, docs, 110L)
      .where($"qid" === 1L).orderBy("rank").collect()
      .map(_.getAs[Long]("cum_tokens")).toSeq
    assert(exact === Seq(60L, 110L))
  }

  test("context pack: a retrieved doc MISSING from the corpus terminates " +
      "that qid's prefix — nothing packs past the hole (ADVICE r10)") {
    def doc(id: Long, tokens: Int) = (id, Seq.fill(tokens)("w").mkString(" "))
    val docs = Seq(doc(10L, 20), doc(12L, 20), doc(20L, 30))
      .toDF("doc_id", "text") // doc 11 drifted out of the corpus
    val res = ranks(Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // rank 2 is the hole
      (2L, 20L, 1)))                            // control qid: unaffected
    val got = Hybrid.contextPackOf(res, docs, 128L)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"))).toSeq
    // qid 1: rank 1 packs, the unknown-length rank 2 acts as an overflow,
    // rank 3 is NOT admitted past it; qid 2 packs normally
    assert(got === Seq((1L, 1, 10L), (2L, 1, 20L)))
  }

  test("retrieval quality rides the stores (OPTIMIZATION r15): the " +
      "registered audit equals the batch-arm formulation row-for-row") {
    val docs = graft.engine.Sources.documents(spark, sf)
    val queries = Text.bm25BoundedQueries(docs)
    val nq = queries.agg(count(lit(1)).as("n_queries"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("arm"),
        r.getAs[Long]("n_queries"), r.getAs[Long]("hits_at_k"),
        r.getAs[Long]("mrr_ppm"))).toSeq
    // the pre-r15 shape: batch bm25 + batch rm3 + the indexed hybrid
    val want = rows(
      Hybrid.retrievalQualityOf("bm25", Text.bm25TopKOf(docs, queries), nq)
        .unionByName(Hybrid.retrievalQualityOf("bm25_rm3",
          Text.bm25Rm3Of(docs, queries), nq))
        .unionByName(Hybrid.retrievalQualityOf("hybrid_rrf",
          Hybrid.hybridRrfIndexed(spark, sf), nq))
        .orderBy("arm"))
    val got = rows(Hybrid.retrievalQuality(spark, sf))
    assert(got === want)
  }

  test("retrieval-quality gate: fixture self-hits pass the floor; a broken " +
      "(empty) retrieval list FAILS rather than passing vacuously") {
    val nq = Seq(3L).toDF("n_queries")
    val healthy = ranks(Seq((1L, 1L, 1), (2L, 2L, 1), (3L, 3L, 2)))
    assert(Hybrid.retrievalQualityGate(healthy, nq,
      Hybrid.RetrievalHitFloorPct) === ((100L, true)))
    // 0 of 3 known items found (the broken-stack regime) → 0% < floor
    val degraded = ranks(Seq((1L, 8L, 1), (2L, 9L, 1), (3L, 9L, 1)))
    assert(Hybrid.retrievalQualityGate(degraded, nq,
      Hybrid.RetrievalHitFloorPct) === ((0L, false)))
    // zero queries proves nothing: FAIL, not a vacuous pass
    assert(Hybrid.retrievalQualityGate(
      ranks(Seq.empty[(Long, Long, Int)]), Seq(0L).toDF("n_queries"),
      Hybrid.RetrievalHitFloorPct) === ((0L, false)))
  }
}
