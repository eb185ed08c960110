package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Num, Sources}

/** Corpus assembly — the composition layer where the training-data operators
  * meet: weighted source mixing, and the full preprocess chain (quality
  * filter → language filter → near-dup removal → split assignment) as ONE
  * declarative plan. Because every stage is a DataFrame transform, Catalyst
  * fuses the chain: the quality predicates push into the stats projection,
  * the dedup anti-join and split join share the scan, and nothing
  * materializes between "stages" — the reference's notebook staging with
  * none of its intermediate tables.
  */
object Corpus {

  /** Per-source sampling weight (percent kept): even-numbered sources are
    * kept whole, odd-numbered half — the stand-in for the per-source quality
    * weights a real mixing recipe assigns. Deterministic per row via the
    * shared mixer, so re-runs and the oracle agree row-for-row. */
  def mixBySourceWeight(spark: SparkSession, dir: String): DataFrame = {
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val keepPct = when(srcNum % 2 === 0, 100).otherwise(50)
    Sources.documents(spark, dir)
      .where(Sampling.mixHash(col("doc_id")) % 100 < keepPct)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"))
  }

  /** Tokens per packed training sequence. */
  val SeqLen = 512

  /** GPT-style sequence packing (concatenate-then-chunk): per language, docs
    * are laid out in doc_id order into one virtual token stream and each doc
    * is assigned to the fixed-[[SeqLen]] sequence containing its START
    * offset. This is the packing a causal-LM data loader performs, expressed
    * as a windowed cumulative sum — one shuffle on the language key, sequence
    * ids computed map-side from the running offset. At 100 TB the partition
    * key becomes (lang, shard) so one language never lands on one task; the
    * assignment stays deterministic because shards are hash-derived.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
    val nTokens = size(Text.bpeTokens(col("text"))).cast("long")
    Sources.documents(spark, dir)
      .select(col("doc_id"), col("lang"), nTokens.as("n_bpe_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_bpe_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("seq_id", Num.idiv(col("start_offset"), lit(SeqLen.toLong)))
      .withColumn("offset_in_seq", col("start_offset") % SeqLen)
      .withColumn("straddles_boundary",
        col("offset_in_seq") + col("n_bpe_tokens") > SeqLen)
  }

  /** Sliding-window width (tokens) for [[slidingWindows]]. */
  val WindowTokens = 48
  /** Stride between window starts — 50% overlap at the default width. */
  val WindowStride = 24

  /** Sliding-window chunking — the long-context data prep that [[packSequences]]
    * (concatenate-then-chunk) does NOT cover: each document is cut into
    * overlapping [[WindowTokens]]-token windows every [[WindowStride]]
    * tokens, so no token-span longer than the stride is ever lost at a
    * window boundary (the overlap is what lets a context-window model see
    * every contiguous passage whole). Emits one row per (doc, window) with
    * its start offset, actual token count (the tail window may be short)
    * and text. Map-side explode of a computed range — no shuffle at all;
    * output size is corpus_tokens/stride rows. */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame =
    slidingWindowsOf(Sources.documents(spark, dir))

  /** PRODUCTION ENTRY — [[slidingWindows]] over ANY (doc_id, text) frame. */
  def slidingWindowsOf(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .where(col("n_toks") > 0)
      .withColumn("n_windows",
        Num.idiv(col("n_toks") - 1, lit(WindowStride.toLong)) + 1)
    base
      .select(col("doc_id"), col("toks"), col("n_toks"),
        explode(sequence(lit(0L), col("n_windows") - 1)).as("window_id"))
      .withColumn("start_token", col("window_id") * WindowStride)
      .withColumn("window_toks",
        slice(col("toks"), (col("start_token") + 1).cast("int"),
          lit(WindowTokens)))
      .select(col("doc_id"), col("window_id"), col("start_token"),
        size(col("window_toks")).cast("long").as("n_window_tokens"),
        array_join(col("window_toks"), " ").as("window_text"))
  }

  /** Number of equal-size curriculum phases. */
  val CurriculumPhases = 4L

  /** CURRICULUM ordering — rank the corpus by the learned quality signal
    * (NB log-odds, best first) and cut it into [[CurriculumPhases]]
    * equal-size phases: the easy-to-hard (here: clean-to-noisy) schedule a
    * curriculum training run feeds batches in. The global rank rides the
    * distributed [[graft.plans.GlobalRank]] operator — no single-partition
    * sort at any corpus size; the phase is pure integer arithmetic on
    * (rank, total), so both engines agree exactly. Ties break on doc_id. */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    val (model, unk) = Text.nbModelFrames(docs)
    val scored = Text.nbMicroWith(docs, model, unk)
      .select(col("doc_id"), col("lo_micro"))
    val ranked = graft.plans.GlobalRank.withRankColumns(scored,
      Seq(col("lo_micro").desc, col("doc_id").asc), "_rn", "_rk", "_tot")
    ranked.select(col("doc_id"),
      Num.r4(col("lo_micro").cast("double") / 1e6).as("log_odds"),
      col("_rn").as("curriculum_rank"),
      Num.idiv((col("_rn") - 1) * CurriculumPhases, col("_tot"))
        .as("phase"))
  }

  /** Packed sequences per exported shard. */
  val ShardSeqs = 32L

  /** SHARD EXPORT — the dataloader handoff: the packed sequence stream
    * ([[packSequences]]) cut into fixed-size shards of [[ShardSeqs]]
    * sequences each, in the canonical (lang, seq_id) order, with per-shard
    * manifest stats (sequences, docs, attributed tokens, languages). A
    * training job's readers then each own a contiguous shard range —
    * deterministic, resumable, no two readers overlap. Token mass is
    * attributed to the sequence containing each doc's START offset, so
    * shard token counts PARTITION the corpus total (the reconciliation a
    * manifest must satisfy).
    *
    * Scale shape: the global sequence index rides the distributed
    * [[graft.plans.GlobalRank]] operator (range-partitioned two-pass rank —
    * no single-partition sort at any corpus size); everything else is one
    * hash agg to sequence grain and one to shard grain. */
  def exportShards(spark: SparkSession, dir: String): DataFrame = {
    val seqs = packSequences(spark, dir)
      .groupBy("lang", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bpe_tokens")).as("n_tokens"))
    val ranked = graft.plans.GlobalRank.withRankColumns(seqs,
      Seq(col("lang").asc, col("seq_id").asc), "_rn", "_rk", "_tot")
    ranked
      .withColumn("shard", Num.idiv(col("_rn") - 1, lit(ShardSeqs)))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_seqs"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"))
  }

  /** Docs per training batch for [[lengthBatches]]. */
  val BatchSize = 16

  /** Length-bucketed batch assembly: sort the corpus globally by token count
    * (doc_id tiebreak) and cut consecutive runs of [[BatchSize]] docs into
    * batches, so each batch holds similar-length documents and padding-to-max
    * waste is minimized — the standard dataloader trick for transformer
    * training. The global ordering rides on [[graft.plans.GlobalOrderedRank]]
    * (range exchange + per-partition sorts — no single-task sort), and the
    * batch id is a map-side function of the global row number. */
  def lengthBatches(spark: SparkSession, dir: String): DataFrame = {
    val nTokens = size(Text.bpeTokens(col("text"))).cast("long")
    val base = Sources.documents(spark, dir)
      .select(col("doc_id"), col("lang"), nTokens.as("n_bpe_tokens"))
    val ranked = graft.plans.GlobalRank.withRankColumns(base,
      Seq(col("n_bpe_tokens").asc, col("doc_id").asc), "_rn", "_rk", "_tot")
    ranked
      .withColumn("batch_id", Num.idiv(col("_rn") - 1, lit(BatchSize.toLong)))
      .drop("_rn", "_rk", "_tot")
  }

  /** Padding efficiency of [[lengthBatches]]: per batch, the tokens wasted if
    * every doc pads to the batch max — the metric the bucketing exists to
    * minimize. Pure aggregate over the batch id (one small shuffle). */
  def batchPaddingStats(spark: SparkSession, dir: String): DataFrame =
    lengthBatches(spark, dir)
      .groupBy("batch_id")
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("n_bpe_tokens")).as("max_tokens"),
        sum(col("n_bpe_tokens")).as("sum_tokens"))
      .withColumn("padding_tokens",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))

  /** Numerator/denominator of the [[tokenBudgetMix]] budget: 6/10 of the
    * largest source's token count (self-scaling, so every SF has both
    * kept-whole and down-sampled sources — never a vacuous result). */
  val BudgetNum = 6L
  val BudgetDen = 10L
  /** Per-mille resolution of the keep threshold (integer math end to end). */
  val MixResolution = 10000L

  /** Token-budget source mixing (the LLaMA-style recipe): cap every source at
    * a token budget; sources under budget are kept whole, sources over it are
    * down-sampled to the budget's fraction with the deterministic per-doc
    * mixer (append-stable, join-free at the row level). All threshold math is
    * integer, so the oracle reproduces it bit-for-bit.
    *
    * Plan shape: one narrow per-doc projection feeds (a) the per-source token
    * totals (partial agg), (b) the row-level filter after the totals
    * broadcast back — two small shuffles at source grain, one corpus scan. */
  def tokenBudgetMix(spark: SparkSession, dir: String): DataFrame = {
    val nTokens = size(Text.bpeTokens(col("text"))).cast("long")
    val perDoc = Sources.documents(spark, dir)
      .select(col("doc_id"), col("source"), nTokens.as("n_bpe_tokens"))
    val perSource = perDoc.groupBy("source")
      .agg(sum(col("n_bpe_tokens")).as("src_tokens"))
    val budget = perSource
      .agg(Num.idiv(max(col("src_tokens")) * BudgetNum, lit(BudgetDen)).as("budget"))
    val thresholds = perSource.crossJoin(broadcast(budget))
      .withColumn("keep_threshold",
        least(lit(MixResolution),
          Num.idiv(col("budget") * MixResolution, col("src_tokens"))))
    perDoc
      .join(broadcast(thresholds), Seq("source"))
      .where(Sampling.mixHash(col("doc_id")) % MixResolution < col("keep_threshold"))
      .groupBy(col("source"), col("src_tokens"), col("keep_threshold"))
      .agg(
        count(lit(1)).as("n_docs_kept"),
        sum(col("n_bpe_tokens")).as("tokens_kept"))
  }

  /** Target-distribution source rebalancing — the OTHER standard mixing
    * recipe next to [[tokenBudgetMix]]'s budget cap: choose per-source
    * DOWN-sampling so the post-mix token shares match a target weight
    * vector (here uniform — temperature-0 flattening, the limit case of
    * the multilingual temperature-sampling recipe) as closely as
    * document-grain sampling allows, without up-sampling any source.
    *
    * The math stays in exact integers end to end so the oracle replays it:
    * with T_s the source token counts and integer weights w_s (uniform ⇒
    * w_s = 1), the bottleneck source m minimizes T_s/w_s (compared via the
    * exact integer floor(T_s·[[MixResolution]]/w_s), ties → source name),
    * every source keeps ratio (T_m·w_s)/(w_m·T_s) ≤ 1, and a doc survives
    * iff mixHash(doc_id) % R · (w_m·T_s) < R · (T_m·w_s) — integer
    * cross-multiplication, no float thresholds. Output is the per-source
    * audit: tokens before/after, share before/after vs target.
    *
    * Plan shape: one corpus scan → source-grain partial agg (the totals)
    * → scalar bottleneck broadcast back → row-level hash filter → one
    * source-grain re-agg. No row-level joins, append-stable membership. */
  def rebalancedMix(spark: SparkSession, dir: String): DataFrame =
    mixToWeights(spark, dir, _ => lit(1L))

  /** TEMPERATURE-sampled source mixing — the SAME exact-integer machinery
    * as [[rebalancedMix]] with the standard multilingual temperature
    * weights at T=2: target share p_s ∝ T_s^(1/2) (Conneau & Lample 2019's
    * exponent-α recipe; α = 1/2 keeps low-resource sources present without
    * flattening to uniform). The weight is the EXACT integer square root
    * ([[graft.engine.Num.isqrt]] — IEEE sqrt plus a one-step integer
    * correction each way, so no sqrt rounding at any magnitude can move a
    * keep decision), and everything downstream is the proven integer
    * cross-multiplication. T=0 (uniform) and T=2 bracket the recipes a
    * mixing run sweeps; other integer-exact temperatures slot in as weight
    * functions. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    mixToWeights(spark, dir, t => greatest(lit(1L), Num.isqrt(t)))

  /** Fixture token budget = this many × the corpus's own token mass —
    * large enough that the temperature-mix target shares force some
    * sources past the repetition cap, so both planner verdicts occur. */
  val EpochBudgetX = 4L
  /** Repetition cap in epochs: repeated-data value decays sharply past
    * ~4 passes (Muennighoff et al. 2023, "Scaling Data-Constrained LMs"). */
  val EpochCap = 4L

  /** Data-budget EPOCH PLANNER — the pretraining-run planning table: given
    * a total token budget and the [[temperatureMix]] target shares
    * (w ∝ √tokens, exact [[Num.isqrt]]), how many PASSES over each source
    * does the budget imply, which sources blow the [[EpochCap]], and how
    * many target tokens are unservable under the cap. Every column is
    * integer-exact: shares and epochs as ppm via idiv, served tokens a
    * BIGINT min. (Fixture budget = [[EpochBudgetX]]×corpus; a production
    * run passes its real budget — the plan is the artifact a data lead
    * signs off before launch, next to the data card.)
    *
    * Scale shape: ONE source-grain groupBy with map-side partials over the
    * scan; everything after lives at ≤|sources| rows on broadcast scalars.
    * (Integer bound: w·budget < 2⁶³ holds to ~10¹³ budget tokens at the
    * fixture's weight scale; a 100-TB planner pre-divides budget/tot_w
    * once at the scalar grain.) */
  def epochPlan(spark: SparkSession, dir: String): DataFrame = {
    val nTokens = size(Text.bpeTokens(col("text"))).cast("long")
    val perSource = Sources.documents(spark, dir)
      .groupBy("source").agg(sum(nTokens).as("src_tokens"))
      .withColumn("w", greatest(lit(1L), Num.isqrt(col("src_tokens"))))
    val tot = perSource.agg(sum(col("src_tokens")).as("tot_tokens"),
      sum(col("w")).as("tot_w"))
    val target = Num.idiv(
      col("w") * (lit(EpochBudgetX) * col("tot_tokens")), col("tot_w"))
    val served = least(target, lit(EpochCap) * col("src_tokens"))
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("src_tokens"), col("w").as("weight"),
        Num.idiv(col("w") * 1000000L, col("tot_w")).as("target_share_ppm"),
        target.as("target_tokens"),
        Num.idiv(target * 1000000L, col("src_tokens")).as("epochs_ppm"),
        (Num.idiv(target * 1000000L, col("src_tokens")) >
          lit(EpochCap * 1000000L)).as("over_cap"),
        served.as("served_tokens"),
        (target - served).as("shortfall_tokens"))
  }

  /** Shared core of [[rebalancedMix]] / [[temperatureMix]]: down-sample to
    * target shares ∝ `weightOf(src_tokens)` without up-sampling any
    * source. */
  private def mixToWeights(spark: SparkSession, dir: String,
                           weightOf: Column => Column): DataFrame = {
    val nTokens = size(Text.bpeTokens(col("text"))).cast("long")
    val perDoc = Sources.documents(spark, dir)
      .select(col("doc_id"), col("source"), nTokens.as("n_bpe_tokens"))
    val perSource = perDoc.groupBy("source")
      .agg(sum(col("n_bpe_tokens")).as("src_tokens"))
      .withColumn("w", weightOf(col("src_tokens")))
    // bottleneck source m: min of the exact integer ratio floor(T·R/w);
    // ties broken by source name so both engines pick the same row
    val m = perSource
      .withColumn("_ratio", Num.idiv(col("src_tokens") * MixResolution, col("w")))
      .orderBy(col("_ratio"), col("source")).limit(1)
      .select(col("src_tokens").as("t_m"), col("w").as("w_m"))
    val tot = perSource.agg(
      sum(col("src_tokens")).as("tot_tokens"), sum(col("w")).as("tot_w"))
    val kept = perDoc
      .join(broadcast(perSource), Seq("source"))
      .crossJoin(broadcast(m))
      .where((Sampling.mixHash(col("doc_id")) % MixResolution)
        * (col("w_m") * col("src_tokens"))
        < lit(MixResolution) * (col("t_m") * col("w")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("n_bpe_tokens")).as("tokens_after"))
    val after = perSource.join(kept, Seq("source"), "left")
    val afterTot = broadcast(after.agg(
      sum(coalesce(col("tokens_after"), lit(0L))).as("tot_after")))
    after.crossJoin(broadcast(tot)).crossJoin(afterTot)
      .select(col("source"),
        col("src_tokens").as("tokens_before"),
        Num.r2(lit(100.0) * col("src_tokens") / col("tot_tokens")).as("share_before_pct"),
        Num.r2(lit(100.0) * col("w") / col("tot_w")).as("target_share_pct"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("tokens_after"), lit(0L)).as("tokens_after"),
        Num.r2(lit(100.0) * coalesce(col("tokens_after"), lit(0L))
          / col("tot_after")).as("share_after_pct"))
  }

  val QualityThreshold = 0.4

  /** Per-document rejection ledger — the auditable twin of [[preprocess]]:
    * EVERY document appears once with the first gate that rejected it
    * (fixed pipeline precedence: lang → quality → lm_outlier → near_dup) or
    * `kept` + its split. A 100-TB pipeline that silently drops 40% of its
    * corpus is undebuggable; this is the per-row "why" — same fused plan
    * economics as preprocess (each gate is a column predicate or an
    * existence join on the doc key; no extra corpus passes beyond the
    * gates' own), materialized per run next to the filtered corpus. */
  def rejectLedger(spark: SparkSession, dir: String): DataFrame = {
    val stats = Text.stats(spark, dir).select("doc_id", "lang", "quality_score")
    val lm = Text.lmScore(spark, dir).select("doc_id", "is_lm_outlier")
    val nearDup = Dedup.minhashLshPairs(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct().withColumn("_dup", lit(true))
    val split = Sampling.trainValTestSplit(spark, dir).select("doc_id", "split")
    val verdict = when(col("lang") =!= "en", "lang")
      .when(col("quality_score") < QualityThreshold, "quality")
      .when(col("is_lm_outlier"), "lm_outlier")
      .when(coalesce(col("_dup"), lit(false)), "near_dup")
      .otherwise("kept")
    stats
      .join(lm, "doc_id")
      .join(nearDup, Seq("doc_id"), "left")
      .join(split, "doc_id")
      .select(col("doc_id"), col("lang"), col("quality_score"),
        verdict.as("verdict"),
        (verdict === "kept").as("kept"),
        when(verdict === "kept", col("split")).as("split"))
  }

  /** Half-width of the quality-sampling ramp in micro-nats: log-odds at
    * −[[QsRampMicroNats]] keep with probability 0, at +[[QsRampMicroNats]]
    * with probability 1, linear in between (±1 nat spans ~80% of the
    * fixture's score distribution, so the probabilistic band is real). */
  val QsRampMicroNats = 1000000L

  /** Classifier-scored quality SAMPLING — the GPT-3-style soft filter
    * (Brown et al. 2020, App. A: documents are kept stochastically with
    * probability increasing in the quality-classifier score, rather than
    * hard-thresholded, so the kept corpus stays diverse while shifting
    * toward quality). Deterministic form: the NB log-odds
    * ([[Text.nbQuality]]) sets a keep probability via a clamped linear
    * ramp, and the keep DECISION compares the shared integer mixer against
    * it — keep iff mix(doc_id) mod 1000 < p‰. Everything is integer
    * arithmetic on the exact micro-nat log-odds (the ramp floor-division
    * is [[graft.engine.Num.fdiv]] — pure BIGINT floor semantics, no float
    * surface), so there is no float boundary anywhere in the verdict:
    * reruns, engines, builds, and partitionings all agree row-for-row.
    *
    * Scale shape: [[Text.nbModelFrames]]'s one token shuffle + bounded
    * vocab, then map-only scoring and gating — the sample decision itself
    * is join-free, exactly like [[Sampling.trainValTestSplit]]. */
  def qualitySample(spark: SparkSession, dir: String): DataFrame =
    qualitySampleOf(Sources.documents(spark, dir))

  /** PRODUCTION ENTRY — [[qualitySample]] over ANY (doc_id, lang, source,
    * text) frame: trains the NB model on the frame itself. */
  def qualitySampleOf(docs: DataFrame): DataFrame = {
    val (model, unk) = Text.nbModelFrames(docs)
    qualitySampleWith(docs, model, unk)
  }

  /** [[qualitySampleOf]] against a FROZEN pre-trained classifier — the
    * per-doc verdict is then a pure map-only function of the doc, which is
    * what lets the streaming release fold ([[graft.streaming.Streams
    * .releaseIngest]]) gate each micro-batch bit-identically to the batch
    * pipeline: the model is a fixed input refreshed by a scheduled job,
    * never re-trained on the hot path. */
  def qualitySampleWith(docs: DataFrame, model: DataFrame,
                        unk: DataFrame): DataFrame = {
    val pMillis = greatest(lit(0L), least(lit(1000L),
      lit(500L) + Num.fdiv(col("lo_micro"), lit(QsRampMicroNats / 500L))))
    Text.nbMicroWith(docs, model, unk)
      .withColumn("keep_millis", pMillis)
      .withColumn("kept",
        Sampling.mixHash(col("doc_id")) % 1000 < col("keep_millis"))
      .select(col("doc_id"), col("lang"), col("source"),
        Num.r4(col("lo_micro").cast("double") / 1e6).as("log_odds"),
        col("keep_millis"), col("kept"))
  }

  /** The RELEASE MANIFEST as one queryable plan — the exact algebra of
    * [[graft.engine.Pipeline.runCorpusPipeline]]'s `corpus_release_manifest`
    * stage (kept ∧ train-split ∧ ¬contaminated ∧ ¬any-modality-near-dup),
    * composed from the same production entries instead of materialized
    * stage outputs, so an analyst can `SELECT * FROM
    * corpus_release_manifest` without running the pipeline (VERDICT r11
    * #7). The cross-modal arm rides the session fingerprint store —
    * decode-once, like the `dedup_cross_modal_indexed` deployment twin. */
  def releaseManifest(spark: SparkSession, dir: String): DataFrame = {
    // Pin the scrubbed corpus once per run (OPTIMIZATION r15): the quality
    // sampler (model + scoring), both decontamination branches, and the
    // cross-modal text arm otherwise each re-run the documents scan + the
    // full redaction regex chain as their own subtree — six corpus passes
    // where the pipeline form materializes the scrubbed stage output ONCE
    // and fans out. The persist is that materialization's in-plan analogue.
    // SESSION-LIFETIME PIN, by design (ADVICE r15): the returned manifest
    // is corpus-grain and lazily references `scrubbed`, so the pin must
    // outlive this call — the standalone-entrypoint contract of
    // [[Similarity.Pins]]' doc, not the small-result-audit release case.
    // Reclamation: the bench/Verify per-query clearCache(), or session
    // teardown for any other caller; re-calls re-use nothing (fresh persist
    // per call, freed the same way).
    val scrubbed = Pii.redactedOf(Sources.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("source"),
        col("redacted_text").as("text"))
      .persist()
    val bucket = Sampling.mixHash(col("doc_id")) % 100
    val flags = Text.decontaminateOf(
      scrubbed.where(bucket < 100 - Text.ContamEvalPct),
      scrubbed.where(bucket >= 100 - Text.ContamEvalPct))
    val dups = Multimodal.crossModalDupsFromStore(spark, scrubbed,
        FpStore.sessionStore(spark, dir))
      .where(col("any_dup")).select("doc_id")
    qualitySampleOf(scrubbed)
      .where(col("kept")).select("doc_id", "lang", "source")
      .join(flags.select(col("doc_id"),
        col("n_contaminated"), col("contaminated")), Seq("doc_id"))
      .where(!col("contaminated"))
      .join(dups, Seq("doc_id"), "left_anti")
  }

  /** Per-source corpus DATA CARD — the release report a dataset ships with
    * (Gebru et al., "Datasheets for Datasets"): volume (docs / unique texts
    * / tokens), language mix, heuristic-gate pass rate, learned-classifier
    * quality rate, and LM statistics (exact mean cross-entropy +
    * outlier count), one row per source. This is the audit table a data
    * vendor hands over and a training team diff-checks between corpus
    * versions ([[graft.ext.Sketch.statsDrift]] is the generic-schema side
    * of the same idea).
    *
    * Exactness: the mean CE aggregates the per-doc micro-nat BIGINT totals
    * ([[Text.lmPerDoc]]) — rounded per-doc CEs cannot be re-aggregated, the
    * integer sums can, order-free. All ratios are single IEEE divisions of
    * exact integer counts.
    *
    * Scale shape: two token shuffles (the LM and NB models — each one
    * explode → partial-agg, bounded vocab broadcast back) + map-only gate
    * and hash columns; every aggregate is source-grain with map-side
    * partials. Output is |sources| rows. */
  def dataCard(spark: SparkSession, dir: String): DataFrame =
    dataCardOf(Sources.documents(spark, dir))

  /** PRODUCTION ENTRY — [[dataCard]] over ANY (doc_id, lang, source, text)
    * frame. */
  def dataCardOf(docs: DataFrame): DataFrame = {
    val nonEmptyTok =
      size(filter(Text.tokens(col("text")), w => w =!= "")).cast("long")
    val base = docs
      .select(col("source"), col("lang"), md5(col("text")).as("h"),
        nonEmptyTok.as("ntok"), Text.gopherGate.passesAll.as("gate"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_unique_texts"),
        sum(col("ntok")).as("n_tokens"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        sum(when(col("gate"), 1L).otherwise(0L)).as("n_gate"))
    val (lmModel, lmUnk) = Text.lmModelFrames(docs)
    val ceR4 = Num.r4(col("s").cast("double") /
      (col("n_scored_tokens").cast("double") * 1e6))
    val lm = Text.lmPerDoc(docs, lmModel, lmUnk)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source").agg(
        sum(col("s")).as("s_sum"),
        sum(col("n_scored_tokens")).as("nt_sum"),
        sum(when(ceR4 > Text.LmCeOutlier, 1L).otherwise(0L)).as("n_lm_outliers"))
    val (nbModel, nbUnk) = Text.nbModelFrames(docs)
    val nb = Text.nbMicroWith(docs, nbModel, nbUnk)
      .groupBy("source").agg(
        sum(when(col("lo_micro") > 0, 1L).otherwise(0L)).as("n_nb_good"))
    def pct(n: org.apache.spark.sql.Column) =
      Num.r4(lit(100.0) * n.cast("double") / col("n_docs").cast("double"))
    base
      .join(lm, Seq("source"), "left")
      .join(nb, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_unique_texts"),
        col("n_tokens"),
        pct(col("n_en")).as("pct_en"),
        pct(col("n_gate")).as("pct_gate_pass"),
        pct(coalesce(col("n_nb_good"), lit(0L))).as("pct_nb_good"),
        Num.r4(col("s_sum").cast("double") /
          (col("nt_sum").cast("double") * 1e6)).as("mean_cross_entropy"),
        coalesce(col("n_lm_outliers"), lit(0L)).as("n_lm_outliers"))
  }

  /** The end-to-end preprocessing pipeline a training run executes: keep
    * English docs above the quality bar, drop near-duplicates (MinHash-LSH,
    * keep-lowest rule), assign reproducible splits. One fused plan. */
  def preprocess(spark: SparkSession, dir: String): DataFrame = {
    val stats = Text.stats(spark, dir).select("doc_id", "lang", "quality_score")
    val nearDups = Dedup.minhashLshPairs(spark, dir).select("doc_b")
    val split = Sampling.trainValTestSplit(spark, dir).select("doc_id", "split")
    stats
      .where(col("lang") === "en" && col("quality_score") >= QualityThreshold)
      .join(nearDups, col("doc_id") === col("doc_b"), "left_anti")
      .join(split, "doc_id")
      .select("doc_id", "lang", "quality_score", "split")
  }
}
