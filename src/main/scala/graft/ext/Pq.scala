package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Num, Sources}
import Num._

/** Product quantization (PQ) over the `embeddings` table — the memory side
  * of the 100-TB ANN story (reference surface: the same ANN retrieval as
  * `Similarity`; technique: Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", IEEE TPAMI 2011 — public literature, like SemDeDup /
  * SRP-LSH elsewhere in this package).
  *
  * The IVF variants in [[Similarity]] shrink SEARCH to O(scanned-fraction),
  * but their inverted lists still carry the full vector: 64 doubles + norm
  * ≈ 520 B/row through every probe join. At 10¹⁰ vectors that is ~5 TB of
  * list payload shuffled and cached; PQ cuts the per-row payload to
  * [[PqSub]] small-alphabet codes + one norm (logically [[PqSub]] bytes +
  * 8 — a ~32× reduction), which is what lets a planet-scale index hold its
  * lists in executor memory. Queries keep their full vector and score
  * candidates by ASYMMETRIC distance (ADC): dot(query, reconstruction)
  * computed code-wise, then only the ADC top-[[PqRerank]] are re-ranked
  * with exact vectors fetched by id.
  *
  * Determinism (same contract as the k-means quantizers): codebook seeds
  * are the [[PqCodes]] corpus vectors lowest by ([[Sampling.mixHash]],
  * vec_id); [[PqIters]] Lloyd round(s) assign by squared-L2 argmin (ties →
  * lower code id, folded index-order — [[graft.functions.Native.l2sq]])
  * and update by exact order-free decimal means; codes are renumbered
  * densely per subspace in old-id order after each round. Every step is a
  * pure function of the corpus, so the DuckDB twin
  * ([[graft.OraclesExt]].simAnnIvfPq) replays it bit-for-bit.
  */
object Pq {

  import Similarity.{Dim, TopK}

  /** Subspaces: 64 dims → [[PqSub]] blocks of [[PqSubDim]]. */
  val PqSub = 8
  val PqSubDim: Int = Dim / PqSub

  /** Codes per subspace codebook. 16 (4 bits) keeps every code populated at
    * the test SFs; production at 10¹⁰ vectors uses 256 (1 byte) — a
    * constant, not a structural change. */
  val PqCodes = 16

  /** Lloyd rounds refining the seed codebooks — one distributed pass each. */
  val PqIters = 1

  /** ADC candidates re-ranked with exact vectors per query. Sized for the
    * 4-bit test codebooks ([[PqCodes]] = 16): their ADC ranking is coarse
    * enough that a 3×TopK rerank left true neighbors behind — measured
    * sampled-audit mean recall 0.40 vs the hier arm's 0.80 over the
    * IDENTICAL candidate set. 8× doubles that to 0.62 for 80 exact-refine
    * rows per query. Deeper helps further (16× → 0.73) but the bounded
    * top-k insertion cost over every ADC-scored candidate scales with the
    * buffer (measured 2× query cost at 16×) — 8× is the knee; production
    * 256-code books sharpen ADC and need less rerank, not more. */
  val PqRerank: Int = 8 * TopK

  /** Driver-resident codebooks: books(s)(k) = codeword k+1 of subspace s
    * (dense 1-based codes; a code that loses all members in a Lloyd update
    * vanishes and later codes shift down — both engines renumber
    * identically). Bounded: ≤ [[PqSub]]·[[PqCodes]]·[[PqSubDim]] doubles
    * (8 KiB here; 128 KiB at production 256 codes) — plan-literal safe. */
  type Books = Array[Array[Array[Double]]]

  private def sliceCol(v: Column, s: Int, subDim: Int = PqSubDim): Column =
    slice(v, s * subDim + 1, subDim)

  /** 1-based code of subspace `s` for the row's `v` — map-only argmin over
    * the codebook literal, ties → lower code (array_position returns the
    * FIRST index of the minimum; L2 distances are finite, so no NaN
    * ordering hazard). Two linear passes over [[PqCodes]] distances beat
    * the struct array_sort this replaces (no struct allocation, no
    * O(k log k) comparator). */
  private def codeCol(v: Column, s: Int, books: Books,
                      subDim: Int = PqSubDim): Column = {
    val bk = typedlit(books(s).map(_.toSeq).toSeq)
    val sv = sliceCol(v, s, subDim)
    val dists = transform(bk, cw => graft.functions.Native.l2sq(sv, cw))
    array_position(dists, array_min(dists)).cast("int")
  }

  /** Codebook training: seed with the [[PqCodes]] (mixHash, vec_id)-lowest
    * vectors' slices, then [[PqIters]] Lloyd rounds — each ONE distributed
    * pass (map-only assignment against the codebook literal, explode to
    * (s, code, slice), exact decimal-mean update, driver collect bounded at
    * [[PqSub]]·[[PqCodes]] rows). */
  def pqCodebooksLocal(vecs: DataFrame, dim: Int = Dim): Books = {
    val subDim = dim / PqSub
    val seedRows = vecs
      .orderBy(Sampling.mixHash(col("vec_id")), col("vec_id")).limit(PqCodes)
      .select(Sampling.mixHash(col("vec_id")).as("m"), col("vec_id"), col("v"))
      .collect()
      .sortBy(r => (r.getLong(0), r.getLong(1)))
    val seeds: Books = Array.tabulate(PqSub) { s =>
      seedRows.map(r =>
        r.getSeq[Double](2).slice(s * subDim, (s + 1) * subDim).toArray)
    }
    (1 to PqIters).foldLeft(seeds) { (books, _) =>
      val assigned = vecs.select(col("vec_id"),
          explode(array((0 until PqSub).map { s =>
            struct(lit(s).as("s"), codeCol(col("v"), s, books, subDim).as("code"),
              sliceCol(col("v"), s, subDim).as("sv"))
          }: _*)).as("a"))
        .select(col("a.s").as("s"), col("a.code").as("code"), col("a.sv").as("sv"))
      val dims = (0 until subDim).map(i =>
        (sum(col("sv")(i).cast(Num.SumDec)).cast("double") / count(lit(1))).as(s"c$i"))
      val rows = assigned.groupBy("s", "code").agg(dims.head, dims.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1),
          (0 until subDim).map(i => r.getDouble(2 + i)).toArray))
      Array.tabulate(PqSub) { s =>
        rows.filter(_._1 == s).sortBy(_._2).map(_._3)
      }
    }
  }

  /** Codeword squared norms per subspace, folded 0.0-left like the DuckDB
    * twin's list_reduce(list_prepend(0.0, …)). */
  private def norm2(books: Books): Array[Array[Double]] =
    books.map(_.map(cw => cw.foldLeft(0.0)((a, x) => a + x * x)))

  /** The row's [[PqSub]] codes as array<int> — map-only. The subspace
    * width comes from the codebooks themselves, so the same call sites
    * serve the full-space (8-dim) and rp-projected (2-dim) books. */
  def pqCodesCol(v: Column, books: Books): Column = {
    val subDim = books(0)(0).length
    array((0 until PqSub).map(codeCol(v, _, books, subDim)): _*)
  }

  /** ‖reconstruction‖ from a `codes` column: subspaces are disjoint
    * coordinates, so ‖recon‖² = Σ_s ‖codeword_s‖² — an s-ordered left fold
    * over the precomputed norm² literal (both engines fold identically). */
  def rnormCol(codes: Column, books: Books): Column = {
    val n2 = norm2(books)
    sqrt((0 until PqSub).foldLeft(lit(0.0): Column)((acc, s) =>
      acc + element_at(typedlit(n2(s).toSeq), element_at(codes, s + 1))))
  }

  /** Reconstructed vector from a `codes` column (code-wise concat). */
  def reconCol(codes: Column, books: Books): Column =
    concat((0 until PqSub).map(s =>
      element_at(typedlit(books(s).map(_.toSeq).toSeq),
        element_at(codes, s + 1))): _*)

  /** ADC dot product: Σ_s ⟨query slice s, codeword(codes[s])⟩, s-ordered
    * left fold from 0.0, inner 8-dim dots left-to-right. Mathematically
    * equal to dot(query, reconstruction), but bitwise it reproduces the
    * SUBSPACE-WISE association (the flat 64-term fold of dot-over-recon
    * rounds differently in the last ulp) — which is the association the
    * DuckDB twin replays. Computed without materializing the
    * reconstruction: the candidate row needs only its [[PqSub]] codes.
    * One fused codegen loop ([[graft.functions.AdcDotF64]]) with the same
    * fold order as the slice/element_at composition it replaces (which
    * allocated two arrays per candidate×subspace on the audit's
    * ~12M-candidate hot path); NativeSpec pins kernel == composition. */
  def adcDotCol(qv: Column, codes: Column, books: Books): Column = {
    val subDim = books(0)(0).length // width travels with the codebooks
    val flat = new Array[Double](PqSub * PqCodes * subDim)
    for (s <- 0 until PqSub; k <- books(s).indices; i <- 0 until subDim)
      flat((s * PqCodes + k) * subDim + i) = books(s)(k)(i)
    graft.functions.Native.adcDot(qv, codes, flat, PqSub, subDim, PqCodes)
  }

  /** IVF-PQ ANN — the memory-bounded deployment path. Same two-level
    * quantizer, calibration, and probe assignment as
    * [[Similarity.annIvfHier]] (the coarse structure decides WHAT is
    * scanned; PQ only changes what a scanned row COSTS), but the inverted
    * lists carry (cell, id, [[PqSub]] codes, ‖recon‖) instead of the full
    * vector — the ~32× list-payload cut. Candidates score by ADC
    * approximate cosine; the ADC top-[[PqRerank]] per query fetch exact
    * vectors by id (one equi-join — the "refine from the store" read every
    * production PQ system does) for the final exact top-[[TopK]].
    *
    * ADC here computes each sub-dot directly (8×8 mults — same FLOPs as a
    * full dot); the classic per-query LUT (precompute [[PqSub]]·[[PqCodes]]
    * sub-dots, then 8 lookups+adds per candidate) is an executor-side
    * refinement of the same plan. The win this operator banks is
    * plan-level: list bytes through the probe join and the store. */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame =
    // registered entrypoint: session-lifetime pins (the result IS the big
    // frame, so the pins must outlive the call; per-query isolation or
    // session teardown reclaims them — the Pins contract). The tracker is
    // still what holds them: a long-lived caller uses annIvfPqReleasable
    // and releases once the result is materialized, instead of accumulating
    // dead cache per query as the bare persists here used to.
    annIvfPqReleasable(spark, dir)._1

  /** [[annIvfPq]] with a caller-controlled pin lifecycle: every frame this
    * query persists (normalized corpus, hier sub-centroids, scored
    * assignment) is routed through the returned [[Similarity.Pins]] —
    * materialize the result, then `release()`, and nothing stays pinned
    * (ExtSpec asserts the cache ends empty). This is the same reclamation
    * discipline as [[Similarity.recallAudit]] and `VectorIndex.build`,
    * extended to the standalone PQ entrypoint. */
  private[graft] def annIvfPqReleasable(spark: SparkSession,
                                        dir: String): (DataFrame, Similarity.Pins) = {
    val pins = new Similarity.Pins
    val vecs = pins.pin(Similarity.withNorm(Sources.embeddings(spark, dir)))
    val m = Similarity.hierModel(vecs, cacheKey = Some(s"$dir#base"))
    pins.track(m.subs)
    // multi-consumer pin: inverted lists + probes read the same assignment
    val scored = pins.pin(Similarity.hierScored(vecs, m.l1, m.subs, m.nProbe))
    // session-shared codebooks (deterministic per corpus; same key as the
    // audit's PQ arm)
    val books = SessionVal(s"pqbooks#$dir#base")(pqCodebooksLocal(vecs))
    (annIvfPqFrom(vecs, scored, books), pins)
  }

  /** IVF-PQ over the JL-PROJECTED corpus — reduce-then-index-then-compress
    * (r15): [[Similarity.rpVecsOf]]'s 16-dim output fed through the SAME
    * hier coarse quantizer + calibration as [[Similarity.annIvfRp]]
    * (session-shared structure, same `dir#rp` key — the two arms serve one
    * index build) and the SAME PQ encode/ADC/rerank tail as [[annIvfPq]],
    * with [[PqSub]] = 8 subspaces of width 2. The two storage stories
    * COMPOUND: the projection cuts every vector 64→16 doubles before the
    * index ever sees it (flops, shuffle width, Lloyd cost — the
    * `ann_ivf_rp` win), then PQ cuts the inverted-list payload to 8
    * small-alphabet codes + one norm (the ~32× list-byte win) — logically
    * ~4 B of code payload per list row where the full-space lists carried
    * ~520 B: the shape a 10¹⁰-vector index wants. Exact refine runs in the
    * projected space against the projected corpus (the same space the
    * coarse quantizer and ADC rank in), exactly as [[Similarity.annIvfRp]]
    * refines — recall vs full space is the planted fixture's
    * two-regime story, measured there, not here. */
  def annIvfRpPq(spark: SparkSession, dir: String): DataFrame = {
    val pins = new Similarity.Pins
    val vecs = pins.pin(
      Similarity.rpVecsOf(Similarity.withNorm(Sources.embeddings(spark, dir))))
    val m = Similarity.hierModel(vecs, dim = Similarity.RpDims,
      cacheKey = Some(s"$dir#rp"))
    pins.track(m.subs)
    val scored = pins.pin(Similarity.hierScored(vecs, m.l1, m.subs, m.nProbe))
    val books = SessionVal(s"pqbooks#$dir#rp")(
      pqCodebooksLocal(vecs, Similarity.RpDims))
    annIvfPqFrom(vecs, scored, books)
  }

  /** The PQ retrieval arm over a caller-built (and caller-pinned) corpus and
    * hier-scored assignment — the coarse structure is [[Similarity.annIvfHier]]'s;
    * PQ only changes what a scanned list row carries. */
  private[ext] def annIvfPqFrom(vecs: DataFrame, scored: DataFrame,
                                books: Books): DataFrame = {
    val inverted = scored.where(col("_crank") === 1)
      .select(col("cl"), col("vec_id").as("neighbor_id"),
        pqCodesCol(col("v"), books).as("codes"))
      .withColumn("rnorm", rnormCol(col("codes"), books))
    val probes = scored
      .select(col("cl"), col("vec_id").as("query_id"),
        col("v").as("va"), col("norm").as("na"))
    val cand = probes.join(inverted, "cl")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc",
        r(adcDotCol(col("va"), col("codes"), books) / (col("na") * col("rnorm")), 6))
    val topr = cand.groupBy("query_id")
      .agg(first(col("va")).as("va"), first(col("na")).as("na"),
        graft.functions.TopKByScore.topK(col("adc"), col("neighbor_id"), PqRerank).as("_top"))
      .select(col("query_id"), col("va"), col("na"), explode(col("_top")).as("_t"))
      .select(col("query_id"), col("va"), col("na"),
        col("_t").getField("id").as("neighbor_id"))
    val pairs = topr.join(vecs.select(col("vec_id").as("neighbor_id"),
        col("v").as("vb"), col("norm").as("nb")), "neighbor_id")
      .withColumn("cosine",
        r(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
    Similarity.topK(pairs, TopK)
  }

  /** Per-vector PQ reconstruction fidelity — the PQ twin of
    * [[Similarity.quantizationError]]: max-abs reconstruction error and
    * cosine(original, reconstruction). Map-only against the codebook
    * literal; this is the number that says what the 32× payload cut costs
    * in geometry, next to the recall audit that says what it costs in
    * retrieval. */
  def pqError(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Similarity.withNorm(Sources.embeddings(spark, dir))
    val books = pqCodebooksLocal(vecs)
    vecs
      .withColumn("codes", pqCodesCol(col("v"), books))
      .withColumn("rv", reconCol(col("codes"), books))
      .withColumn("rnorm", rnormCol(col("codes"), books))
      .select(
        col("vec_id"),
        r(array_max(zip_with(col("v"), col("rv"), (a, b) => abs(a - b))), 6)
          .as("max_abs_err"),
        r(Similarity.dot(col("v"), col("rv")) / (col("norm") * col("rnorm")), 6)
          .as("cosine_orig_recon"))
  }
}
