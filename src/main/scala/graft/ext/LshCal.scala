package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Num, Sources}
import Num._

/** Measured per-corpus calibration for SRP-LSH — the policy `sim_ann_lsh`
  * lacked (its IVF siblings got `nProbeFromThresh` in r6).
  *
  * SRP-LSH has two knobs: bits per signature table (bucket granularity) and
  * table count (OR-amplification). Their correct values depend on the
  * corpus' neighbor-angle distribution, which no formula in n predicts —
  * so, exactly like the IVF probe policy, this MEASURES: on the
  * deterministic [[Similarity.CalQueries]]-query sample it evaluates a
  * fixed (bits × tables) grid and reports, per config,
  *
  *  - measured pair recall: the fraction of the sample's exact top-K pairs
  *    whose two signatures collide in ≥1 of the config's tables. The same
  *    exactness device as `nProbeFromThresh` applies: under the total
  *    (cosine desc, id asc) order, anything displacing a true top-K
  *    neighbor is itself a true top-K neighbor, so pair-collision recall
  *    IS result recall.
  *  - estimated verify cost: expected candidates per query, from a
  *    (table × signature) corpus histogram — a union bound (Σ over tables
  *    of the query's bucket size, self-collisions removed), so it
  *    overstates cost when a pair collides in several tables; an
  *    overestimate is the safe direction for a feasibility gate.
  *
  * A config is FEASIBLE when recall ≥ [[Similarity.RecallTargetPct]] and
  * the candidate fraction ≤ [[CostCapPct]] of the corpus (beyond that the
  * "approximate" search approaches brute force and the structure pays for
  * nothing). CHOSEN = the cheapest feasible config (ties → fewer bits,
  * fewer tables). An all-infeasible grid is itself the measurement that
  * SRP-LSH cannot serve this corpus' angle regime at the target — the
  * fixture embeddings' true neighbors sit at cosine ≈ 0.3 (per-bit
  * collision ≈ 0.60 vs 0.50 for random pairs: nearly indistinguishable),
  * which is precisely the regime where SRP needs infeasible table counts.
  * On a near-dup retrieval corpus (cosine ≥ 0.9, per-bit ≈ 0.90) the same
  * grid admits high-bits/low-cost configs; rerunning THIS query is the
  * retune recipe.
  *
  * Scale shape: one map-only pass computes [[TablesMax]] signatures per
  * vector (128 codegen dot products); the exact arm is CalQueries·n pairs
  * through the bounded top-K aggregate (the documented sampled-exact-arm
  * cost, linear in n); the histogram is ≤ TablesMax·2^[[BitsMax]] rows;
  * everything downstream is grid-sized control plane. No all-pairs work
  * anywhere, so the CALIBRATION runs at any corpus size even when the
  * config it would pick does not.
  *
  * Reference anchor: extends the similarity/dedup family of
  * `data_quality_checks.py`-style gates to the vector side; the reference
  * has no ANN surface, so this is engine-native capability.
  */
object LshCal {

  /** Full signature resolution: bits computed per table (config bits ≤ this
    * are PREFIXES — config (b, L) masks the low b bits of the first L
    * tables' full signatures, so one signature pass serves the whole grid). */
  val BitsMax = 8

  /** Tables computed (max OR-amplification evaluated). */
  val TablesMax = 16

  /** The evaluated grid. */
  val GridBits: Seq[Int] = Seq(2, 3, 4, 6, 8)
  val GridTables: Seq[Int] = Seq(4, 8, 16)

  /** Feasibility cap on estimated candidate fraction (percent of corpus
    * verified per query). Past this, LSH is paying near-brute-force cost
    * for approximate results. */
  val CostCapPct = 25

  /** Calibration planes are laid out t·[[BitsMax]]+j — a denser slice of
    * the same deterministic [[Similarity.planeComponent]] family the
    * production `annLsh` draws from. */
  private def planeVec(t: Int, j: Int): Seq[Double] =
    (0 until Similarity.Dim).map(i =>
      Similarity.planeComponent(t * BitsMax + j, i))

  /** Full [[BitsMax]]-bit signature for table `t`: one codegen dot product
    * per bit against a ±1 literal plane, packed low-bit-first so b-bit
    * configs are `sig & ((1<<b)-1)`. */
  private def sigFull(v: Column, t: Int): Column =
    (0 until BitsMax).map { j =>
      when(Similarity.dot(v, typedLit(planeVec(t, j))) >= 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** The calibration grid over the embeddings table: one row per (bits,
    * tables) config with measured sample recall, union-bound cost estimate,
    * and the feasibility/choice policy applied. */
  def calibrationGrid(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Similarity.withNorm(Sources.embeddings(spark, dir))
    // the registered grid reads the session's shared calibration ground
    // truth (OPTIMIZATION r15): the same CalQueries-sample exact pairs the
    // hier calibrations consume — one m·n exact pass per corpus per
    // session instead of one per calibration consumer
    calibrationGridFrom(spark, vecs, preExact = Some(
      Similarity.exactSampledShared(vecs, s"$dir#base#${Similarity.Dim}")))
  }

  private[ext] def calibrationGridFrom(spark: SparkSession,
                                       vecs: DataFrame,
                                       preExact: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val pins = new Similarity.Pins
    val sample = Similarity.querySample(vecs, Similarity.CalQueries)
    val exact = preExact.getOrElse(Similarity.exactSampled(vecs, sample))
    // one signature pass serves recall, histogram, and query lookups
    val sigs = pins.pin(vecs.select(col("vec_id"),
      array((0 until TablesMax).map(t => sigFull(col("v"), t)): _*).as("sigs")))
    val grid = broadcast(
      GridBits.flatMap(b => GridTables.map(l => (b, l, (1L << b) - 1)))
        .toDF("bits", "tables", "mask"))

    val qsigs = sample.select(col("query_id"))
      .join(sigs.withColumnRenamed("vec_id", "query_id"), "query_id")
      .withColumnRenamed("sigs", "qsigs")

    // ---- measured recall: exact pairs × grid, ∃ table < L with masked equality
    val pairSigs = exact
      .join(qsigs, "query_id")
      .join(sigs.select(col("vec_id").as("neighbor_id"), col("sigs").as("nsigs")),
        "neighbor_id")
    val hit = exists(
      zip_with(slice(col("qsigs"), lit(1), col("tables")),
        slice(col("nsigs"), lit(1), col("tables")),
        (a, b) => a.bitwiseAND(col("mask")) === b.bitwiseAND(col("mask"))),
      identity)
    val rec = pairSigs.crossJoin(grid)
      .groupBy("bits", "tables")
      .agg(sum(when(hit, 1L).otherwise(0L)).as("recalled"),
        count(lit(1)).as("exact_pairs"))

    // ---- union-bound cost: (table, full-sig) corpus histogram, re-binned
    // per config by mask, probed with each sample query's masked signature
    val hist = sigs.select(posexplode(col("sigs")).as(Seq("t", "sig")))
      .groupBy("t", "sig").agg(count(lit(1)).as("cnt"))
    val histG = hist.crossJoin(grid)
      .where(col("t") < col("tables"))
      .groupBy(col("bits"), col("tables"), col("t"),
        col("sig").bitwiseAND(col("mask")).as("msig"))
      .agg(sum("cnt").as("cnt"))
    val qb = qsigs.select(posexplode(col("qsigs")).as(Seq("t", "sig")))
      .crossJoin(grid)
      .where(col("t") < col("tables"))
      .select(col("bits"), col("tables"), col("t"),
        col("sig").bitwiseAND(col("mask")).as("msig"))
    val cost = qb.join(histG, Seq("bits", "tables", "t", "msig"))
      .groupBy("bits", "tables").agg(sum("cnt").as("cand_incl_self"))

    val nAll = broadcast(sigs.agg(count(lit(1)).as("n_corpus")))
    val nQ = broadcast(qsigs.agg(count(lit(1)).as("n_queries")))

    val out = rec.join(cost, Seq("bits", "tables"), "left")
      .crossJoin(nAll).crossJoin(nQ)
      // every query self-collides once per table probed — remove
      .withColumn("est_candidates",
        greatest(coalesce(col("cand_incl_self"), lit(0L))
          - col("n_queries") * col("tables"), lit(0L)))
      .withColumn("recall_pct",
        r(lit(100.0) * col("recalled") / col("exact_pairs"), 2))
      .withColumn("cand_frac_pct",
        r(lit(100.0) * col("est_candidates")
          / (col("n_queries") * (col("n_corpus") - 1)), 2))
      .withColumn("feasible",
        col("recall_pct") >= Similarity.RecallTargetPct
          && col("cand_frac_pct") <= CostCapPct)
      // grid-sized control plane: the unpartitioned window sorts 15 rows
      .withColumn("_rk", row_number().over(Window.orderBy(
        col("feasible").desc, col("est_candidates"), col("bits"), col("tables"))))
      .withColumn("chosen", col("feasible") && col("_rk") === 1)
      .select("bits", "tables", "recalled", "exact_pairs", "recall_pct",
        "est_candidates", "cand_frac_pct", "feasible", "chosen")
    Similarity.localized(spark, out.orderBy("bits", "tables"), pins)
  }
}
