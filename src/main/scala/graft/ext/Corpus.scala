package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Sources

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
      .withColumn("seq_id", floor(col("start_offset") / SeqLen).cast("long"))
      .withColumn("offset_in_seq", col("start_offset") % SeqLen)
      .withColumn("straddles_boundary",
        col("offset_in_seq") + col("n_bpe_tokens") > SeqLen)
  }

  val QualityThreshold = 0.4

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
