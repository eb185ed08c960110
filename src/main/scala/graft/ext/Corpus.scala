package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
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
