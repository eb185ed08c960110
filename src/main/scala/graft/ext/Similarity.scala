package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Num, Sources}
import Num._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>[64], label).
  *
  *  - brute-force top-k cosine: the exact baseline — crossJoin → cosine →
  *    per-query row_number. O(n²·d); correct at any SF but only *runs* at
  *    test SF. It exists to define ground truth for the ANN's recall.
  *  - sign-random-projection LSH (SRP) ANN: [[LshPlanes]] deterministic ±1
  *    hyperplanes → [[LshBits]]-bit signature → bucket equi-join → exact
  *    cosine on candidates only → per-query top-k. At 100 TB the bucket join
  *    is one hash shuffle on a dense int key; expected bucket size n/2^bits
  *    keeps the candidate verify linear-ish. Recall is tunable via
  *    bits (fewer bits = bigger buckets = higher recall, more work) or by
  *    OR-ing multiple signature tables (not needed at test SF — see
  *    SimilaritySpec's measured recall).
  *
  * Determinism: all float math is promoted to double (exact) and folded in
  * index order, so Spark and DuckDB run the identical IEEE op sequence; the
  * hyperplane component for (plane j, dim i) is sign-of-hash of j·64+i,
  * computable inline in both engines — no literal matrices shipped around.
  */
object Similarity {

  val Dim = 64
  val TopK = 5
  val LshBits = 8                   // 2⁸ buckets over 500-2000 vecs at test SF
  val HashA = 48271L                // Lehmer multiplier, same family as Dedup.Perms
  val HashP = 2147483647L           // 2³¹−1

  /** Embedding as array<double> plus its L2 norm (folded in index order). */
  def withNorm(df: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    df.select(col("vec_id"), v.as("v"))
      .withColumn("norm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
  }

  /** Dot product in index order: fold of zip_with products. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** ±1 hyperplane component for (plane, dim0): sign of a Lehmer hash of the
    * flat index. `(idx+1)·48271 mod P` is a full-period permutation of
    * 1..P−1, so parity is an unbiased coin. */
  def planeComponent(plane: Int, dim0: Column): Column = {
    val idx = lit(plane.toLong * Dim) + dim0
    when(((idx + 1) * HashA % HashP) % 2 === 0, 1.0).otherwise(-1.0)
  }

  /** SRP signature: bit j = [⟨v, plane_j⟩ ≥ 0], packed into a Long. */
  def srpSignature(v: Column): Column =
    (0 until LshBits).map { j =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(Dim - 1)),
          (x, i) => x * planeComponent(j, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def cosinePairs(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", r(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))

  private def topK(pairs: DataFrame, k: Int): DataFrame =
    pairs
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")

  /** Exact top-[[TopK]] cosine neighbors for every vector (the O(n²) ground
    * truth; ties broken by neighbor id so results are total-ordered). */
  def knnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Sources.embeddings(spark, dir)).cache()
    val q = e.select(col("vec_id").as("query_id"), col("v").as("va"), col("norm").as("na"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("v").as("vb"), col("norm").as("nb"))
    topK(cosinePairs(q, n), TopK)
  }

  /** LSH-bucketed approximate top-[[TopK]]: candidates share the full
    * [[LshBits]]-bit SRP signature; exact cosine + rank within candidates.
    * Same output schema as [[knnBruteForce]] — recall measured in its spec. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Sources.embeddings(spark, dir))
      .withColumn("sig", srpSignature(col("v"))).cache()
    val q = e.select(col("sig"), col("vec_id").as("query_id"), col("v").as("va"), col("norm").as("na"))
    val n = e.select(col("sig"), col("vec_id").as("neighbor_id"), col("v").as("vb"), col("norm").as("nb"))
    val pairs = q.join(n, "sig").where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", r(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
    topK(pairs, TopK)
  }
}
