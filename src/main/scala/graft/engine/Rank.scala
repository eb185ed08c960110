package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed replacements for global (single-partition) ranking windows.
  *
  * A bare `Window.orderBy(...)` without `partitionBy` funnels every row
  * through ONE task — fine at customer grain on sf0.1, a straggler wall at
  * 100 TB. These helpers compute bit-identical NTILE / RANK / PERCENT_RANK
  * with a classic two-pass design instead:
  *
  *  1. Range-partition the frame on the sort key (contiguous, totally-ordered
  *     key ranges per partition; equal keys always co-located).
  *  2. Count rows per range partition — at most `spark.sql.shuffle.partitions`
  *     numbers — collect them to the driver and prefix-sum into per-partition
  *     global offsets (control-plane metadata, not data).
  *  3. Broadcast-join the offsets back and run the window function WITHIN
  *     each range partition: `global = local + offset`. Every partition sorts
  *     only its own slice, in parallel.
  *
  * The ranged frame is persisted (memory-and-disk) so the count pass and the
  * main query read one materialization — this also guarantees the partition
  * ids seen by the count job and the scoring job are the same ones.
  *
  * Bit-identity arguments:
  *  - RANK: rank(x) = #rows strictly before x's tie group + 1. Range
  *    partitioning puts all of a tie group in one partition, so
  *    local_rank + offset(partition) is exactly the global rank.
  *  - PERCENT_RANK = (rank-1)/(N-1) (0.0 when N<=1) — same formula Spark's
  *    `PercentRank` evaluates, on the same doubles.
  *  - NTILE(n): with a unique tiebreaker in the sort key the ordering is
  *    total, so the bucket is a pure function of (row_number, N) using
  *    Spark's `NTile` bucket math: the first N%n buckets take ⌈N/n⌉ rows,
  *    the rest ⌊N/n⌋.
  */
object Rank {

  private case class Ranged(df: DataFrame, total: Long)

  private def ranged(df: DataFrame, sortCols: Seq[Column]): Ranged = {
    val spark = df.sparkSession
    val p = math.max(1, spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val r = df.repartitionByRange(p, sortCols: _*)
      .withColumn("_rp", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // pass 1: per-partition row counts -> global offsets (<= p rows collected)
    val counts = r.groupBy(col("_rp")).agg(count(lit(1)).as("_cnt"))
      .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    var acc = 0L
    val offs = (0 until p).map { pid =>
      val o = acc; acc += counts.getOrElse(pid, 0L); (pid, o)
    }
    import spark.implicits._
    Ranged(r.join(broadcast(offs.toDF("_rp", "_off")), Seq("_rp")), acc)
  }

  private def local(sortCols: Seq[Column]) =
    Window.partitionBy("_rp").orderBy(sortCols: _*)

  /** NTILE(`n`) over the global ordering given by `sortCols` — which MUST
    * include a unique tiebreaker (same determinism rule as SURVEY.md §7.4). */
  def globalNtile(df: DataFrame, n: Int, out: String, sortCols: Column*): DataFrame = {
    val Ranged(r, total) = ranged(df, sortCols)
    val rn = row_number().over(local(sortCols)).cast("long") + col("_off")
    val smallBucket = total / n
    val padded = total % n // Spark NTile: first N%n buckets take one extra row
    val bigBucket = smallBucket + 1
    val threshold = padded * bigBucket
    // floor(long/long) via double is exact below 2^53 rows — far beyond any
    // realistic frame; avoids ANSI integral-division pitfalls
    val bucket = when(rn <= threshold, floor((rn - 1) / lit(bigBucket.toDouble)) + 1)
      .otherwise(floor((rn - lit(threshold) - 1) / lit(math.max(smallBucket, 1L).toDouble))
        + 1 + padded)
    r.withColumn(out, bucket.cast("int")).drop("_rp", "_off")
  }

  /** Global RANK() (gaps on ties) over `sortCols`. */
  def globalRank(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    val Ranged(r, _) = ranged(df, sortCols)
    val rk = rank().over(local(sortCols)).cast("long") + col("_off")
    r.withColumn(out, rk.cast("int")).drop("_rp", "_off")
  }

  /** Global PERCENT_RANK() over `sortCols`. */
  def globalPercentRank(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    val Ranged(r, total) = ranged(df, sortCols)
    val rk = rank().over(local(sortCols)).cast("long") + col("_off")
    val pr = if (total <= 1L) lit(0.0)
    else (rk - 1).cast("double") / lit((total - 1).toDouble)
    r.withColumn(out, pr).drop("_rp", "_off")
  }
}
