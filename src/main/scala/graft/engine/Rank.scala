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
  *     key ranges per partition; equal keys always co-located) and persist it.
  *  2. Count rows per partition — at most `spark.sql.shuffle.partitions`
  *     numbers — collect them to the driver and prefix-sum into per-partition
  *     global offsets (control-plane metadata, not data). This pass
  *     materializes the persisted frame, which the scoring pass then reads.
  *  3. Broadcast-join the offsets back: `global = local + offset`.
  *
  * Local positions come two ways:
  *  - NTILE (sort key is unique by contract): rows are sorted WITHIN each
  *    range partition and the local row number is read off
  *    `monotonically_increasing_id` (partition id in the high 31 bits, row
  *    index in the low 33) — zero additional shuffles after the range
  *    exchange.
  *  - RANK / PERCENT_RANK (ties allowed): a window partitioned by the range
  *    partition id — one hash exchange, but every partition sorts only its
  *    own slice.
  *
  * Why the offsets are COLLECTED rather than computed in-plan: an in-plan
  * prefix-sum must reference the ranged frame from two branches (scoring +
  * counting), and chaining ranks then grows the logical tree 3^levels — at
  * five nested ranks the driver analyzed a 300k-line plan and spent 12 s
  * planning 0.6 s of executor work. A driver-side collect of ≤32 longs per
  * level keeps the final plan LINEAR in the number of ranks. The cost is one
  * small job per rank at query construction (it doubles as the cache
  * materialization for the scoring pass).
  *
  * Bit-identity arguments:
  *  - RANK: rank(x) = #rows strictly before x's tie group + 1. Range
  *    partitioning puts all of a tie group in one partition, so
  *    local_rank + offset(partition) is exactly the global rank.
  *  - PERCENT_RANK = (rank-1)/(N-1) (0.0 when N≤1) — same formula Spark's
  *    `PercentRank` evaluates, on the same doubles.
  *  - NTILE(n): with a unique tiebreaker the ordering is total, so the
  *    bucket is a pure function of (row_number, N) using Spark's `NTile`
  *    bucket math: the first N%n buckets take ⌈N/n⌉ rows, the rest ⌊N/n⌋.
  *  - `floor(a / b)` on longs goes through double division — exact below
  *    2^53 rows, far beyond any frame, and it sidesteps ANSI integral
  *    division-by-zero hazards (unreached branches stay unevaluated).
  */
object Rank {

  private val MidMask = (1L << 33) - 1 // monotonically_increasing_id low bits

  private case class Ranged(df: DataFrame, total: Long)

  /** Range-partition on `sortCols`, persist, collect per-partition counts,
    * and attach `_rp` + broadcast `_off` (rows in partitions before this
    * one); with `withLocalIdx` also `_mid` carrying the in-partition row
    * index of the sorted order. */
  private def withPositions(df: DataFrame, sortCols: Seq[Column],
                            withLocalIdx: Boolean): Ranged = {
    val spark = df.sparkSession
    val p = math.max(1, spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val base = df.repartitionByRange(p, sortCols: _*)
    val ranged = (if (withLocalIdx)
      base.sortWithinPartitions(sortCols: _*)
        .withColumn("_mid", monotonically_increasing_id())
        .withColumn("_rp", shiftright(col("_mid"), 33).cast("int"))
    else base.withColumn("_rp", spark_partition_id()))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = ranged.groupBy(col("_rp")).agg(count(lit(1)).as("_cnt"))
      .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
    var acc = 0L
    val offs = (0 until p).map { pid =>
      val o = acc; acc += counts.getOrElse(pid, 0L); (pid, o)
    }
    import spark.implicits._
    Ranged(ranged.join(broadcast(offs.toDF("_rp", "_off")), Seq("_rp")), acc)
  }

  private def done(df: DataFrame, out: String, c: Column): DataFrame =
    df.withColumn(out, c).drop("_rp", "_off", "_mid")

  /** NTILE(`n`) over the global ordering given by `sortCols` — which MUST
    * include a unique tiebreaker (same determinism rule as SURVEY.md §7.4).
    * Shuffle-free after the range exchange: the local row number is the
    * in-partition index of the sorted order. */
  def globalNtile(df: DataFrame, n: Int, out: String, sortCols: Column*): DataFrame = {
    val Ranged(r, total) = withPositions(df, sortCols, withLocalIdx = true)
    val rn = col("_mid").bitwiseAND(MidMask) + 1 + col("_off")
    val small = total / n
    val pad = total % n // Spark NTile: first N%n buckets get one extra row
    val big = small + 1
    val threshold = pad * big
    val bucket = when(rn <= threshold, floor((rn - 1) / lit(big.toDouble)) + 1)
      .otherwise(floor((rn - threshold - 1) / math.max(small, 1L).toDouble) + 1 + pad)
    done(r, out, bucket.cast("int"))
  }

  private def localRank(sortCols: Seq[Column]): Column =
    rank().over(Window.partitionBy("_rp").orderBy(sortCols: _*)).cast("long")

  /** Global RANK() (gaps on ties) over `sortCols`. */
  def globalRank(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    val Ranged(r, _) = withPositions(df, sortCols, withLocalIdx = false)
    done(r, out, (localRank(sortCols) + col("_off")).cast("int"))
  }

  /** Global PERCENT_RANK() over `sortCols`. */
  def globalPercentRank(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    val Ranged(r, total) = withPositions(df, sortCols, withLocalIdx = false)
    val rk = localRank(sortCols) + col("_off")
    val pr = if (total <= 1L) lit(0.0)
    else (rk - 1).cast("double") / lit((total - 1).toDouble)
    done(r, out, pr)
  }
}
