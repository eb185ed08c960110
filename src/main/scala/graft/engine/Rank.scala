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
  * with a two-pass design that lives ENTIRELY in one Catalyst plan:
  *
  *  1. Range-partition the frame on the sort key (contiguous, totally-ordered
  *     key ranges per partition; equal keys always co-located).
  *  2. Aggregate rows-per-partition (≤ `spark.sql.shuffle.partitions` rows),
  *     then turn those counts into per-partition global offsets and the grand
  *     total with a tiny broadcast cross-join aggregate — control-plane
  *     arithmetic expressed as a plan, not a driver collect, so construction
  *     stays lazy and no single-partition exchange appears anywhere.
  *  3. Broadcast-join the (offset, total) row back: `global = local + offset`.
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
  * The ranged frame feeds two branches (counts + scoring); exchange reuse
  * cannot dedupe them (column pruning narrows the counts branch below its
  * exchange, so the two exchanges differ structurally), so the frame is
  * persisted — cache substitution matches by plan identity before pruning
  * and both branches read one materialization. Persisting is still lazy:
  * the cache populates at first action, not at query construction.
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

  /** Range-partition on `sortCols` and attach `_rp` (partition id), `_off`
    * (rows in partitions before this one), `_total` (grand total); with
    * `withLocalIdx` also `_mid` carrying the in-partition row index of the
    * sorted order. */
  private def withPositions(df: DataFrame, sortCols: Seq[Column],
                            withLocalIdx: Boolean): DataFrame = {
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
    // prefix-sum over ≤p count rows WITHOUT a single-partition window: a
    // broadcast cross join (≤ p² tiny rows) re-aggregated per partition id
    val offtot = counts
      .crossJoin(broadcast(counts.select(col("_rp").as("_rp2"), col("_cnt").as("_cnt2"))))
      .groupBy(col("_rp"))
      .agg(
        sum(when(col("_rp2") < col("_rp"), col("_cnt2")).otherwise(0L)).as("_off"),
        sum(col("_cnt2")).as("_total"))
    ranged.join(broadcast(offtot), Seq("_rp"))
  }

  private def done(df: DataFrame, out: String, c: Column): DataFrame =
    df.withColumn(out, c).drop("_rp", "_off", "_total", "_mid")

  /** NTILE(`n`) over the global ordering given by `sortCols` — which MUST
    * include a unique tiebreaker (same determinism rule as SURVEY.md §7.4).
    * Shuffle-free after the range exchange: the local row number is the
    * in-partition index of the sorted order. */
  def globalNtile(df: DataFrame, n: Int, out: String, sortCols: Column*): DataFrame = {
    val r = withPositions(df, sortCols, withLocalIdx = true)
    val rn = col("_mid").bitwiseAND(MidMask) + 1 + col("_off")
    val small = floor(col("_total") / n).cast("long")
    val pad = col("_total") % n // Spark NTile: first N%n buckets get one extra
    val big = small + 1
    val threshold = pad * big
    val bucket = when(rn <= threshold, floor((rn - 1) / big) + 1)
      .otherwise(pad + floor((rn - threshold - 1) / greatest(small, lit(1L))) + 1)
    done(r, out, bucket.cast("int"))
  }

  private def localRank(sortCols: Seq[Column]): Column =
    rank().over(Window.partitionBy("_rp").orderBy(sortCols: _*)).cast("long")

  /** Global RANK() (gaps on ties) over `sortCols`. */
  def globalRank(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    val r = withPositions(df, sortCols, withLocalIdx = false)
    done(r, out, (localRank(sortCols) + col("_off")).cast("int"))
  }

  /** Global PERCENT_RANK() over `sortCols`. */
  def globalPercentRank(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    val r = withPositions(df, sortCols, withLocalIdx = false)
    val rk = localRank(sortCols) + col("_off")
    val pr = when(col("_total") > 1,
      (rk - 1).cast("double") / (col("_total") - 1).cast("double"))
      .otherwise(lit(0.0))
    done(r, out, pr)
  }
}
