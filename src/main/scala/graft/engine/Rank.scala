package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacements for global (single-partition) ranking windows.
  *
  * A bare `Window.orderBy(...)` without `partitionBy` funnels every row
  * through ONE task — fine at customer grain on sf0.1, a straggler wall at
  * 100 TB. These helpers compute bit-identical NTILE / RANK / PERCENT_RANK
  * with a classic two-pass design instead:
  *
  *  1. Range-partition the frame on the sort key (contiguous, totally-ordered
  *     key ranges per partition; equal keys always co-located) and pin it
  *     behind a lazy `localCheckpoint` barrier. The barrier is a plan LEAF,
  *     so the counting and scoring branches below both reference the SAME
  *     materialized partitions — the upstream plan executes exactly once per
  *     action, and chained ranks grow the logical plan linearly (each level's
  *     input is the previous level's leaf, not its whole subtree).
  *  2. Count rows per range partition — at most `spark.sql.shuffle.partitions`
  *     rows of control-plane metadata — and turn the counts into
  *     per-partition global offsets (rows in partitions before this one) plus
  *     the grand total with one tiny p×p cross join + hash aggregate. No
  *     driver collect, no global single-partition aggregate: the whole rank
  *     is LAZY, so merely composing a query that embeds a rank costs nothing
  *     until an action runs.
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
  * Why `localCheckpoint(eager = false)` and not `persist`: a persisted frame
  * still embeds its full upstream subtree in the logical plan, so a counting
  * branch + a scoring branch double the tree per rank level (3^levels once
  * offsets join back — at five nested ranks the driver analyzed a 300k-line
  * plan and spent 12 s planning 0.6 s of executor work). An earlier revision
  * collected the ≤32 partition counts to the driver at query CONSTRUCTION
  * time to keep the plan linear — correct, but it materialized the whole
  * upstream pipeline (twice: range-sampling pass + counting pass) the moment
  * a query was merely composed, which made every query that touches a
  * rank-bearing silver view pay seconds of eager work (BENCH_r03:
  * gold_supplier_performance 21 s for a 100-row rank). The lazy checkpoint
  * keeps the plan linear AND defers all work to execution. On a multi-tenant
  * cluster with executor decommissioning you would swap this leaf for a
  * reliable checkpoint or a persisted table; the algorithm is unchanged.
  *
  * Determinism: the checkpoint pins the range partitioner's sampled
  * boundaries for the lifetime of the returned DataFrame, so repeated
  * actions on it see identical partition assignments (the pre-checkpoint
  * design re-sampled per action and could disagree with offsets computed
  * earlier).
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
  *  - `floor(a / b)` on longs goes through Spark's fractional division
  *    (double) — exact below 2^53 rows, far beyond any frame, and it
  *    sidesteps ANSI integral division-by-zero hazards (unreached branches
  *    stay unevaluated).
  */
object Rank {

  private val MidMask = (1L << 33) - 1 // monotonically_increasing_id low bits

  /** Range-partition on `sortCols`, pin behind a lazy checkpoint leaf, and
    * attach `_rp` + broadcast `_off` (rows in partitions before this one) +
    * `_tot` (total rows); with `withLocalIdx` also `_mid` carrying the
    * in-partition row index of the sorted order. Fully lazy. */
  private def withPositions(df: DataFrame, sortCols: Seq[Column],
                            withLocalIdx: Boolean): DataFrame = {
    val spark = df.sparkSession
    val p = math.max(1, spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    // Pin the INPUT too: a range exchange runs a boundary-sampling pass over
    // its child before the shuffle itself, so an unpinned input executes the
    // entire upstream pipeline twice per rank (measured: 6.4 s -> ~4 s on
    // the supplier-performance rank at sf0.1). The sampling pass populates
    // the cache; the shuffle write then reads it. Storage is reclaimed with
    // the session cache (or an explicit clearCache); at 100 TB this is one
    // extra materialization of the ranked frame — cheaper than recomputing
    // its full join/agg lineage.
    val base = df.persist().repartitionByRange(p, sortCols: _*)
    val ranged = (if (withLocalIdx)
      base.sortWithinPartitions(sortCols: _*)
        .withColumn("_mid", monotonically_increasing_id())
        .withColumn("_rp", shiftright(col("_mid"), 33).cast("int"))
    else base.withColumn("_rp", spark_partition_id()))
      .localCheckpoint(false) // lazy leaf: shared by the branches below
    // offsets + total = prefix sums over the per-partition counts — CONTROL
    // PLANE, not data: ≤ p rows where p is a config constant (≤32 here, a
    // few thousand on a real cluster). Coalescing to one partition makes
    // CoalesceExec's output partitioning SinglePartition already, so the
    // running-sum window plans WITHOUT an `Exchange SinglePartition` (the
    // 100 TB straggler shape this module exists to avoid never appears, and
    // no extra broadcast/cartesian job is spent on 32 rows of metadata).
    val counts = ranged.groupBy(col("_rp")).agg(count(lit(1)).as("_cnt")).coalesce(1)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wBefore = Window.orderBy(col("_rp"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts.select(col("_rp"),
      coalesce(sum(col("_cnt")).over(wBefore), lit(0L)).as("_off"),
      sum(col("_cnt")).over(wAll).as("_tot"))
    ranged.join(broadcast(offs), Seq("_rp"))
  }

  private def done(df: DataFrame, out: String, c: Column): DataFrame =
    df.withColumn(out, c).drop("_rp", "_off", "_tot", "_mid")

  /** NTILE(`n`) over the global ordering given by `sortCols` — which MUST
    * include a unique tiebreaker (same determinism rule as SURVEY.md §7.4).
    * Shuffle-free after the range exchange: the local row number is the
    * in-partition index of the sorted order. */
  def globalNtile(df: DataFrame, n: Int, out: String, sortCols: Column*): DataFrame = {
    val r = withPositions(df, sortCols, withLocalIdx = true)
    val rn = col("_mid").bitwiseAND(MidMask) + 1 + col("_off")
    // Spark NTile bucket math, in-plan: first N%n buckets get ⌈N/n⌉ rows
    val small = floor(col("_tot") / n) // fractional division → exact < 2^53
    val pad = col("_tot") % n
    val big = small + 1
    val threshold = pad * big
    val bucket = when(rn <= threshold, floor((rn - 1) / big) + 1)
      .otherwise(floor((rn - threshold - 1) / greatest(small, lit(1L))) + 1 + pad)
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
    val pr = when(col("_tot") <= 1L, lit(0.0))
      .otherwise((rk - 1).cast("double") / (col("_tot") - 1).cast("double"))
    done(r, out, pr)
  }
}
