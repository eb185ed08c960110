package graft.engine

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.GlobalRank

/** Distributed replacements for global (single-partition) ranking windows.
  *
  * A bare `Window.orderBy(...)` without `partitionBy` funnels every row
  * through ONE task — fine at customer grain on sf0.1, a straggler wall at
  * 100 TB. These helpers compute bit-identical NTILE / RANK / PERCENT_RANK
  * on top of [[graft.plans.GlobalOrderedRank]], a custom Catalyst operator
  * that appends (global row number, global rank, total count) columns with:
  *
  *  - ZERO construction-time work (it is planned like any relational node;
  *    earlier revisions here — eager offset collection, then lazy
  *    localCheckpoint leaves — both ran real Spark jobs the moment a ranked
  *    view was merely composed, taxing every downstream query);
  *  - one range exchange + per-partition sorts at execution (the distributed
  *    ORDER BY shape — no single-task sort anywhere);
  *  - automatic whole-operator pruning ([[graft.plans.PruneGlobalRank]]):
  *    a `COUNT(*)` or freshness probe over a ranked silver view never
  *    executes the rank at all.
  *
  * Bit-identity arguments:
  *  - RANK: rank(x) = #rows strictly before x's tie group + 1. Range
  *    partitioning puts all of a tie group in one partition, so the
  *    tie-group head's global row number is exactly the global rank.
  *  - PERCENT_RANK = (rank-1)/(N-1) (0.0 when N≤1) — same formula Spark's
  *    `PercentRank` evaluates, on the same doubles.
  *  - NTILE(n): with a unique tiebreaker the ordering is total, so the
  *    bucket is a pure function of (row_number, N) using Spark's `NTile`
  *    bucket math: the first N%n buckets take ⌈N/n⌉ rows, the rest ⌊N/n⌋.
  *  - Bucket quotients are pure BIGINT division ([[Num.idiv]]) — exact at
  *    ANY row count (the old floor(a / b) double path was exact only below
  *    2^53 rows); the divisor of the otherwise-branch is greatest(small, 1)
  *    so ANSI integral division-by-zero is structurally unreachable.
  */
object Rank {

  private val seq = new AtomicLong() // unique helper-column names per level

  private def positioned(df: DataFrame, sortCols: Seq[Column])
      : (DataFrame, Column, Column, Column, String => DataFrame => DataFrame) = {
    val id = seq.incrementAndGet()
    val (rn, rk, tot) = (s"_g_rn$id", s"_g_rank$id", s"_g_tot$id")
    val r = GlobalRank.withRankColumns(df, sortCols, rn, rk, tot)
    val fin = (out: String) => (d: DataFrame) => d.drop(rn, rk, tot)
    (r, col(rn), col(rk), col(tot), fin)
  }

  /** NTILE(`n`) over the global ordering given by `sortCols` — which MUST
    * include a unique tiebreaker (same determinism rule as SURVEY.md §7.4). */
  def globalNtile(df: DataFrame, n: Int, out: String, sortCols: Column*): DataFrame = {
    val (r, rn, _, tot, fin) = positioned(df, sortCols)
    // Spark NTile bucket math, in-plan: first N%n buckets get ⌈N/n⌉ rows
    val small = Num.idiv(tot, lit(n.toLong))
    val pad = tot % n
    val big = small + 1
    val threshold = pad * big
    val bucket = when(rn <= threshold, Num.idiv(rn - 1, big) + 1)
      .otherwise(Num.idiv(rn - threshold - 1, greatest(small, lit(1L))) + 1 + pad)
    fin(out)(r.withColumn(out, bucket.cast("int")))
  }

  /** Global RANK() (gaps on ties) over `sortCols`. */
  def globalRank(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    val (r, _, rk, _, fin) = positioned(df, sortCols)
    fin(out)(r.withColumn(out, rk.cast("int")))
  }

  /** Global PERCENT_RANK() over `sortCols`. */
  def globalPercentRank(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    val (r, _, rk, tot, fin) = positioned(df, sortCols)
    val pr = when(tot <= 1L, lit(0.0))
      .otherwise((rk - 1).cast("double") / (tot - 1).cast("double"))
    fin(out)(r.withColumn(out, pr))
  }
}
