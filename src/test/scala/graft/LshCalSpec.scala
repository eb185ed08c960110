package graft

import org.apache.spark.sql.Row
import graft.ext.LshCal

/** Pins the structural invariants of the SRP-LSH calibration grid — the
  * prefix-mask/OR-amplification laws that hold on ANY corpus, plus the
  * choice policy. Value-level correctness is the DuckDB oracle's job
  * (sim_lsh_calibration). */
class LshCalSpec extends SparkSpec {

  private lazy val rows: Map[(Int, Int), Row] =
    LshCal.calibrationGrid(spark, sf).collect()
      .map(r => (r.getAs[Int]("bits"), r.getAs[Int]("tables")) -> r).toMap

  test("grid covers every (bits, tables) config exactly once") {
    assert(rows.keySet ===
      LshCal.GridBits.flatMap(b => LshCal.GridTables.map(l => (b, l))).toSet)
    val pairs = rows.values.map(_.getAs[Long]("exact_pairs")).toSet
    assert(pairs.size === 1 && pairs.head > 0,
      "every config must be measured against the same exact pair set")
  }

  test("recall is monotone: non-increasing in bits, non-decreasing in tables") {
    // b2-bit collision at the same table implies b1-bit collision for b1<b2
    // (prefix mask); table set L1 ⊂ L2 implies OR over L1 ⇒ OR over L2.
    for (l <- LshCal.GridTables; Seq(b1, b2) <- LshCal.GridBits.sliding(2))
      assert(rows((b1, l)).getAs[Long]("recalled")
        >= rows((b2, l)).getAs[Long]("recalled"),
        s"recall rose with bits at tables=$l ($b1 -> $b2)")
    for (b <- LshCal.GridBits; Seq(l1, l2) <- LshCal.GridTables.sliding(2))
      assert(rows((b, l1)).getAs[Long]("recalled")
        <= rows((b, l2)).getAs[Long]("recalled"),
        s"recall fell with tables at bits=$b ($l1 -> $l2)")
  }

  test("union-bound cost is monotone: non-increasing in bits, " +
    "non-decreasing in tables") {
    // finer masks split buckets (each query bucket shrinks or holds);
    // more tables add non-negative per-table bucket sums.
    for (l <- LshCal.GridTables; Seq(b1, b2) <- LshCal.GridBits.sliding(2))
      assert(rows((b1, l)).getAs[Long]("est_candidates")
        >= rows((b2, l)).getAs[Long]("est_candidates"),
        s"cost rose with bits at tables=$l")
    for (b <- LshCal.GridBits; Seq(l1, l2) <- LshCal.GridTables.sliding(2))
      assert(rows((b, l1)).getAs[Long]("est_candidates")
        <= rows((b, l2)).getAs[Long]("est_candidates"),
        s"cost fell with tables at bits=$b")
  }

  test("choice policy: chosen ⊆ feasible, exactly one iff any feasible, " +
    "and it is the cheapest feasible config") {
    val feasible = rows.values.filter(_.getAs[Boolean]("feasible")).toSeq
    val chosen = rows.values.filter(_.getAs[Boolean]("chosen")).toSeq
    if (feasible.isEmpty) assert(chosen.isEmpty)
    else {
      assert(chosen.size === 1)
      assert(chosen.head.getAs[Boolean]("feasible"))
      val cheapest = feasible.minBy(r => (r.getAs[Long]("est_candidates"),
        r.getAs[Int]("bits"), r.getAs[Int]("tables")))
      assert(chosen.head === cheapest)
    }
  }

  test("the measured grid matches the analytic SRP collision model within " +
    "sampling noise (sanity on the hash family)") {
    // For the (3, 8) config annLsh runs: expected per-bit collision for the
    // fixture's cosine≈0.3 neighbors is 1−θ/π ≈ 0.60, so recall ≈
    // 1−(1−0.6³)⁸ ≈ 0.86. A grossly degenerate plane family (the r4
    // single-Lehmer bug collapsed planes to |corr| 0.97) would push this
    // toward 0 or 1; accept a wide honest band.
    val r38 = rows((3, 8))
    val recall = r38.getAs[Long]("recalled").toDouble /
      r38.getAs[Long]("exact_pairs")
    assert(recall > 0.5 && recall < 1.0,
      f"recall(3,8)=$recall%.3f outside the plausible SRP band")
  }
}
