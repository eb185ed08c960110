package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Deterministic numeric kernels shared by every verified query.
  *
  * Motivation (SURVEY.md §7.4): the driver hash-compares our results against a
  * DuckDB oracle. Two hazards make naive double math non-reproducible across
  * engines:
  *
  *  1. SUM(double) depends on addition order — Spark sums per-partition then
  *     merges, DuckDB sums in its own order; IEEE addition is not associative.
  *     Fix: sum in DECIMAL(38,10) (exact, order-free), cast back to double.
  *     The decimal cast itself is cross-engine safe because every summed column
  *     holds values that are ≤6-decimal-digit quantities up to double error
  *     (money = 2dp, rates = 2dp, their products ≤6dp), far inside scale 10.
  *
  *  2. ROUND(double, k) at ties — Spark rounds HALF_UP on the shortest decimal
  *     string; DuckDB rounds on the binary value. For x = 2.675 (stored as
  *     2.67499999…) Spark gives 2.68, DuckDB 2.67. Fix: express rounding as
  *     floor(x·10ᵏ + 0.5)/10ᵏ — identical IEEE ops in both engines, so results
  *     are bitwise equal by construction (half-up towards +∞ at exact ties).
  *
  * Each helper has a textual twin in [[graft.Oracles]] emitting the same
  * formula as DuckDB SQL. At cluster scale both tricks are also sound:
  * decimal sums use the same partial-aggregation path as double sums
  * (map-side combine preserved), and floor/divide stay in whole-stage codegen.
  */
object Num {
  val SumDec = "decimal(38,10)"

  /** Order-independent SUM of a money-like double column. */
  def dsum(c: Column): Column = sum(c.cast(SumDec)).cast("double")

  /** Windowed order-independent SUM. */
  def dsumOver(c: Column, w: WindowSpec): Column =
    sum(c.cast(SumDec)).over(w).cast("double")

  /** Cross-engine deterministic ROUND(x, k): floor(x·10ᵏ + 0.5)/10ᵏ. */
  def r(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    floor(c * p + 0.5) / p
  }

  def r1(c: Column): Column = r(c, 1)
  def r2(c: Column): Column = r(c, 2)
  def r4(c: Column): Column = r(c, 4)

  /** NULL when divisor is zero — mirrors SQL NULLIF(d, 0) guards. */
  def div0(num: Column, den: Column): Column = num / nullif(den, lit(0))

  /** Exact BIGINT quotient for NON-NEGATIVE a, positive b — Spark's `div`
    * (IntegralDivide), DuckDB twin `a // b`. Both truncate toward zero, so
    * for non-negative operands they agree with mathematical floor and have
    * ZERO float surface. Replaces the old floor(a / b) double path, whose
    * correctly-rounded division is deterministic only below 2^53 and whose
    * floor() boundary cost `text_vocab_drift` its driver-green row in
    * round 9 (CORRECTNESS_r09). */
  def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** Exact BIGINT FLOOR-division for a of EITHER sign, positive b: the
    * pmod device keeps floor semantics (Spark `div` / DuckDB `//` both
    * truncate toward zero, which differs from floor for negative a).
    * DuckDB twin: `(a - ((a % b + b) % b)) // b`. */
  def fdiv(a: Column, b: Column): Column =
    call_function("div", a - pmod(a, b), b)

  /** Exact integer square root of non-negative a: the correctly-rounded
    * IEEE sqrt seeds, then ONE integer correction step each way makes the
    * result exact regardless of how sqrt rounded (w² ≤ a < (w+1)² by
    * construction) — no float boundary survives into the value. The
    * corrections compare via DIVISION (a div w ≥ w ⟺ w² ≤ a for
    * non-negative operands), so nothing overflows even at a near 2⁶³
    * under ANSI arithmetic. DuckDB twin spells the identical formula. */
  def isqrt(a: Column): Column = {
    val w0 = floor(sqrt(a.cast("double"))).cast("long")
    w0 + when(idiv(a, w0 + 1) >= w0 + 1, lit(1L)).otherwise(lit(0L)) -
      when(idiv(a, greatest(w0, lit(1L))) < w0, lit(1L)).otherwise(lit(0L))
  }
}
