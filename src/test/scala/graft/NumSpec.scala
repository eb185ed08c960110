package graft

import org.apache.spark.sql.functions._
import graft.engine.Num

/** The deterministic numeric kernels every verified query leans on. */
class NumSpec extends SparkSpec {
  import spark.implicits._

  test("r2 matches the scalar floor(x*100+0.5)/100 formula bitwise") {
    // The contract is NOT decimal half-up rounding — it is "exactly these
    // IEEE ops", because DuckDB's oracle runs the same expression and the
    // driver hash-compares bitwise. Ties resolve however the IEEE product
    // lands (2.675*100 == 267.5 exactly → 2.68; 1.005*100 == 100.49999… → 1.0).
    val xs = Seq(2.675, 2.005, 1.005, 1.004, 1.006, -1.005, 0.0, 123.456)
    val out = xs.toDF("x").select(Num.r2(col("x")).as("r")).as[Double].collect()
    val expected = xs.map(x => math.floor(x * 100 + 0.5) / 100)
    assert(out.toSeq == expected)
  }

  test("dsum is order-independent: same result for any partitioning") {
    val xs = Seq.tabulate(1000)(i => 0.1 + i * 0.01)
    val a = xs.toDF("x").repartition(7).agg(Num.dsum(col("x"))).first().getDouble(0)
    val b = xs.reverse.toDF("x").repartition(2).agg(Num.dsum(col("x"))).first().getDouble(0)
    assert(a == b) // bitwise: decimal accumulation is exact, cast once at the end
  }

  test("div0 yields NULL on zero divisor, plain quotient otherwise") {
    val out = Seq((10.0, 2.0), (1.0, 0.0)).toDF("n", "d")
      .select(Num.div0(col("n"), col("d")).as("q")).collect()
    assert(out(0).getDouble(0) == 5.0 && out(1).isNullAt(0))
  }
}
