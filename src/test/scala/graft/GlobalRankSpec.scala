package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Rank, Sources}

/** [[graft.plans.GlobalOrderedRank]]: bit-identity against Spark's own
  * single-partition window functions, whole-operator pruning, laziness. */
class GlobalRankSpec extends SparkSpec {

  private lazy val orders = Sources.orders(spark, sf)

  // explain string survives the AQE wrapper (collect() can't see inside it)
  private def hasRankExec(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      .contains("GlobalOrderedRank")

  test("globalNtile equals single-partition NTILE on a unique ordering") {
    val w = Window.orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val expected = orders.withColumn("nt", ntile(7).over(w))
      .select(col("o_orderkey"), col("nt"))
    val actual = Rank.globalNtile(orders, 7, "nt",
        col("o_totalprice").asc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("nt"))
    assert(actual.exceptAll(expected).isEmpty && expected.exceptAll(actual).isEmpty)
  }

  test("globalRank and globalPercentRank equal window RANK/PERCENT_RANK under heavy ties") {
    // o_orderdate has ~2400 distinct values over 15k orders -> real tie groups
    val w = Window.orderBy(col("o_orderdate").asc)
    val expected = orders
      .withColumn("rk", rank().over(w).cast("int"))
      .withColumn("pr", percent_rank().over(w))
      .select(col("o_orderkey"), col("rk"), col("pr"))
    val actual = Rank.globalPercentRank(
        Rank.globalRank(orders, "rk", col("o_orderdate").asc),
        "pr", col("o_orderdate").asc)
      .select(col("o_orderkey"), col("rk"), col("pr"))
    assert(actual.exceptAll(expected).isEmpty && expected.exceptAll(actual).isEmpty)
  }

  test("descending order and chained levels stay consistent") {
    val w1 = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = orders.withColumn("nt", ntile(5).over(w1))
      .withColumn("rk", rank().over(Window.orderBy(col("nt").asc, col("o_orderkey").asc)).cast("int"))
      .select(col("o_orderkey"), col("nt"), col("rk"))
    val actual = {
      val l1 = Rank.globalNtile(orders, 5, "nt",
        col("o_totalprice").desc, col("o_orderkey").asc)
      Rank.globalRank(l1, "rk", col("nt").asc, col("o_orderkey").asc)
    }.select(col("o_orderkey"), col("nt"), col("rk"))
    assert(actual.exceptAll(expected).isEmpty && expected.exceptAll(actual).isEmpty)
  }

  test("PruneGlobalRank deletes the operator when no rank column is read") {
    val ranked = Rank.globalNtile(orders, 5, "nt",
      col("o_totalprice").asc, col("o_orderkey").asc)
    val counted = ranked.agg(count(lit(1)).as("n"))
    assert(!hasRankExec(counted),
      "count(*) over a ranked frame must not execute the rank operator")
    assert(counted.first().getLong(0) === orders.count())
    // ...but survives when the rank column IS read
    val used = ranked.agg(max(col("nt")))
    assert(hasRankExec(used))
    assert(used.first().getInt(0) === 5)
  }

  test("rank construction is free: composing a ranked frame runs no jobs") {
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    val ranked = Rank.globalPercentRank(orders, "pr", col("o_totalprice").asc,
      col("o_orderkey").asc)
    Rank.globalNtile(ranked, 5, "nt", col("pr").asc, col("o_orderkey").asc)
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after === before, "DataFrame composition must not trigger Spark jobs")
  }

  test("empty input: zero rows, no crash, total=0 branches unharmed") {
    val empty = orders.where(lit(false))
    val r = Rank.globalPercentRank(
      Rank.globalRank(
        Rank.globalNtile(empty, 5, "nt", col("o_orderkey").asc),
        "rk", col("o_orderkey").asc),
      "pr", col("o_orderkey").asc)
    assert(r.count() === 0)
  }

  test("single-row frame: ntile=1, rank=1, percent_rank=0.0") {
    val one = orders.orderBy(col("o_orderkey")).limit(1)
    val r = Rank.globalPercentRank(
      Rank.globalRank(
        Rank.globalNtile(one, 5, "nt", col("o_orderkey").asc),
        "rk", col("o_orderkey").asc),
      "pr", col("o_orderkey").asc)
      .select(col("nt"), col("rk"), col("pr")).first()
    assert(r.getInt(0) === 1 && r.getInt(1) === 1 && r.getDouble(2) === 0.0)
  }
}
