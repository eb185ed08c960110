package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode
import graft.engine.{Gold, Quality, Silver}
import graft.sources.Catalog

/** Plan-quality regression guards: these pin the PHYSICAL properties the
  * 100 TB design depends on — filters/projections reaching the parquet scan,
  * dimensions broadcast, facts sort-merged — so a refactor that silently
  * de-optimizes a plan fails CI, not the cluster. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(SimpleMode)
  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("order_details: quality gates push to the lineitem parquet scan") {
    val f = formatted(Silver.orderDetails(spark, sf))
    assert(f.contains("PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_extendedprice)") ||
      f.contains("GreaterThan(l_quantity,0.0)"), f.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("order_details: part dimension joins via broadcast, never a shuffle") {
    val p = plan(Silver.orderDetails(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("gold_monthly: column pruning reads only 3 orders columns") {
    val f = formatted(Gold.monthlySalesTrends(Silver.orderDetails(spark, sf)))
    val ordersSchema = f.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("o_orderdate"))
    assert(ordersSchema.exists(s => s.contains("o_orderkey") && !s.contains("o_comment")),
      ordersSchema.toString)
  }

  test("supplier_parts: all four dims broadcast (supplier, part, nation, region)") {
    val p = plan(Silver.supplierParts(spark, sf))
    val bcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bcasts >= 2, s"expected broadcast joins, got $bcasts:\n${p.take(1500)}")
  }

  test("referential integrity: one scan of lineitem, not three") {
    val f = formatted(Quality.referentialIntegrity(spark, sf))
    val lineitemScans = f.linesIterator.count(l =>
      l.contains("ReadSchema") && l.contains("l_orderkey"))
    assert(lineitemScans === 1, s"lineitem scanned $lineitemScans times")
  }

  test("catalog temp views make every layer SQL-addressable") {
    Catalog.registerAll(spark, sf)
    val n = spark.sql(
      """SELECT order_year, count(*) AS n, graft_poly_hash(max(part_name)) AS h
        |FROM silver_order_details GROUP BY order_year ORDER BY order_year""".stripMargin)
      .collect()
    assert(n.length > 3)
    val joined = spark.sql(
      "SELECT count(*) FROM bronze_orders o JOIN customer c ON o.o_custkey = c.c_custkey")
      .first().getLong(0)
    assert(joined > 0)
  }
}
