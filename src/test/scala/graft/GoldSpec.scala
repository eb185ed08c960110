package graft

import org.apache.spark.sql.functions._
import graft.engine.{Gold, Silver}

/** Gold semantics: tier thresholds, COALESCE defaults, share-of-total,
  * window trend invariants (SURVEY.md §2.5, §7.5b-c). */
class GoldSpec extends SparkSpec {

  lazy val od = Silver.orderDetails(spark, sf).cache()

  test("value tiers follow percent_rank thresholds 0.9/0.7/0.4") {
    val clv = Gold.customerLifetimeValue(Silver.customerOrders(spark, sf), od)
    val expected =
      when(col("revenue_percentile") >= 0.9, "Platinum")
        .when(col("revenue_percentile") >= 0.7, "Gold")
        .when(col("revenue_percentile") >= 0.4, "Silver")
        .otherwise("Bronze")
    assert(clv.where(col("value_tier") =!= expected).count() == 0)
  }

  test("supplier performance score uses COALESCE(50) defaults for missing delivery metrics") {
    val perf = Gold.supplierPerformance(Silver.supplierParts(spark, sf), od)
    val noDelivery = perf.where(col("orders_fulfilled").isNull)
    // with on_time=50 and return=50 defaults: score = 50*.4 + cheapest*.3 + types*.2 + 50*.1
    val recomputed = floor(
      (lit(50.0) * 0.4 + least(col("cheapest_pct"), lit(100.0)) * 0.3 +
        least(col("distinct_part_types") * 5, lit(100L)).cast("double") * 0.2 +
        lit(50.0) * 0.1) * 100 + 0.5) / 100
    assert(noDelivery.where(abs(col("performance_score") - recomputed) > 1e-9).count() == 0)
  }

  test("revenue share sums to ~100% within every (region, year, quarter)") {
    val rbr = Gold.revenueByRegion(od, Silver.customerGeo(spark, sf))
    val sums = rbr.groupBy("region_name", "order_year", "order_quarter")
      .agg(sum("revenue_share_in_region_pct").as("s"))
    assert(sums.where(abs(col("s") - 100.0) > 0.1).count() == 0)
  }

  test("monthly trends: ytd cumulative is non-decreasing within a year and rank 1 is the max month") {
    val mt = Gold.monthlySalesTrends(od).cache()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("order_year").orderBy("order_month")
    val bad = mt.withColumn("prev_ytd", lag("ytd_cumulative_revenue", 1).over(w))
      .where(col("prev_ytd").isNotNull && col("ytd_cumulative_revenue") < col("prev_ytd") - 0.01)
    assert(bad.count() == 0)
    val top = mt.withColumn("mx", max("total_revenue").over(Window.partitionBy("order_year")))
      .where(col("revenue_rank_in_year") === 1 && col("total_revenue") =!= col("mx"))
    assert(top.count() == 0)
  }

  test("12-month moving average over a constant series equals the constant (synthetic)") {
    import spark.implicits._
    // 24 months of identical revenue → every MA and seasonal index is flat
    val rows = for (y <- 2000 to 2001; m <- 1 to 12) yield
      (y * 100L + m, 1, y.toLong, java.sql.Date.valueOf(f"$y-$m%02d-15"), "N", "P", 100.0,
        10.0, 0.0, 0.0, java.sql.Date.valueOf(f"$y-$m%02d-20"), "A")
    val od2 = rows.toDF("order_key", "line_number", "customer_key", "order_date",
        "order_status", "order_priority", "extended_price", "quantity", "discount_pct",
        "tax_pct", "ship_date", "return_flag")
      .withColumn("part_key", lit(1L)).withColumn("supplier_key", lit(1L))
      .withColumn("part_name", lit("p")).withColumn("part_brand", lit("b"))
      .withColumn("part_type", lit("t"))
      .withColumn("unit_price", lit(10.0))
      .withColumn("net_revenue", col("extended_price"))
      .withColumn("tax_amount", lit(0.0))
      .withColumn("total_charge", col("extended_price"))
      .withColumn("shipping_delay_days", lit(5))
      .withColumn("is_late_shipment", lit(false))
      .withColumn("order_year", year(col("order_date")))
      .withColumn("order_month", month(col("order_date")))
      .withColumn("order_quarter", quarter(col("order_date")))
    val mt = Gold.monthlySalesTrends(od2)
    val bad = mt.where(
      abs(col("revenue_3mo_moving_avg") - 100.0) > 1e-9 ||
        abs(col("revenue_12mo_moving_avg") - 100.0) > 1e-9 ||
        (col("mom_revenue_growth_pct").isNotNull && abs(col("mom_revenue_growth_pct")) > 1e-9))
    assert(bad.count() == 0)
  }

  test("quality gate: assertAll passes on the clean fixture") {
    graft.engine.Quality.assertAll(spark, sf) // throws on any FAIL row
  }
}
