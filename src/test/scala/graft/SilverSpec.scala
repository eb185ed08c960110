package graft

import org.apache.spark.sql.functions._
import graft.engine.Silver

/** Silver semantics: derived metrics, RFM bounds, segmentation branch order
  * (SURVEY.md §2.4, §2.5 W2, §7.5a). */
class SilverSpec extends SparkSpec {

  lazy val od = Silver.orderDetails(spark, sf).cache()
  lazy val co = Silver.customerOrders(spark, sf).cache()

  test("order_details: net_revenue = extended_price*(1-discount) rounded, never negative") {
    val bad = od.where(
      col("net_revenue") < 0 ||
        abs(col("net_revenue") - floor(col("extended_price") * (lit(1) - col("discount_pct")) * 100 + 0.5) / 100) > 1e-9)
    assert(bad.count() == 0)
  }

  test("order_details: shipping delay and late flag are consistent") {
    val bad = od.where(col("is_late_shipment") =!= (col("shipping_delay_days") > 90))
    assert(bad.count() == 0)
  }

  test("RFM scores all lie in [1,5]") {
    val bad = co.where(
      col("rfm_recency_score") < 1 || col("rfm_recency_score") > 5 ||
        col("rfm_frequency_score") < 1 || col("rfm_frequency_score") > 5 ||
        col("rfm_monetary_score") < 1 || col("rfm_monetary_score") > 5)
    assert(bad.count() == 0)
  }

  test("segmentation is first-match-wins: every (r,f,m) triple maps to the first matching rule") {
    // re-derive the segment from scores independently and compare row-by-row
    val expected =
      when(col("rfm_recency_score") <= 2 && col("rfm_frequency_score") <= 2 &&
        col("rfm_monetary_score") <= 2, "Champions")
        .when(col("rfm_recency_score") <= 2 && col("rfm_frequency_score") <= 3, "Loyal Customers")
        .when(col("rfm_recency_score") <= 2 && col("rfm_monetary_score") <= 2, "Big Spenders")
        .when(col("rfm_recency_score") <= 3 && col("rfm_frequency_score") <= 3, "Potential Loyalists")
        .when(col("rfm_recency_score") >= 4 && col("rfm_frequency_score") >= 4, "At Risk")
        .when(col("rfm_recency_score") >= 4 && col("rfm_frequency_score") <= 2, "Cannot Lose Them")
        .otherwise("Others")
    assert(co.where(col("customer_segment") =!= expected).count() == 0)
    // a Champions row satisfies the Loyal predicate too — proves order matters
    val champ = co.where(col("rfm_recency_score") <= 2 && col("rfm_frequency_score") <= 2 &&
      col("rfm_monetary_score") <= 2)
    assert(champ.where(col("customer_segment") =!= "Champions").count() == 0)
  }

  test("order_frequency_days is NULL for single-order customers, positive-or-zero otherwise") {
    assert(co.where(col("total_orders") === 1 && col("order_frequency_days").isNotNull).count() == 0)
    assert(co.where(col("total_orders") > 1 && (col("order_frequency_days").isNull ||
      col("order_frequency_days") < 0)).count() == 0)
  }

  test("supplier_parts: exactly one rank-1 cost group flag per (region, part_type) — dense_rank ties allowed") {
    val sp = Silver.supplierParts(spark, sf)
    val perGroup = sp.groupBy("supplier_region", "part_type")
      .agg(min(col("cost_rank_in_region")).as("min_rank"))
    assert(perGroup.where(col("min_rank") =!= 1).count() == 0)
    val flagBad = sp.where(col("is_cheapest_in_region") =!= (col("cost_rank_in_region") === 1))
    assert(flagBad.count() == 0)
  }
}
