package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality check families (reference: src/tests/data_quality_checks.py).
  *
  * The reference *displays* PASS/FAIL rows without asserting; we return the
  * same check DataFrames (product surface, verified against the oracle) and
  * additionally expose [[Quality.assertAll]] for pipeline gating.
  *
  * Every family is a UNION of tiny single-row aggregates — each arm is a
  * full-table aggregate that Spark runs as partial+final with map-side
  * combine, so the driver only ever sees one row per check at any scale.
  */
object Quality {

  private def statusOf(cnt: Column, pass: String = "PASS", fail: String = "FAIL"): Column =
    when(cnt === 0, fail).otherwise(pass) // only for row counts: >0 passes

  /** Row-count > 0 gate (reference: data_quality_checks.py:27-44). */
  def rowCounts(spark: SparkSession, dir: String): DataFrame = {
    val tables: Seq[(String, DataFrame)] = Seq(
      "orders" -> Bronze.orders(spark, dir),
      "customer" -> Bronze.customer(spark, dir),
      "lineitem" -> Bronze.lineitem(spark, dir),
      "supplier" -> Bronze.supplier(spark, dir),
      "part" -> Bronze.part(spark, dir),
      "nation" -> Bronze.nation(spark, dir),
      "region" -> Bronze.region(spark, dir),
      "order_details" -> Silver.orderDetails(spark, dir),
      "customer_orders" -> Silver.customerOrders(spark, dir),
      "supplier_parts" -> Silver.supplierParts(spark, dir))
    tables.map { case (name, df) =>
      df.agg(count(lit(1)).as("row_count"))
        .select(lit(name).as("table_name"), col("row_count"),
          when(col("row_count") > 0, "PASS").otherwise("FAIL").as("status"))
    }.reduce(_.unionByName(_)).orderBy("table_name")
  }

  /** Null checks on critical columns (reference: data_quality_checks.py:53-64). */
  def nullChecks(spark: SparkSession, dir: String): DataFrame = {
    val od = Silver.orderDetails(spark, dir)
    val co = Silver.customerOrders(spark, dir)
    val sp = Silver.supplierParts(spark, dir)
    val checks: Seq[(String, DataFrame, String)] = Seq(
      ("order_details.customer_key", od, "customer_key"),
      ("order_details.order_date", od, "order_date"),
      ("customer_orders.customer_segment", co, "customer_segment"),
      ("supplier_parts.supply_cost", sp, "supply_cost"),
      ("orders.o_orderdate", Bronze.orders(spark, dir), "o_orderdate"))
    checks.map { case (name, df, c) =>
      df.agg(count(when(col(c).isNull, 1)).as("null_count"))
        .select(lit(name).as("check_name"), col("null_count"),
          when(col("null_count") === 0, "PASS").otherwise("FAIL").as("status"))
    }.reduce(_.unionByName(_)).orderBy("check_name")
  }

  /** Referential-integrity orphan probes — expressed as LEFT ANTI joins
    * (the reference's `LEFT JOIN … WHERE right.key IS NULL` shape,
    * data_quality_checks.py:73-93, which Spark's anti-join does without
    * materializing the null side). */
  def referentialIntegrity(spark: SparkSession, dir: String): DataFrame = {
    val o = Bronze.orders(spark, dir); val l = Bronze.lineitem(spark, dir)
    val probes: Seq[(String, DataFrame)] = Seq(
      "orders->customer" -> o.join(Bronze.customer(spark, dir),
        col("o_custkey") === col("c_custkey"), "left_anti"),
      "lineitem->orders" -> l.join(o,
        col("l_orderkey") === col("o_orderkey"), "left_anti"),
      "lineitem->part" -> l.join(Bronze.part(spark, dir),
        col("l_partkey") === col("p_partkey"), "left_anti"),
      "lineitem->supplier" -> l.join(Bronze.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"), "left_anti"))
    probes.map { case (name, df) =>
      df.agg(count(lit(1)).as("orphan_count"))
        .select(lit(name).as("check_name"), col("orphan_count"),
          when(col("orphan_count") === 0, "PASS").otherwise("FAIL").as("status"))
    }.reduce(_.unionByName(_)).orderBy("check_name")
  }

  /** Business-rule range checks (reference: data_quality_checks.py:102-114). */
  def businessRules(spark: SparkSession, dir: String): DataFrame = {
    val od = Silver.orderDetails(spark, dir)
    val co = Silver.customerOrders(spark, dir)
    val rules: Seq[(String, DataFrame, Column)] = Seq(
      ("od_net_revenue_non_negative", od, col("net_revenue") < 0),
      ("od_quantity_positive", od, col("quantity") <= 0),
      ("od_discount_range", od, col("discount_pct") < 0 || col("discount_pct") > 1),
      ("od_tax_range", od, col("tax_pct") < 0 || col("tax_pct") > 1),
      ("co_fulfillment_rate_range", co,
        col("fulfillment_rate") < 0 || col("fulfillment_rate") > 100),
      ("co_segment_not_null", co, col("customer_segment").isNull))
    rules.map { case (name, df, violation) =>
      df.agg(count(when(violation, 1)).as("violation_count"))
        .select(lit(name).as("rule_name"), col("violation_count"),
          when(col("violation_count") === 0, "PASS").otherwise("FAIL").as("status"))
    }.reduce(_.unionByName(_)).orderBy("rule_name")
  }

  /** Freshness vs the pinned reference instant (reference:
    * data_quality_checks.py:123-140 computes hours since max ingest ts against
    * `current_timestamp()`; we pin "now" to 2002-01-01 for determinism). */
  def freshness(spark: SparkSession, dir: String): DataFrame = {
    val pinnedEpoch = lit(1009843200L) // 2002-01-01 00:00:00 UTC
    Sources.events(spark, dir)
      .agg(max(col("ts")).as("max_ts"))
      .select(
        lit("events").as("table_name"),
        ((pinnedEpoch - unix_timestamp(col("max_ts"))) / 3600.0).as("hours_since_ingest"))
      .withColumn("status",
        when(col("hours_since_ingest") <= 25, "PASS").otherwise("STALE"))
  }

  /** Pipeline gate: throws if any check FAILs (stronger than the reference,
    * which only displays results — SURVEY.md §5). */
  def assertAll(spark: SparkSession, dir: String): Unit = {
    val failed = rowCounts(spark, dir).where(col("status") === "FAIL")
      .unionByName(nullChecks(spark, dir).where(col("status") === "FAIL")
        .withColumnRenamed("check_name", "table_name")
        .withColumnRenamed("null_count", "row_count"))
      .unionByName(businessRules(spark, dir).where(col("status") === "FAIL")
        .withColumnRenamed("rule_name", "table_name")
        .withColumnRenamed("violation_count", "row_count"))
    val bad = failed.collect()
    require(bad.isEmpty, s"data-quality failures: ${bad.mkString("; ")}")
  }
}
