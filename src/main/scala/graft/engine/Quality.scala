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
  *
  * Check inputs come through a [[TableResolver]] so the same families run in
  * two modes:
  *  - [[sourceTables]]: re-derive each layer from source (the standalone
  *    verification surface — what the oracle checks);
  *  - [[warehouseTables]]: read the PIPELINE'S WRITTEN parquet outputs.
  *    In a deployment the DQ stage audits what was materialized — re-running
  *    the silver derivation to check it would double the pipeline's cost at
  *    100 TB and verify a recomputation instead of the actual tables.
  */
object Quality {

  /** Logical table name → frame. */
  type TableResolver = String => DataFrame

  /** Every logical table the check families reference. */
  val AllTables: Seq[String] = Seq(
    "orders", "customer", "lineitem", "supplier", "part", "nation", "region",
    "order_details", "customer_orders", "supplier_parts")

  /** Re-derive each layer from source (bronze gates + silver models). */
  def sourceTables(spark: SparkSession, dir: String): TableResolver = {
    case "orders"          => Bronze.orders(spark, dir)
    case "customer"        => Bronze.customer(spark, dir)
    case "lineitem"        => Bronze.lineitem(spark, dir)
    case "supplier"        => Bronze.supplier(spark, dir)
    case "part"            => Bronze.part(spark, dir)
    case "nation"          => Bronze.nation(spark, dir)
    case "region"          => Bronze.region(spark, dir)
    case "order_details"   => Silver.orderDetails(spark, dir)
    case "customer_orders" => Silver.customerOrders(spark, dir)
    case "supplier_parts"  => Silver.supplierParts(spark, dir)
    case "events"          => Sources.events(spark, dir)
    case other             => throw new IllegalArgumentException(s"unknown table: $other")
  }

  /** Layer-prefixed paths the [[Pipeline]] writes under its warehouse dir. */
  private val WarehousePath: Map[String, String] = Map(
    "orders" -> "bronze_orders", "customer" -> "bronze_customer",
    "lineitem" -> "bronze_lineitem", "supplier" -> "bronze_supplier",
    "part" -> "bronze_part", "nation" -> "bronze_nation", "region" -> "bronze_region",
    "order_details" -> "silver_order_details",
    "customer_orders" -> "silver_customer_orders",
    "supplier_parts" -> "silver_supplier_parts")

  /** Read the pipeline's written outputs — plain parquet scans, so the DQ
    * stage's plan contains no joins/windows re-deriving silver. */
  def warehouseTables(spark: SparkSession, outDir: String): TableResolver =
    name => spark.read.parquet(s"$outDir/${WarehousePath(name)}")

  /** Row-count > 0 gate (reference: data_quality_checks.py:27-44). */
  def rowCountsOver(t: TableResolver, names: Seq[String] = AllTables): DataFrame =
    names.map { name =>
      t(name).agg(count(lit(1)).as("row_count"))
        .select(lit(name).as("table_name"), col("row_count"),
          when(col("row_count") > 0, "PASS").otherwise("FAIL").as("status"))
    }.reduce(_.unionByName(_)).orderBy("table_name")

  def rowCounts(spark: SparkSession, dir: String): DataFrame =
    rowCountsOver(sourceTables(spark, dir))

  /** One pass per source: each (label, predicate) family over a table is a
    * single multi-aggregate job, exploded back into per-check rows. The naive
    * shape (one UNION arm per check) recomputes the full silver pipeline per
    * arm — at sf0.1 that was 23 s for five null checks; one-pass is ~3×
    * fewer jobs and at 100 TB it is the difference between scanning the fact
    * table once and five times. Output rows are identical. */
  private def countsInOnePass(df: DataFrame, checks: Seq[(String, Column)],
                              countName: String): DataFrame = {
    val aggs = checks.zipWithIndex.map { case ((_, pred), i) =>
      count(when(pred, 1)).as(s"_c$i")
    }
    val kv = checks.zipWithIndex.flatMap { case ((name, _), i) =>
      Seq(lit(name), col(s"_c$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(map(kv: _*)).as(Seq("check_name", countName)))
  }

  /** Null-check families per logical table (reference:
    * data_quality_checks.py:53-64). */
  private val NullCheckFamilies: Seq[(String, Seq[(String, Column)])] = Seq(
    "order_details" -> Seq(
      "order_details.customer_key" -> col("customer_key").isNull,
      "order_details.order_date" -> col("order_date").isNull),
    "customer_orders" -> Seq(
      "customer_orders.customer_segment" -> col("customer_segment").isNull),
    "supplier_parts" -> Seq(
      "supplier_parts.supply_cost" -> col("supply_cost").isNull),
    "orders" -> Seq(
      "orders.o_orderdate" -> col("o_orderdate").isNull))

  def nullChecksOver(t: TableResolver,
                     names: Seq[String] = NullCheckFamilies.map(_._1)): DataFrame =
    NullCheckFamilies.filter(f => names.contains(f._1))
      .map { case (table, checks) => countsInOnePass(t(table), checks, "null_count") }
      .reduce(_.unionByName(_))
      .withColumn("status", when(col("null_count") === 0, "PASS").otherwise("FAIL"))
      .orderBy("check_name")

  def nullChecks(spark: SparkSession, dir: String): DataFrame =
    nullChecksOver(sourceTables(spark, dir))

  /** Referential-integrity orphan probes (reference's `LEFT JOIN … WHERE
    * right.key IS NULL`, data_quality_checks.py:73-93). The three lineitem
    * probes run as ONE pass: left-join the fact to each dimension's distinct
    * key set (no row multiplication) and count the null sides together —
    * one fact scan instead of three, dims broadcast. */
  def referentialIntegrityOver(t: TableResolver,
                               names: Seq[String] = AllTables): DataFrame = {
    val has = names.toSet
    def keys(df: DataFrame, c: String, as: String): DataFrame =
      df.select(col(c).as(as)).distinct()
    val arms = Seq.newBuilder[DataFrame]
    // fact->dim probes exist only when BOTH sides are among the audited
    // tables — a pipeline that doesn't materialize `supplier` can't (and
    // shouldn't) audit lineitem->supplier
    if (has("orders") && has("customer"))
      arms += countsInOnePass(
        t("orders").join(broadcast(keys(t("customer"), "c_custkey", "_kc")),
          col("o_custkey") === col("_kc"), "left"),
        Seq("orders->customer" -> col("_kc").isNull), "orphan_count")
    if (has("lineitem")) {
      var probes = t("lineitem")
      val checks = Seq.newBuilder[(String, Column)]
      if (has("orders")) {
        probes = probes.join(keys(t("orders"), "o_orderkey", "_ko"),
          col("l_orderkey") === col("_ko"), "left")
        checks += "lineitem->orders" -> col("_ko").isNull
      }
      if (has("part")) {
        probes = probes.join(broadcast(keys(t("part"), "p_partkey", "_kp")),
          col("l_partkey") === col("_kp"), "left")
        checks += "lineitem->part" -> col("_kp").isNull
      }
      if (has("supplier")) {
        probes = probes.join(broadcast(keys(t("supplier"), "s_suppkey", "_ks")),
          col("l_suppkey") === col("_ks"), "left")
        checks += "lineitem->supplier" -> col("_ks").isNull
      }
      val cs = checks.result()
      if (cs.nonEmpty) arms += countsInOnePass(probes, cs, "orphan_count")
    }
    arms.result().reduce(_.unionByName(_))
      .withColumn("status", when(col("orphan_count") === 0, "PASS").otherwise("FAIL"))
      .orderBy("check_name")
  }

  def referentialIntegrity(spark: SparkSession, dir: String): DataFrame =
    referentialIntegrityOver(sourceTables(spark, dir))

  /** Business-rule range-check families (reference:
    * data_quality_checks.py:102-114). */
  private val RuleFamilies: Seq[(String, Seq[(String, Column)])] = Seq(
    "order_details" -> Seq(
      "od_net_revenue_non_negative" -> (col("net_revenue") < 0),
      "od_quantity_positive" -> (col("quantity") <= 0),
      "od_discount_range" -> (col("discount_pct") < 0 || col("discount_pct") > 1),
      "od_tax_range" -> (col("tax_pct") < 0 || col("tax_pct") > 1)),
    "customer_orders" -> Seq(
      "co_fulfillment_rate_range" ->
        (col("fulfillment_rate") < 0 || col("fulfillment_rate") > 100),
      "co_segment_not_null" -> col("customer_segment").isNull))

  def businessRulesOver(t: TableResolver,
                        names: Seq[String] = RuleFamilies.map(_._1)): DataFrame =
    RuleFamilies.filter(f => names.contains(f._1))
      .map { case (table, checks) => countsInOnePass(t(table), checks, "violation_count") }
      .reduce(_.unionByName(_))
      .withColumnRenamed("check_name", "rule_name")
      .withColumn("status", when(col("violation_count") === 0, "PASS").otherwise("FAIL"))
      .orderBy("rule_name")

  def businessRules(spark: SparkSession, dir: String): DataFrame =
    businessRulesOver(sourceTables(spark, dir))

  /** Freshness vs the pinned reference instant (reference:
    * data_quality_checks.py:123-140: hours since `max(_ingested_at)` /
    * `max(_refined_at)` on bronze.orders + both silver tables, rounded to one
    * decimal, PASS under 25 h; `current_timestamp()` is pinned to 2002-01-01
    * for determinism). The events arm extends the family to the event stream's
    * own data clock — its staleness is a property of the fixture, not the
    * pipeline, and is reported deterministically either way. */
  /** (logical table, freshness label, timestamp column) arms the family
    * knows how to audit — restricted by `names` so a pipeline only audits
    * the tables it materialized. */
  private val FreshnessArms: Seq[(String, String, String)] = Seq(
    ("orders", "bronze.orders", "_ingested_at"),
    ("order_details", "silver.order_details", "_refined_at"),
    ("customer_orders", "silver.customer_orders", "_refined_at"),
    ("events", "events", "ts"))

  def freshnessOver(t: TableResolver,
                    names: Seq[String] = FreshnessArms.map(_._1)): DataFrame = {
    val pinnedEpoch = lit(1009843200L) // 2002-01-01 00:00:00 UTC
    def arm(name: String, df: DataFrame, tsCol: String): DataFrame =
      df.agg(max(col(tsCol)).as("last_refresh"))
        .select(
          lit("Freshness").as("check_type"),
          lit(name).as("table_name"),
          col("last_refresh"),
          Num.r1((pinnedEpoch - unix_timestamp(col("last_refresh"))) / 3600.0)
            .as("hours_since"))
        .withColumn("status", when(col("hours_since") <= 25, "PASS").otherwise("STALE"))
    FreshnessArms.filter(a => names.contains(a._1))
      .map { case (table, label, tsCol) => arm(label, t(table), tsCol) }
      .reduce(_.unionByName(_))
      .orderBy("table_name")
  }

  def freshness(spark: SparkSession, dir: String): DataFrame =
    freshnessOver(sourceTables(spark, dir))

  /** ALL FIVE check families over one table resolver, in a unified shape
    * (family, check_name, metric, status) — the union the reference's DQ
    * stage displays (data_quality_checks.py:27-140 runs every family,
    * invoked at run_sales_analytics.py:134). Each family is restricted by
    * `names` to the tables the caller materialized; a family with no
    * applicable table contributes no rows. Metric semantics per family:
    * row count / null count / orphan count / violation count / hours since
    * refresh. */
  def allFamiliesOver(t: TableResolver, names: Seq[String]): DataFrame = {
    def fam(family: String, df: DataFrame, check: String, metric: String): DataFrame =
      df.select(lit(family).as("family"), col(check).as("check_name"),
        col(metric).cast("double").as("metric"), col("status"))
    val arms = Seq.newBuilder[DataFrame]
    arms += fam("row_counts", rowCountsOver(t, names), "table_name", "row_count")
    if (NullCheckFamilies.exists(f => names.contains(f._1)))
      arms += fam("null_checks", nullChecksOver(t, names), "check_name", "null_count")
    val has = names.toSet
    if ((has("orders") && has("customer")) ||
        (has("lineitem") && (has("orders") || has("part") || has("supplier"))))
      arms += fam("referential_integrity", referentialIntegrityOver(t, names),
        "check_name", "orphan_count")
    if (RuleFamilies.exists(f => names.contains(f._1)))
      arms += fam("business_rules", businessRulesOver(t, names), "rule_name", "violation_count")
    if (FreshnessArms.exists(a => names.contains(a._1)))
      arms += fam("freshness", freshnessOver(t, names), "table_name", "hours_since")
    arms.result().reduce(_.unionByName(_)).orderBy("family", "check_name")
  }

  /** The DQ audit a DEPLOYED pipeline runs: EVERY family, evaluated over the
    * tables the pipeline actually wrote under `outDir` (restricted to
    * `names` — a pipeline only audits the tables it materializes). Inputs
    * are plain parquet scans of the written outputs — no silver recompute;
    * the only joins in the plan are the RI orphan probes against distinct
    * key sets (dims broadcast), exactly what the family means. */
  def overWarehouse(spark: SparkSession, outDir: String,
                    names: Seq[String]): DataFrame =
    allFamiliesOver(warehouseTables(spark, outDir), names)

  /** Pipeline gate over ALL FIVE families ([[allFamiliesOver]]): throws if
    * any check is non-PASS — including referential-integrity orphans and
    * freshness STALE, which the pre-r7 gate could not trip on (it unioned
    * only three families). Stronger than the reference, which only displays
    * results — SURVEY.md §5. */
  def assertAll(spark: SparkSession, dir: String): Unit =
    assertAllOver(sourceTables(spark, dir), AllTables :+ "events")

  /** [[assertAll]] over an arbitrary resolver/table set — the gate a
    * deployed pipeline points at its own warehouse (and the seam tests use
    * to prove an injected orphan or a stale table actually throws). The
    * collect is control-plane: non-PASS check rows only. */
  def assertAllOver(t: TableResolver, names: Seq[String]): Unit = {
    val bad = allFamiliesOver(t, names).where(col("status") =!= "PASS").collect()
    require(bad.isEmpty, s"data-quality failures: ${bad.mkString("; ")}")
  }
}
