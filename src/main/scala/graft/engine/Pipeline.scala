package graft.engine

import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Sinks

/** Pipeline orchestrator — the reference's `run_sales_analytics` /
  * `run_supplier_analytics` entry points (reference:
  * src/pipelines/run_sales_analytics.py:36-164) re-expressed in-process.
  *
  * The reference fans out to child notebooks via `dbutils.notebook.run`
  * (a job boundary per stage, SURVEY.md §3.1); here every stage is a plain
  * function in one SparkSession, so Catalyst optimizes across stage
  * boundaries and the "IR between stages" is a DataFrame instead of a temp
  * view name. Gating matches the reference: DDL + critical facts fail fast,
  * everything else records its error and continues; a failure summary is
  * raised at the end (run_sales_analytics.py:143-164).
  */
object Pipeline {

  case class StageResult(stage: String, status: String, seconds: Double, rows: Long,
                         error: Option[String] = None)

  /** Driver-computed batch id (reference: extract_orders.py:20 computes it
    * with a `spark.sql(...).collect()` round-trip; a driver-side clock is
    * the same value without a job). */
  def batchId(now: ZonedDateTime = ZonedDateTime.now(ZoneOffset.UTC)): String =
    "batch_" + now.format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))

  private def stage(name: String, critical: Boolean, out: String,
                    partitionBy: Seq[String] = Nil)(df: => DataFrame): StageResult = {
    val t0 = System.nanoTime()
    try {
      val frame = df
      Sinks.snapshotOverwrite(frame, s"$out/$name", partitionBy)
      val rows = frame.sparkSession.read.parquet(s"$out/$name").count()
      StageResult(name, "PASS", (System.nanoTime() - t0) / 1e9, rows)
    } catch {
      case e: Exception if !critical =>
        StageResult(name, "FAIL", (System.nanoTime() - t0) / 1e9, -1, Some(e.getMessage))
    }
  }

  /** The sales pipeline: bronze extracts → silver models → gold views →
    * quality gate, each materialized under `outDir` (order_details
    * partitioned by order_year for downstream pruning, matching the
    * reference's partition-aware write, refined_order_details.py:112-125). */
  def runSalesAnalytics(spark: SparkSession, dir: String, outDir: String): Seq[StageResult] = {
    val results = Seq.newBuilder[StageResult]
    // reference data first, then dims, then facts (run_sales_analytics.py:86-100)
    results += stage("bronze_region", critical = true, outDir)(Bronze.region(spark, dir))
    results += stage("bronze_nation", critical = true, outDir)(Bronze.nation(spark, dir))
    results += stage("bronze_customer", critical = true, outDir)(Bronze.customer(spark, dir))
    results += stage("bronze_part", critical = false, outDir)(Bronze.part(spark, dir))
    results += stage("bronze_orders", critical = true, outDir)(Bronze.orders(spark, dir))
    results += stage("bronze_lineitem", critical = true, outDir)(Bronze.lineitem(spark, dir))
    // silver (run_sales_analytics.py:109-114)
    val od = Silver.orderDetails(spark, dir)
    results += stage("silver_order_details", critical = true, outDir,
      partitionBy = Seq("order_year"))(od)
    results += stage("silver_customer_orders", critical = true, outDir)(
      Silver.customerOrders(spark, dir))
    // gold views-on-silver (run_sales_analytics.py:123-125; no gate)
    results += stage("gold_revenue_by_region", critical = false, outDir)(
      Gold.revenueByRegion(od, Silver.customerGeo(spark, dir)))
    results += stage("gold_customer_lifetime_value", critical = false, outDir)(
      Gold.customerLifetimeValue(Silver.customerOrders(spark, dir), od))
    results += stage("gold_monthly_sales_trends", critical = false, outDir)(
      Gold.monthlySalesTrends(od))
    // quality (run_sales_analytics.py:134)
    results += stage("quality_checks", critical = false, outDir)(
      Quality.rowCounts(spark, dir)
        .unionByName(Quality.nullChecks(spark, dir)
          .withColumnRenamed("check_name", "table_name")
          .withColumnRenamed("null_count", "row_count")))
    val out = results.result()
    val failed = out.filter(_.status == "FAIL")
    require(failed.isEmpty,
      s"pipeline stages failed: ${failed.map(r => s"${r.stage}: ${r.error.getOrElse("?")}").mkString("; ")}")
    out
  }

  /** The supplier pipeline (reference: run_supplier_analytics.py:68-126). */
  def runSupplierAnalytics(spark: SparkSession, dir: String, outDir: String): Seq[StageResult] = {
    val results = Seq.newBuilder[StageResult]
    results += stage("bronze_supplier", critical = true, outDir)(Bronze.supplier(spark, dir))
    results += stage("bronze_part", critical = true, outDir)(Bronze.part(spark, dir))
    val sp = Silver.supplierParts(spark, dir)
    results += stage("silver_supplier_parts", critical = true, outDir)(sp)
    results += stage("gold_supplier_performance", critical = false, outDir)(
      Gold.supplierPerformance(sp, Silver.orderDetails(spark, dir)))
    val out = results.result()
    require(!out.exists(_.status == "FAIL"), s"supplier pipeline failed: $out")
    out
  }
}
