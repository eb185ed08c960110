package graft

import java.nio.file.Files
import graft.engine.Pipeline
import graft.sources.Schemas

class PipelineSpec extends SparkSpec {

  test("sales pipeline runs all stages, partitions order_details by year") {
    val out = Files.createTempDirectory("graft_pipe").toString
    val results = Pipeline.runSalesAnalytics(spark, sf, out)
    assert(results.forall(_.status == "PASS"), results.mkString("; "))
    assert(results.map(_.stage).contains("silver_order_details"))
    assert(results.filter(_.stage.startsWith("bronze")).forall(_.rows > 0))
    // partition pruning layout exists
    val yearDirs = new java.io.File(s"$out/silver_order_details").listFiles()
      .filter(_.getName.startsWith("order_year="))
    assert(yearDirs.nonEmpty)
    // written snapshot is readable and matches the live plan's count
    val written = spark.read.parquet(s"$out/silver_order_details").count()
    assert(written === graft.engine.Silver.orderDetails(spark, sf).count())
  }

  test("supplier pipeline runs its four stages") {
    val out = Files.createTempDirectory("graft_pipe_sup").toString
    val results = Pipeline.runSupplierAnalytics(spark, sf, out)
    assert(results.map(_.stage) ===
      Seq("bronze_supplier", "bronze_part", "silver_supplier_parts", "gold_supplier_performance"))
    assert(results.forall(_.status == "PASS"))
  }

  test("batchId formats as batch_yyyyMMdd_HHmmss") {
    val id = Pipeline.batchId(java.time.ZonedDateTime.of(2026, 1, 2, 3, 4, 5, 0,
      java.time.ZoneOffset.UTC))
    assert(id === "batch_20260102_030405")
  }

  test("schema catalog: ensure is idempotent and scans accept the declared schema") {
    val out = Files.createTempDirectory("graft_ddl").toString
    Schemas.ensure(spark, "orders", s"$out/orders")
    Schemas.ensure(spark, "orders", s"$out/orders") // second call: no-op
    assert(spark.read.parquet(s"$out/orders").schema === Schemas.orders)
    // declared schema is read-compatible with the real fixture files
    val withSchema = spark.read.schema(Schemas.documents).parquet(s"$sf/documents.parquet")
    assert(withSchema.count() === 500)
  }
}
