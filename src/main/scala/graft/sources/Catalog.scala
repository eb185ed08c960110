package graft.sources

import org.apache.spark.sql.SparkSession
import graft.engine.{Bronze, Silver, Sources}

/** Temp-view registration — the reference's `CREATE OR REPLACE TEMPORARY
  * VIEW tv_X AS …` staging surface (reference: src/extract/extract_orders
  * .py:25-67, 23 occurrences) and the `spark.sql` entry path.
  *
  * A temp view is just a named logical plan: registering these exposes every
  * layer to SQL verbatim (`spark.sql("SELECT … FROM silver_order_details")`)
  * with zero materialization — Catalyst inlines the view chain exactly like
  * the reference's analyzer does (SURVEY.md §3.2). */
object Catalog {

  /** Raw fixture tables under their bare names + bronze/silver layers under
    * layer-prefixed names. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    Schemas.all.keys.foreach { t =>
      // events needs its ns→µs normalization; route through Sources
      val df = t match {
        case "events" => Sources.events(spark, dir)
        case "orders" => Sources.orders(spark, dir)
        case "lineitem" => Sources.lineitem(spark, dir)
        case other => spark.read.parquet(s"$dir/$other.parquet")
      }
      df.createOrReplaceTempView(t)
    }
    Bronze.orders(spark, dir).createOrReplaceTempView("bronze_orders")
    Bronze.lineitem(spark, dir).createOrReplaceTempView("bronze_lineitem")
    Bronze.customer(spark, dir).createOrReplaceTempView("bronze_customer")
    Silver.orderDetails(spark, dir).createOrReplaceTempView("silver_order_details")
    Silver.customerOrders(spark, dir).createOrReplaceTempView("silver_customer_orders")
    Silver.supplierParts(spark, dir).createOrReplaceTempView("silver_supplier_parts")
    graft.functions.Native.register(spark)
  }
}
