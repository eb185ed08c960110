package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Num._

/** Change-data-feed: the row-level diff between two snapshot states of the
  * same keyed table — what Delta/Iceberg expose as CDF and what an
  * incremental lakehouse consumes to propagate changes downstream without
  * re-reading full snapshots.
  *
  * Scale shape: one full-outer join co-partitioned on the key (both sides
  * shuffle once on the same key; with bucketed layouts — [[graft.sources
  * .Sinks.writeBucketed]] — even that shuffle disappears). Unchanged rows
  * are dropped POST-join but map-side of anything downstream, so the feed's
  * output is proportional to the churn, not the table.
  */
object Cdf {

  /** Generic diff of `old` vs `neu` (identical schemas) on `keys`:
    * every non-key column comes back twice (`old_c`, `new_c`) plus
    * `change_type` ∈ insert | update | delete. Unchanged rows (null-safe
    * equality on ALL non-key columns) are dropped. */
  def diff(old: DataFrame, neu: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = old.columns.filterNot(keys.contains).toSeq
    require(valueCols.nonEmpty, "diff needs at least one non-key column")
    val o = old.select(keys.map(col) ++ Seq(lit(true).as("_o_present")) ++
      valueCols.map(c => col(c).as(s"old_$c")): _*)
    val n = neu.select(keys.map(col) ++ Seq(lit(true).as("_n_present")) ++
      valueCols.map(c => col(c).as(s"new_$c")): _*)
    val same = valueCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("_o_present").isNull, "insert")
          .when(col("_n_present").isNull, "delete")
          .when(same, "none")
          .otherwise("update"))
      .where(col("change_type") =!= "none")
      .drop("_o_present", "_n_present")
  }

  /** The CDF demo query: per-customer order aggregates under a sliding
    * retention window. The OLD snapshot aggregated orders before
    * [[CdfOldEnd]]; the NEW snapshot covers [[CdfNewStart]] onward (the
    * window slid forward). Customers whose orders all predate the new
    * window surface as deletes, newly active ones as inserts, the rest as
    * updates (or drop out when both windows agree). */
  val CdfOldEnd = "1997-01-01"
  val CdfNewStart = "1999-07-01"

  def customerOrderChanges(spark: SparkSession, dir: String): DataFrame = {
    def snapshot(pred: org.apache.spark.sql.Column): DataFrame =
      Sources.orders(spark, dir).where(pred)
        .groupBy(col("o_custkey").as("customer_key"))
        .agg(count(lit(1)).as("order_count"),
          r2(dsum(col("o_totalprice"))).as("total_spent"))
    diff(
      snapshot(col("o_orderdate") < lit(CdfOldEnd)),
      snapshot(col("o_orderdate") >= lit(CdfNewStart)),
      Seq("customer_key"))
  }
}
