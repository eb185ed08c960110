package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Num, Sources}
import Num._

/** As-of (point-in-time) join — an operator the reference lacks, built by
  * COMPOSITION rather than a custom SparkPlan (guide preference (a)): tag
  * both sides, union, and carry the right side forward with
  * `last(_, ignoreNulls = true)` over a (key, ts, side, id) window, then
  * keep left rows. Exactly one hash shuffle on the partition key and one
  * within-partition sort — the same cost as a sort-merge join, with none of
  * the per-row range probing a naive `ts_r <= ts_l` theta-join would do
  * (which Spark plans as a broadcast-nested-loop — quadratic).
  *
  * Tie rule: a right row at the same timestamp IS visible to the left row
  * (side 0 sorts before side 1); among equal-ts right rows the highest
  * event_id wins. Both rules are explicit in the sort key so the DuckDB twin
  * reproduces them bit-for-bit.
  */
object AsOf {

  /** For each `purchase` event: the most recent `view` event of the same
    * user at-or-before its timestamp (NULL when the user never viewed). */
  def purchaseAsOfView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(spark, dir)
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        col("event_id"), col("event_id").as("view_event_id"), col("ts").as("view_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id"), lit(null).cast("long").as("view_event_id"),
        lit(null).cast("timestamp").as("view_ts"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(purchases)
      .withColumn("asof_view_id", last(col("view_event_id"), ignoreNulls = true).over(w))
      .withColumn("asof_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(
        col("event_id").as("purchase_event_id"),
        col("user_id"), col("ts").as("purchase_ts"),
        col("asof_view_id").as("view_event_id"),
        col("asof_view_ts").as("view_ts"),
        r2((unix_micros(col("ts")) - unix_micros(col("asof_view_ts"))) / 1e6)
          .as("seconds_since_view"))
  }
}
