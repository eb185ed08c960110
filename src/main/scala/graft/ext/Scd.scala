package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Sources

/** Slowly-changing-dimension (type 2) maintenance — the lakehouse pattern the
  * reference's snapshot-overwrite sinks cannot express (every write there
  * discards history; SCD2 keeps one row per attribute VERSION with validity
  * interval + current flag).
  *
  * Built event-sourced: the `events` stream is the change log, and the
  * dimension's tracked attribute is the user's event_type state. Consecutive
  * runs of the same value collapse into one version row (a re-statement of
  * the current value is not a change — standard SCD2 semantics).
  *
  * Scale shape: two window passes over one (user_id, ts, event_id) sort —
  * identical partitioning to [[Events.sessions]] — then one hash-agg per
  * version island and one lead() to close intervals. Everything is
  * partitioned by user_id; no global step at any size.
  */
object Scd {

  /** SCD2 history of each user's event_type state:
    * (user_id, version, event_type, effective_from, effective_to,
    * n_events, is_current). `effective_to` is NULL on the open (current)
    * version; versions are 1-based per user in time order. */
  def userEventTypeHistory(spark: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = Sources.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("_chg",
        when(lag(col("event_type"), 1).over(byTime).isNull
          || lag(col("event_type"), 1).over(byTime) =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("version",
        sum(col("_chg")).over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
    val islands = flagged
      .groupBy(col("user_id"), col("version"), col("event_type"))
      .agg(min(col("ts")).as("effective_from"), count(lit(1)).as("n_events"))
    val byVersion = Window.partitionBy("user_id").orderBy("version")
    islands
      .withColumn("effective_to", lead(col("effective_from"), 1).over(byVersion))
      .withColumn("is_current", col("effective_to").isNull)
      .select("user_id", "version", "event_type", "effective_from",
        "effective_to", "n_events", "is_current")
  }
}
