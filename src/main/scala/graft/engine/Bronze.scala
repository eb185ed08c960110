package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bronze layer: cleansed + deduplicated base tables.
  *
  * Re-expresses the reference extract notebooks
  * (reference: src/extract/extract_orders.py:25-67 and siblings) as lazy
  * DataFrame chains — the reference's staged temp views are just named
  * logical plans, so `val cleaned = raw.where(…)` produces the identical
  * Catalyst plan with view inlining for free.
  *
  * Keep-latest dedup (reference: src/extract/extract_lineitem.py:66-79,
  * `ROW_NUMBER() OVER (PARTITION BY pk ORDER BY _ingested_at DESC)` then
  * `_rn = 1`): the fixtures carry no ingest timestamp but DO carry genuine
  * duplicate `(l_orderkey, l_linenumber)` keys with differing payloads
  * (~60k rows → ~45.8k distinct keys at sf0.01), so we keep the latest by
  * `l_shipdate DESC` with a full-column tiebreak — deterministic because
  * full rows are distinct (SURVEY.md §7.4 tie-hazard rule).
  *
  * Scale note: the dedup window shuffles on the PK — the same hash
  * partitioning the downstream orderkey join needs, and Spark ≥3.5 rewrites
  * `_rn = 1` into `WindowGroupLimit` (partial top-1 before the shuffle), so
  * this is scan → partial-limit → single shuffle → final at 100 TB.
  */
object Bronze {

  /** Null-PK rejection gate (reference: src/extract/extract_orders.py:46-52). */
  def orders(spark: SparkSession, dir: String): DataFrame =
    Lineage.ingest(Sources.orders(spark, dir)
      .where(col("o_orderkey").isNotNull && col("o_custkey").isNotNull))

  def customer(spark: SparkSession, dir: String): DataFrame =
    Lineage.ingest(Sources.customer(spark, dir).where(col("c_custkey").isNotNull))

  /** Quality filters + keep-latest dedup
    * (reference: src/extract/extract_lineitem.py:53-79). */
  def lineitem(spark: SparkSession, dir: String): DataFrame = {
    val cleaned = Sources.lineitem(spark, dir).where(
      col("l_orderkey").isNotNull && col("l_linenumber").isNotNull &&
        col("l_quantity") > 0 && col("l_extendedprice") > 0)
    val keepLatest = Window
      .partitionBy("l_orderkey", "l_linenumber")
      .orderBy(
        col("l_shipdate").desc, col("l_partkey").desc, col("l_suppkey").desc,
        col("l_quantity").desc, col("l_extendedprice").desc,
        col("l_discount").desc, col("l_tax").desc,
        col("l_returnflag").desc, col("l_linestatus").desc)
    Lineage.ingest(cleaned
      .withColumn("_rn", row_number().over(keepLatest))
      .where(col("_rn") === 1)
      .drop("_rn"))
  }

  def supplier(spark: SparkSession, dir: String): DataFrame =
    Lineage.ingest(Sources.supplier(spark, dir).where(col("s_suppkey").isNotNull))

  def part(spark: SparkSession, dir: String): DataFrame =
    Lineage.ingest(Sources.part(spark, dir).where(col("p_partkey").isNotNull))

  def nation(spark: SparkSession, dir: String): DataFrame =
    Lineage.ingest(Sources.nation(spark, dir).where(col("n_nationkey").isNotNull))

  def region(spark: SparkSession, dir: String): DataFrame =
    Lineage.ingest(Sources.region(spark, dir).where(col("r_regionkey").isNotNull))
}
