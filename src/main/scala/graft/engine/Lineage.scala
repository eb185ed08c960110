package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audit/lineage columns the reference declares on every extract and refined
  * table (reference: src/schemas/create_extract_schemas.py:34-36,
  * create_refined_schemas.py:54-55) and stamps in every notebook
  * (extract_orders.py:37-39 `current_timestamp() AS _ingested_at, 'tpch' AS
  * _source_system, '{batch_id}' AS _batch_id`; refined_order_details.py:101-102
  * `current_timestamp() AS _refined_at, '{batch_id}' AS _batch_id`).
  *
  * Determinism contract (SURVEY.md §7.4): `current_timestamp()` and the
  * wall-clock batch id are replaced by pinned literals, chosen a few hours
  * before the pinned "now" (2002-01-01 00:00:00 UTC) so the freshness DQ
  * family evaluates PASS exactly like a just-ran reference pipeline would.
  * In production [[graft.engine.Pipeline.batchId]] supplies the real value.
  */
object Lineage {
  val IngestedAt = "2001-12-31 12:00:00" // 12 h before pinned now -> fresh
  val RefinedAt = "2001-12-31 18:00:00" // 6 h before pinned now -> fresh
  val SourceSystem = "tpch"
  val BatchId = "batch_20011231_120000"

  /** Bronze ingest stamp: `_ingested_at`, `_source_system`, `_batch_id`. */
  def ingest(df: DataFrame): DataFrame =
    df.withColumn("_ingested_at", lit(IngestedAt).cast("timestamp"))
      .withColumn("_source_system", lit(SourceSystem))
      .withColumn("_batch_id", lit(BatchId))

  /** Silver refine stamp: `_refined_at`, `_batch_id`. */
  def refine(df: DataFrame): DataFrame =
    df.withColumn("_refined_at", lit(RefinedAt).cast("timestamp"))
      .withColumn("_batch_id", lit(BatchId))
}
