package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so extension libraries
  * shipping custom Catalyst expressions expose them via a one-file shim in
  * the sql package — the same pattern Delta/Iceberg/Sedona use. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly CONVERTED catalyst expression (real `UnresolvedAttribute` /
    * `SortOrder` trees the analyzer can resolve). [[expression]] returns a
    * lazy `ColumnNodeExpression` wrapper, which stays Unevaluable if embedded
    * directly in a custom logical operator. */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** DataFrame from a raw logical plan (`Dataset.ofRows` is `private[sql]`) —
    * needed to attach custom logical operators like
    * [[graft.plans.GlobalOrderedRank]] to the public Column/DataFrame API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
