package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters — the
  * standard pattern for libraries contributing native Catalyst expressions
  * (the public Column API intentionally hides its expression backing).
  * Keep this file to these forwarders; all graft logic lives in the
  * `graft` packages.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-wrap a logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`). Used for plan surgery like dropping a global Sort
    * before an update-mode streaming sink.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
