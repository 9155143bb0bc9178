package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters — the
  * standard pattern for libraries contributing native Catalyst expressions
  * (the public Column API intentionally hides its expression backing).
  * Keep this file to these forwarders; all graft logic lives in the
  * `graft` packages.
  *
  * Graft code reaches this ONLY via [[graft.bridge.SparkInternals]] — the
  * one-facade audit point — and SparkBridgeSpec fences the version pin
  * with an upgrade-checklist failure message.
  *
  * VERSION PIN: everything reached through this bridge is Spark-internal
  * API, validated against the build's Spark 4.1.2 jars
  * ([[graft.bridge.SparkInternals.PinnedSparkVersion]]). The most
  * upgrade-fragile consumers are CurationQueries' `bloomOf`/`mightContain`
  * (`BloomFilterAggregate` constructor arity, `BloomFilterMightContain`'s
  * scalar-subquery type-check rule) and `ofRows` below — on a Spark
  * upgrade, compile failures surface constructor drift, and the
  * decontaminate_bloom spec's plan assertion (might_contain below the
  * distinct) plus its frame-equality check surface behavioral drift loudly.
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
