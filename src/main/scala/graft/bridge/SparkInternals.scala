package graft.bridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** THE single graft-side doorway to Spark-internal API.
  *
  * Two helper files live inside `org.apache.spark.sql.graft` because they
  * touch `private[sql]` members ([[org.apache.spark.sql.graft.ColumnBridge]],
  * [[org.apache.spark.sql.graft.CheckpointBridge]]); everything else in
  * this library reaches internals ONLY through this facade, so the whole
  * internal surface is auditable in one place and fenced by one spec
  * (SparkBridgeSpec), which fails with an upgrade checklist when the
  * session's Spark version drifts off the pin.
  */
object SparkInternals {

  /** The Spark version every internal signature below was validated
    * against (the build's unmanaged jars). SparkBridgeSpec asserts the
    * RUNNING session matches; constructor drift additionally surfaces as
    * compile failures confined to the two bridge files.
    */
  val PinnedSparkVersion = "4.1.2"

  /** Every internal signature the bridges touch — the upgrade checklist.
    * On a version bump: re-validate each against the new jars, then move
    * the pin.
    */
  val TouchedInternals: Seq[String] = Seq(
    "org.apache.spark.sql.classic.ExpressionUtils.column(Expression): Column",
    "org.apache.spark.sql.classic.ExpressionUtils.expression(Column): Expression",
    "org.apache.spark.sql.classic.Dataset.ofRows(classic.SparkSession, LogicalPlan): DataFrame",
    "org.apache.spark.sql.execution.LogicalRDD(output, rdd, partitioning, ordering)(session, Some(Statistics), None)",
    "org.apache.spark.sql.classic.SparkSession (cast from sql.SparkSession for ofRows/LogicalRDD)",
    "QueryExecution.toRdd / executedPlan.outputPartitioning / outputOrdering (checkpoint reconstruction)",
    "org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(xxhash64, n, bits) (CurationQueries.bloomOf)",
    "org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(bloom, xxhash64) (CurationQueries.mightContain)")

  /** Wrap a native Catalyst expression as a public Column. */
  def column(e: Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)

  /** Unwrap a Column to its backing expression. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)

  /** Re-wrap a logical plan as a DataFrame (plan surgery, e.g. dropping a
    * global Sort before an update-mode streaming sink).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark, plan)

  /** Eager local checkpoint whose new leaf carries MEASURED statistics —
    * see [[org.apache.spark.sql.graft.CheckpointBridge]] for the driver
    * stats-blowup this exists to kill. Reach it via
    * [[graft.operators.Checkpoints.fresh]]/[[graft.operators.Checkpoints.corpusScaled]],
    * which add the block-lifecycle discipline.
    */
  def localCheckpointMeasured(df: DataFrame, level: StorageLevel): DataFrame =
    org.apache.spark.sql.graft.CheckpointBridge.localCheckpointMeasured(df, level)
}
