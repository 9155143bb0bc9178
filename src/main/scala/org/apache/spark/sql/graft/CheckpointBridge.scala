package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.physical.PartitioningCollection
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Local-checkpoint constructor that REPLACES the plan-derived statistics
  * carry-over with measured ones.
  *
  * Why this exists — a measured driver-side scale defect (round 11):
  * `Dataset.localCheckpoint` wraps the materialized RDD in a [[LogicalRDD]]
  * whose `originStats` come from `rewriteStatsAndConstraints`, i.e. the
  * ESTIMATED stats of the plan being checkpointed. Catalyst's
  * size-only estimator multiplies `sizeInBytes` through join nodes, so a
  * checkpoint of a join-bearing plan carries a size that is a PRODUCT of
  * its inputs' sizes — and when checkpointing iteratively (the
  * connected-components loop: each round joins the previous round's
  * checkpoint with itself), the carried BigInt's digit count DOUBLES per
  * round. After ~20 rounds the driver main thread spends minutes inside
  * `BigInteger.multiplyToomCook3` on million-digit integers while all 32
  * executor threads idle (observed live in the round-11 sf10 chain:
  * load ≈ 1, gc = 0, the bench stalled 8+ minutes between queries).
  * On a 1000-executor cluster the driver would stall the whole fleet.
  *
  * The fix is also an upgrade: after the eager materialization we KNOW
  * the true size and row count from the block store, so the new
  * [[LogicalRDD]] gets `Statistics(measured bytes, measured rows)` —
  * exact leaf stats for downstream planning (broadcast decisions on
  * checkpointed frames now use real sizes, not estimates), and the
  * runaway product chain is structurally broken: every checkpoint resets
  * stats to ground truth.
  *
  * Graft code reaches this ONLY via [[graft.bridge.SparkInternals]] (and
  * its lifecycle wrapper [[graft.operators.Checkpoints]]); SparkBridgeSpec
  * fences the version pin with an upgrade-checklist failure message.
  *
  * VERSION PIN: `LogicalRDD`'s constructor and `Dataset.ofRows` are
  * Spark-internal API, validated against the build's Spark 4.1.2 jars
  * ([[graft.bridge.SparkInternals.PinnedSparkVersion]], same posture as
  * [[ColumnBridge]]). Constructor drift on upgrade surfaces as a compile
  * failure in this one file.
  */
object CheckpointBridge {

  /** Materialize `df` eagerly as a local checkpoint at `level`, returning
    * a frame whose plan is a fresh [[LogicalRDD]] with measured stats.
    * Mirrors `Dataset.checkpoint(eager = true, reliableCheckpoint =
    * false)` — same row copy, same partitioning/ordering preservation —
    * minus the stats/constraints carry-over described above.
    */
  def localCheckpointMeasured(df: DataFrame, level: StorageLevel): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val qe = df.queryExecution
    // toRdd rows are reused buffers; copy before caching (as Dataset does)
    val rdd = qe.toRdd.map(_.copy())
    rdd.persist(level)
    rdd.localCheckpoint() // transformStorageLevel keeps (de)serialized form, adds disk
    val rows = rdd.count() // eager: materialize every partition now
    val measured = spark.sparkContext.getRDDStorageInfo
      .find(_.id == rdd.id).map(i => i.memSize + i.diskSize).getOrElse(0L)
    val sizeInBytes: BigInt =
      if (measured > 0) BigInt(measured)
      else if (rows == 0) BigInt(1) // empty: tiny, broadcast-eligible
      else BigInt(spark.sessionState.conf.defaultSizeInBytes) // unknown: never broadcast
    val stats = Statistics(sizeInBytes = sizeInBytes, rowCount = Some(BigInt(rows)))
    // keep the physical partitioning/ordering facts (exchange reuse), as
    // Dataset.checkpoint does: first leaf of a PartitioningCollection
    val partitioning = qe.executedPlan.outputPartitioning match {
      case p: PartitioningCollection => p.partitionings.head
      case p => p
    }
    val logical = LogicalRDD(
      qe.analyzed.output, rdd, partitioning, qe.executedPlan.outputOrdering)(
      spark, Some(stats), None)
    Dataset.ofRows(spark, logical)
  }
}
