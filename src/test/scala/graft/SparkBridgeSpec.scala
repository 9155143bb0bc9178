package graft

import graft.bridge.SparkInternals
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The fence around the library's entire Spark-internal surface.
  *
  * Everything graft reaches through `private[sql]` goes through ONE
  * facade ([[graft.bridge.SparkInternals]]) backed by two files in
  * `org.apache.spark.sql.graft`. This spec (a) fails on a Spark version
  * drift with the full upgrade checklist in the message, and (b)
  * smoke-drives every forwarder so a behaviorally-compatible-but-wrong
  * upgrade (same signatures, different semantics) also surfaces here.
  */
class SparkBridgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("running Spark matches the pinned internal-API version") {
    assert(spark.version == SparkInternals.PinnedSparkVersion,
      s"""Spark ${spark.version} != pinned ${SparkInternals.PinnedSparkVersion}.
         |The library touches Spark-INTERNAL API validated only against the
         |pin. Upgrade checklist — re-validate each signature against the
         |new jars, fix the two bridge files (org.apache.spark.sql.graft.*),
         |re-run this suite, then move PinnedSparkVersion:
         |${SparkInternals.TouchedInternals.mkString("  - ", "\n  - ", "")}
         |""".stripMargin)
  }

  test("column/expression round-trip preserves the expression") {
    val c = col("x") + lit(1)
    val e = SparkInternals.expression(c)
    val back = SparkInternals.expression(SparkInternals.column(e))
    assert(back.semanticEquals(e))
  }

  test("ofRows re-wraps a logical plan losslessly") {
    import spark.implicits._
    val df = (1 to 10).toDF("n").filter(col("n") > 3)
    val rewrapped = SparkInternals.ofRows(spark, df.queryExecution.logical)
    assert(rewrapped.collect().map(_.getInt(0)).sorted.toSeq == (4 to 10))
  }

  test("localCheckpointMeasured: measured leaf stats at both storage levels") {
    import spark.implicits._
    for (level <- Seq(StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK_SER)) {
      val df = SparkInternals.localCheckpointMeasured(
        (1 to 500).toDF("n").select(col("n"), md5(col("n").cast("string")).as("h")),
        level)
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(500)),
        s"expected measured rowCount=500 at $level, got ${stats.rowCount}")
      // measured bytes, not the never-broadcast default and not an estimate
      // product: a 500-row two-column frame is a few KB
      assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 10L * 1024 * 1024,
        s"expected small measured sizeInBytes at $level, got ${stats.sizeInBytes}")
      assert(df.count() == 500)
      graft.operators.Checkpoints.free(df)
    }
  }
}
