package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst keeps full pushdown/pruning freedom —
  * filters and projections in downstream queries reach the scan.
  *
  * `events.ts` is physically parquet TIMESTAMP(NANOS). Sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (done once at construction
  * by [[EngineSession]] — this loader deliberately does NOT mutate session
  * conf as a side effect); the column then surfaces as nanos-since-epoch
  * LONG and is rebuilt into a proper TimestampType column by
  * integer-dividing to micros — the same ns→us truncation DuckDB applies,
  * so oracle comparisons agree.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
