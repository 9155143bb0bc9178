package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst keeps full pushdown/pruning freedom —
  * filters and projections in downstream queries reach the scan.
  *
  * `events.ts` is normalized to TimestampType here whatever the parquet
  * physical type, so every downstream query sees ONE timestamp semantics:
  *  - TIMESTAMP(NANOS): sessions must set
  *    `spark.sql.legacy.parquet.nanosAsLong=true` (done once at
  *    construction by [[EngineSession]] — this loader deliberately does
  *    NOT mutate session conf as a side effect); the column surfaces as
  *    nanos-since-epoch LONG and is rebuilt by integer-dividing to
  *    micros — the same ns→us truncation DuckDB applies.
  *  - TIMESTAMP(MICROS) without isAdjustedToUTC (a later testdata
  *    generation): Spark 4 infers TIMESTAMP_NTZ, which instant-typed
  *    functions (`unix_micros`, watermarks) refuse; cast to TimestampType.
  *    The session timezone is pinned UTC ([[EngineSession]]), so the cast
  *    is value-preserving and agrees with DuckDB's naive reading.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
