package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Result sinks.
  *
  * The reference's final artifact is a single key-sorted JSON file
  * (`kv_store_server.py:246-277`, the `combine` op). That shape only makes
  * sense for small results — [[sortedSingleFileJson]] keeps it as a
  * convenience, while [[parquetTable]] is the engine default: partitioned,
  * columnar, splittable, the only sane sink at 100 TB.
  */
object Sinks {

  /** Reference-parity sink: global sort on `sortCol`, merged to ONE json
    * file. `coalesce(1)` after a range-partitioned sort preserves global
    * order (partitions are concatenated in range order). Small results only.
    */
  def sortedSingleFileJson(df: DataFrame, sortCol: String, path: String): Unit =
    df.orderBy(sortCol).coalesce(1).write.mode(SaveMode.Overwrite).json(path)

  /** Engine-default sink: partitioned parquet table. */
  def parquetTable(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
