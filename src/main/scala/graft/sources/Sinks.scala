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

  /** Bucketed catalog table: pre-hash-partitioned (and per-bucket sorted)
    * on the join/group keys, so repeated joins and aggregations on those
    * keys plan with NO exchange — the shuffle is paid once at write time
    * instead of per query. The 100 TB play for fact⋈fact joins Catalyst
    * can't broadcast (see SCALE.md; verified by SinksSpec asserting an
    * exchange-free sort-merge join plan).
    */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}
