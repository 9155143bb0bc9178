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
    *
    * The result is staged to a sibling `.inprogress` directory and swapped
    * in with delete+rename, so concurrent readers (`Engine.fetchResult`/
    * `lookup`, e.g. while `Engine.runStream` republishes per trigger) race
    * only against a millisecond-scale rename, not the whole rewrite. A
    * `_graft_key` sidecar records the sort/key column for
    * [[graft.Engine.lookup]] — `spark.read.json` reorders columns
    * alphabetically, so the key is not recoverable from position.
    */
  def sortedSingleFileJson(df: DataFrame, sortCol: String, path: String): Unit = {
    val tmp = path + ".inprogress"
    df.orderBy(sortCol).coalesce(1).write.mode(SaveMode.Overwrite).json(tmp)
    val fs = fileSystem(df.sparkSession, path)
    val keyFile = fs.create(
      new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(tmp), "_graft_key"), true)
    try keyFile.write(sortCol.getBytes("UTF-8")) finally keyFile.close()
    swapInto(fs, tmp, path)
  }

  /** Compact a parquet directory to ~`targetMB`-sized files — the standard
    * maintenance pass for sinks that accumulated small files (streaming
    * appends, over-parallel writes): many tiny files wreck scan planning
    * and NameNode/listing costs at scale. Rows are rewritten verbatim
    * (round-robin repartition, no shuffle key), staged, and swapped in
    * atomically like the JSON sink.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
      targetMB: Int = 256): Unit = {
    val fs = fileSystem(spark, path)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / (targetMB * 1024L * 1024L)).toInt)
    val tmp = path + ".inprogress"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    swapInto(fs, tmp, path)
  }

  private def fileSystem(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Replace `target` with the staged directory via delete+rename — readers
    * race a millisecond-scale rename, not a partial rewrite.
    */
  private def swapInto(fs: org.apache.hadoop.fs.FileSystem,
      staged: String, target: String): Unit = {
    fs.delete(new org.apache.hadoop.fs.Path(target), true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(staged), new org.apache.hadoop.fs.Path(target)))
      throw new java.io.IOException(s"failed to move $staged to $target")
  }

  /** Read back the `_graft_key` sidecar written by [[sortedSingleFileJson]]. */
  def readKeyColumn(spark: org.apache.spark.sql.SparkSession, path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_key")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

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
