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

  /** Replace `target` with the staged directory via rename-out / rename-in:
    * the live tree is renamed to a `.old` sibling, the staged tree renamed
    * into place, and `.old` deleted last. Readers race two metadata-only
    * renames (not a recursive delete), and a crash between them leaves the
    * previous result intact in `.old` rather than only in `.inprogress`.
    * Caveat: HDFS/local renames are atomic; object stores (S3-style)
    * implement rename as copy+delete — production there should publish via
    * a manifest/pointer file instead of directory swap.
    */
  private def swapInto(fs: org.apache.hadoop.fs.FileSystem,
      staged: String, target: String, oldLocation: String = null): Unit = {
    val t = new org.apache.hadoop.fs.Path(target)
    val old = new org.apache.hadoop.fs.Path(
      if (oldLocation != null) oldLocation else target + ".old")
    fs.delete(old, true)
    val hadTarget = fs.exists(t)
    if (hadTarget && !fs.rename(t, old))
      throw new java.io.IOException(s"failed to move aside $target")
    if (!fs.rename(new org.apache.hadoop.fs.Path(staged), t)) {
      if (hadTarget) fs.rename(old, t) // restore the previous result
      throw new java.io.IOException(s"failed to move $staged to $target")
    }
    fs.delete(old, true)
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

  /** Upsert `batch` (≤ one row per `keyCol` value) into a keyed parquet
    * result partitioned by `_bkt = pmod(hash(key), buckets)` — the
    * merge-into-parquet sink for UPDATE-mode streaming: each trigger
    * rewrites only the bucket directories its changed keys hash into,
    * so publish cost scales with the delta, not the accumulated result
    * (complete-mode republish rewrites everything every trigger).
    *
    * Merge = read ONLY the affected buckets, anti-join out the updated
    * keys, union the new rows, stage, and swap each affected bucket
    * directory in ([[swapInto]] per bucket — untouched buckets are never
    * listed, read, or written).
    */
  def mergeIntoKeyedParquet(batch: DataFrame, keyCol: String, path: String,
      buckets: Int = 64): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val fs = fileSystem(spark, path)
    // Stage the delta to parquet FIRST: the merge below needs several
    // actions (bucket probe, anti-join, write), and each action on a
    // foreachBatch DataFrame re-executes the upstream stateful micro-batch
    // plan (persist() does not reliably intercept it). One write = one
    // execution; the staged delta is tiny (changed keys only) and doubles
    // as the merge's scan source.
    val delta = path + ".delta"
    batch.withColumn("_bkt", pmod(hash(col(keyCol)), lit(buckets)))
      .write.mode(SaveMode.Overwrite).parquet(delta)
    val b = spark.read.parquet(delta)
    val affected = b.select("_bkt").distinct()
      .collect().map(_.getInt(0)).sorted // ≤ `buckets` values, driver-safe
    if (affected.isEmpty) {
      // empty trigger: publishing a row-less parquet root would poison
      // every later read ('unable to infer schema') — leave no trace
      fs.delete(new org.apache.hadoop.fs.Path(delta), true)
      return
    }
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
      b.write.partitionBy("_bkt").parquet(path)
      // same sidecar the JSON sink writes, so Engine.lookup resolves the
      // key column of a parquet result too (underscore = invisible to scans)
      val keyFile = fs.create(
        new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(path), "_graft_key"), true)
      try keyFile.write(keyCol.getBytes("UTF-8")) finally keyFile.close()
    } else {
      val existing = spark.read.parquet(path)
        .filter(col("_bkt").isin(affected.map(Integer.valueOf): _*))
      val merged = existing
        .join(b.select(keyCol), Seq(keyCol), "left_anti")
        .unionByName(b)
        .select(existing.columns.map(col): _*)
      val tmp = path + ".inprogress"
      merged.write.mode(SaveMode.Overwrite).partitionBy("_bkt").parquet(tmp)
      // the displaced trees go OUTSIDE the table root: a `_bkt=7.old`
      // sibling would be discovered as partition value "7.old" (the
      // underscore-hiding rule skips names containing '='), duplicating
      // bucket rows for concurrent readers
      val oldBase = path + ".oldbkt"
      fs.mkdirs(new org.apache.hadoop.fs.Path(oldBase))
      affected.foreach { k =>
        swapInto(fs, s"$tmp/_bkt=$k", s"$path/_bkt=$k", s"$oldBase/_bkt=$k")
      }
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      fs.delete(new org.apache.hadoop.fs.Path(oldBase), true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(delta), true)
  }

  /** Byte-format parity artifact: the result as ONE pretty-printed JSON
    * object, rendered exactly like Python's `json.dump(obj, fp, indent=4)`
    * of a key-sorted dict (the reference's final artifact,
    * `kv_store_server.py:267-272`) — 4-space indent, `": "` key
    * separator, list values one element per line, non-ASCII escaped
    * (`ensure_ascii`). Requires a 2-column (key, value) result.
    *
    * Serving-size artifact only: the render is driver-side by design,
    * like the reference's in-memory `final_output` dict. Written inside
    * the output directory as `_final_output.json` — the leading
    * underscore hides it from Spark's directory readers, so
    * `Engine.fetchResult` on the same path still works.
    */
  def prettySingleObjectJson(df: DataFrame, keyCol: String, file: String): Unit = {
    import graft.JsonUtil.escape
    val cols = df.columns
    require(cols.length == 2 && cols.contains(keyCol),
      s"pretty sink needs a (key, value) result, got ${cols.mkString(", ")}")
    val valCol = cols.filter(_ != keyCol).head

    def render(v: Any, indent: Int): String = v match {
      case null => "null"
      case s: String => asciiEscape(s)
      case xs: scala.collection.Seq[_] if xs.isEmpty => "[]"
      case xs: scala.collection.Seq[_] =>
        val pad = " " * (4 * (indent + 1))
        xs.map(e => pad + render(e, indent + 1))
          .mkString("[\n", ",\n", "\n" + " " * (4 * indent) + "]")
      case other => other.toString // numbers / booleans
    }
    // Python ensure_ascii: chars past 0x7e become \uXXXX (surrogates too)
    def asciiEscape(s: String): String =
      escape(s).flatMap(c => if (c > '~') f"\\u${c.toInt}%04x" else c.toString)

    val rows = df.select(keyCol, valCol).orderBy(keyCol).collect()
    val body =
      if (rows.isEmpty) "{}"
      else rows.map(r => "    " + asciiEscape(String.valueOf(r.get(0))) +
          ": " + render(r.get(1), 1))
        .mkString("{\n", ",\n", "\n}")

    val fs = fileSystem(df.sparkSession, file)
    val out = fs.create(new org.apache.hadoop.fs.Path(file), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
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
