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

  /** Per-merge attribution record for [[mergeIntoKeyedParquet]] — what a
    * trigger's publish actually did, so a stream bench can separate the
    * O(delta) append path from the amortized-logarithmic compaction path
    * instead of reporting one opaque wall time (the r12 chunk-stream
    * drift question: is per-batch growth real, or compaction spikes?).
    *
    *  - `deltaBytes`: staged delta size — the O(delta) term.
    *  - `appendBuckets`: buckets published by pure rename (no data read).
    *  - `compactBuckets` / `absorbedBytes`: buckets the tier rule chose
    *    to rewrite this merge and the historical level bytes they
    *    re-read — the amortized term, spiky by design.
    *  - `compactionSec`: wall time of the compaction job alone;
    *    `totalSec` the whole merge including staging, renames, manifest
    *    commit, and GC.
    */
  final case class MergeStats(path: String, gen: Long, deltaBytes: Long,
      appendBuckets: Int, compactBuckets: Int, absorbedBytes: Long,
      compactionSec: Double, totalSec: Double)

  // Opt-in observer (diagnostics only — a bench installs a collector;
  // the default is no-op and the sink's behavior never depends on it).
  private val mergeListener =
    new java.util.concurrent.atomic.AtomicReference[MergeStats => Unit](null)
  def onMerge(f: MergeStats => Unit): Unit = mergeListener.set(f)
  def clearOnMerge(): Unit = mergeListener.set(null)
  private def emitMergeStats(ms: => MergeStats): Unit = {
    val f = mergeListener.get
    if (f != null) f(ms)
  }

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
    // a keyed table is NOT a plain parquet directory: a whole-root read of
    // a manifest table would see every retained generation (duplicate
    // keys), and flattening either layout destroys the structure the
    // keyed reader/merger depends on — refuse loudly; merging compacts
    // those tables bucket-by-bucket as part of the next generation
    require(!fs.exists(Manifest.logDir(path)),
      s"$path is a manifest-published keyed table; compactParquet would read " +
        "duplicate generations and break the manifest layout — its buckets " +
        "are rewritten per-generation by mergeIntoKeyedParquet instead")
    // the PRE-manifest legacy layout (_bkt= partition dirs, no log yet):
    // flattening it would strand every accumulated key — the next merge
    // would find neither manifest nor _bkt= dirs and publish only its delta
    require(!(fs.exists(new org.apache.hadoop.fs.Path(path)) &&
        fs.listStatus(new org.apache.hadoop.fs.Path(path))
          .exists(_.getPath.getName.startsWith("_bkt="))),
      s"$path is a legacy keyed table (_bkt= layout); compacting it would " +
        "orphan its accumulated keys — run a merge first (which migrates it " +
        "to the manifest layout) instead")
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / (targetMB * 1024L * 1024L)).toInt)
    val tmp = path + ".inprogress"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    swapInto(fs, tmp, path)
  }

  private[sources] def fileSystem(spark: org.apache.spark.sql.SparkSession,
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
  private[sources] def swapInto(fs: org.apache.hadoop.fs.FileSystem,
      staged: String, target: String): Unit = {
    val t = new org.apache.hadoop.fs.Path(target)
    val old = new org.apache.hadoop.fs.Path(target + ".old")
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

  /** The generation manifest a keyed parquet result publishes through.
    * Line-based (`k=v`), one file per generation under `_graft_log/`,
    * committed by an atomic single-file rename — never edited in place.
    *
    * Each bucket maps to an ordered LIST of level directories (oldest →
    * newest, comma-separated on the wire): a merge appends its delta as
    * a new level instead of rewriting the bucket, and the tiering rule
    * in [[mergeIntoKeyedParquet]] keeps the list logarithmic in the
    * bucket's accumulated size. Within a bucket a key may appear in
    * several levels after an upsert; the NEWEST level's row wins —
    * level recency is recoverable from the `b<k>-g<gen>[c]` directory
    * name, which is how [[readKeyedParquet]] and compaction resolve.
    * Pre-level manifests (one dir per bucket) parse as one-element
    * lists, so existing tables upgrade in place.
    */
  private[graft] case class Manifest(gen: Long, buckets: Int,
      dirs: Map[Int, Seq[String]], retired: Seq[String]) {
    def render: String = {
      val b = dirs.toSeq.sortBy(_._1).map { case (k, ds) =>
        s"bucket:$k=${ds.mkString(",")}" }
      (Seq(s"gen=$gen", s"buckets=$buckets") ++ b :+
        s"retired=${retired.mkString(",")}").mkString("", "\n", "\n")
    }
  }

  private[graft] object Manifest {
    def logDir(path: String) = new org.apache.hadoop.fs.Path(path, "_graft_log")

    def parse(text: String): Manifest = {
      val kv = text.linesIterator.filter(_.contains("=")).map { l =>
        val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
      }.toSeq
      Manifest(
        gen = kv.collectFirst { case ("gen", v) => v.toLong }.get,
        buckets = kv.collectFirst { case ("buckets", v) => v.toInt }.get,
        dirs = kv.collect { case (k, v) if k.startsWith("bucket:") =>
          k.stripPrefix("bucket:").toInt -> v.split(",").toSeq }.toMap,
        retired = kv.collectFirst { case ("retired", v) if v.nonEmpty =>
          v.split(",").toSeq }.getOrElse(Nil))
    }

    /** Latest committed generation, or None for a fresh/absent table. */
    def latest(fs: org.apache.hadoop.fs.FileSystem, path: String): Option[Manifest] =
      newest(fs, path, 1).headOption

    /** The newest `n` committed generations, newest first. */
    def newest(fs: org.apache.hadoop.fs.FileSystem, path: String, n: Int): Seq[Manifest] = {
      val log = logDir(path)
      if (!fs.exists(log)) return Nil
      fs.listStatus(log).map(_.getPath)
        .filter(_.getName.startsWith("manifest-"))
        .sortBy(-_.getName.stripPrefix("manifest-").toLong)
        .take(n).toSeq
        .map { p =>
          val in = fs.open(p)
          try parse(new String(
            org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
          finally in.close()
        }
    }

    /** Commit: write to a dot-temp in the log dir, rename to
      * `manifest-<gen>` — a single-file rename, atomic on HDFS/local and a
      * single-object PUT on stores that implement rename that way; readers
      * either see the whole new manifest or the previous one, never a
      * partial file (the dot-prefix keeps the temp out of `latest`).
      */
    def commit(fs: org.apache.hadoop.fs.FileSystem, path: String, m: Manifest): Unit = {
      val log = logDir(path)
      fs.mkdirs(log)
      val tmp = new org.apache.hadoop.fs.Path(log, s".tmp-${m.gen}")
      val out = fs.create(tmp, true)
      try out.write(m.render.getBytes("UTF-8")) finally out.close()
      val dest = new org.apache.hadoop.fs.Path(log, s"manifest-${m.gen}")
      // Single-writer is the contract, but enforce it: HDFS rename fails on
      // an existing destination, while the local FS (POSIX rename) silently
      // OVERWRITES — two racing merges would both compute gen+1 and the
      // later rename would discard the earlier manifest without a sound.
      // Check-then-rename catches the common case; the read-back below
      // catches an overwrite that lands inside the remaining window, so a
      // lost update fails loudly on every filesystem.
      if (fs.exists(dest))
        throw new java.io.IOException(
          s"manifest gen ${m.gen} already committed under $path — concurrent writer")
      if (!fs.rename(tmp, dest))
        throw new java.io.IOException(s"failed to commit manifest gen ${m.gen} under $path")
      val in = fs.open(dest)
      val back = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8") finally in.close()
      if (back != m.render)
        throw new java.io.IOException(
          s"manifest gen ${m.gen} under $path was overwritten by a concurrent " +
            "writer after commit — this merge's generation is lost")
    }
  }

  /** Read the current generation of a manifest-published keyed parquet
    * result ([[mergeIntoKeyedParquet]]): resolve the latest manifest, then
    * read exactly the bucket directories it lists — a consistent whole-
    * generation snapshot however many merges race this read, because data
    * directories are immutable once published (merges write NEW
    * directories and flip the manifest).
    *
    * STALENESS BOUND: the manifest is resolved eagerly but the files are
    * read lazily, and the writer garbage-collects directories no longer
    * referenced by the newest `retainGenerations + 1` manifests (default:
    * this one and the previous). A DataFrame held across MORE merges than
    * that scans deleted directories — a loud FileNotFoundException. Readers
    * that hold results across many triggers should either re-call this per
    * use or have the writer raise `retainGenerations`. The loud failure is
    * part of the contract: `spark.sql.files.ignoreMissingFiles=true` would
    * turn it into silent row loss, so this reader refuses to run under it.
    */
  def readKeyedParquet(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val (m, df) = readKeyedLevels(spark, path)
    if (m.dirs.values.forall(_.size <= 1)) df
    else {
      // multi-level buckets: an upserted key may appear in several
      // levels — resolve newest-generation-wins per key. The level a row
      // came from is recoverable from its file path (`b<k>-g<gen>[c]`),
      // so no schema column is needed and pre-level tables read
      // unchanged through the single-level fast path above.
      import org.apache.spark.sql.functions._
      val key = readKeyColumn(spark, path).getOrElse(throw new IllegalStateException(
        s"multi-level keyed table $path has no _graft_key sidecar — cannot " +
          "resolve upserted keys without the key column"))
      // the generation is PROJECTED before the aggregate: input_file_name()
      // is non-deterministic and the analyzer (correctly) rejects it inside
      // an aggregate function — materialized as a column it is evaluated
      // once per row in the scan projection, exactly where the file path
      // is still known
      // the pattern is anchored to the file's PARENT directory (the level
      // dir is always the last path segment before the part file) — an
      // unanchored match would read the wrong generation from a table
      // whose own root path happens to contain a b<k>-g<n> segment
      val withGen = df.withColumn("_graft_gen",
        regexp_extract(input_file_name(), "b\\d+-g(\\d+)c?/[^/]+$", 1).cast("long"))
      val others = df.columns.filterNot(_ == key)
      withGen.groupBy(col(key))
        .agg(max(struct(col("_graft_gen") +: others.map(col): _*)).as("_r"))
        .select(df.columns.map(c =>
          if (c == key) col(key) else col(s"_r.$c").as(c)).toIndexedSeq: _*)
    }
  }

  /** Key-SET read of a keyed table: every level of every bucket, with NO
    * newest-wins resolution — superseded versions of an upserted key are
    * still present, so only the key column's value set is trustworthy.
    * This is the per-trigger history probe of the incremental dedup
    * streams: their histories are insert-only (every arriving key is
    * anti-joined against the table before it is ever written), so the
    * key set equals the resolved table's and the resolution aggregation
    * [[readKeyedParquet]] would pay per trigger is a corpus-scale no-op.
    */
  def readKeyedParquetKeySet(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    readKeyedLevels(spark, path)._2

  private def readKeyedLevels(spark: org.apache.spark.sql.SparkSession,
      path: String): (Manifest, DataFrame) = {
    // read the boolean Spark itself parsed (trim + case handling included)
    // instead of re-implementing string parsing on the raw conf value —
    // any variant that enables the conf must also trip the guard
    require(!spark.sessionState.conf.ignoreMissingFiles,
      "readKeyedParquet requires spark.sql.files.ignoreMissingFiles=false: a " +
        "snapshot outliving its retained generations must fail loudly, not " +
        "silently drop the rows of garbage-collected buckets")
    val fs = fileSystem(spark, path)
    val m = Manifest.latest(fs, path).getOrElse(
      throw new java.io.FileNotFoundException(s"no manifest under $path"))
    val dirs = m.dirs.values.flatten.toSeq.sorted
    (m, spark.read.parquet(dirs.map(d => s"$path/$d"): _*))
  }

  /** Upsert `batch` (≤ one row per `keyCol` value) into a keyed parquet
    * result split over `buckets` hash buckets — the merge-into-parquet
    * sink for UPDATE-mode streaming: a trigger's delta is APPENDED as a
    * new immutable level of each bucket it hashes into (existing data is
    * neither read nor rewritten), so publish cost scales with the delta,
    * not the accumulated result (complete-mode republish rewrites
    * everything every trigger).
    *
    * Publish protocol (no torn reads, object-store safe): bucket data
    * lives in immutable level directories `b<bucket>-g<gen>[c]`; a merge
    * stages its delta, renames the partitions in as new levels —
    * invisible until referenced — then atomically commits a [[Manifest]]
    * mapping every bucket to its ordered level list. A reader
    * ([[readKeyedParquet]]) resolves ONE manifest and therefore sees ONE
    * whole generation, never bucket 3 new + bucket 7 old (the flaw of
    * per-directory swaps). Directories are garbage-collected only once
    * they fall out of the newest `retainGenerations + 1` manifests, so a
    * reader holding an older manifest has `retainGenerations` full
    * trigger intervals to finish — the documented staleness bound (raise
    * it for slow external readers; the retained cost is only superseded
    * levels, never whole-table copies).
    *
    * Merge cost (LSM tiering): a pure append is metadata-only — O(delta)
    * write + renames. A bucket is COMPACTED when its newest levels have
    * grown comparable to the accumulated delta: the tier rule absorbs the
    * maximal suffix of levels each smaller than `tierFactor` × the bytes
    * accumulated behind it (delta included), the classic logarithmic
    * method — level lists stay logarithmic in the bucket's size and each
    * row is rewritten O(log table/delta) times over the table's life.
    * Compaction resolves upserted keys newest-generation-wins (level
    * recency recovered from the `b<k>-g<gen>[c]` path). Replay after a
    * crash is idempotent (an uncommitted generation's directories are
    * simply overwritten). `tierFactor` trades read amplification (more
    * levels per read) against write amplification (more frequent
    * rewrites); `Double.PositiveInfinity` forces full compaction every
    * merge — deterministic single-level buckets, used by the corruption
    * and retention specs, and the right setting for small always-read
    * tables.
    */
  def mergeIntoKeyedParquet(batch: DataFrame, keyCol: String, path: String,
      buckets: Int = 64, retainGenerations: Int = 1,
      tierFactor: Double = 2.0): Unit = {
    require(tierFactor >= 1.0,
      s"tierFactor must be >= 1 (got $tierFactor): below 1 a fresh delta " +
        "never absorbs even an empty level and level lists grow without bound")
    require(retainGenerations >= 1,
      s"retainGenerations must be >= 1 (got $retainGenerations): with no grace " +
        "generation, a reader that resolved the previous manifest races the GC")
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    val fs = fileSystem(spark, path)
    val tMerge0 = System.nanoTime()
    var statDeltaBytes = 0L
    var statAppendBuckets = 0
    var statCompactBuckets = 0
    var statAbsorbedBytes = 0L
    var statCompactionSec = 0.0
    // Stage the delta to parquet FIRST: the merge below needs several
    // actions (bucket probe, anti-join, write), and each action on a
    // foreachBatch DataFrame re-executes the upstream stateful micro-batch
    // plan (persist() does not reliably intercept it). One write = one
    // execution; the staged delta is tiny (changed keys only) and doubles
    // as the merge's scan source.
    val root = new org.apache.hadoop.fs.Path(path)
    val current = Manifest.latest(fs, path)
    val nBkt = current.map(_.buckets).getOrElse(buckets)
    // one-time migration: a table written by the pre-manifest layout
    // (_bkt= partition dirs, no _graft_log) is folded whole into
    // generation 1 — without this, its accumulated keys would silently
    // vanish behind a fresh manifest that never references them
    val legacyDirs: Seq[String] =
      if (current.isEmpty && fs.exists(root))
        fs.listStatus(root).map(_.getPath.getName)
          .filter(_.startsWith("_bkt=")).toSeq
      else Nil
    // the delta and stage live INSIDE the root as dot-dirs (hidden from
    // parquet directory readers): a crash leaks nothing outside the table,
    // and the scan-based GC below reclaims them
    val delta = s"$path/.delta"
    batch.withColumn("_bkt", pmod(hash(col(keyCol)), lit(nBkt)))
      .write.mode(SaveMode.Overwrite).partitionBy("_bkt").parquet(delta)
    // the staged partition listing IS the affected-bucket probe (the old
    // distinct+collect re-scanned the delta for values the writer already
    // materialized as directory names)
    val deltaBuckets = fs.listStatus(new org.apache.hadoop.fs.Path(delta))
      .map(_.getPath.getName).filter(_.startsWith("_bkt="))
      .map(_.stripPrefix("_bkt=").toInt).toSeq.sorted
    if (deltaBuckets.isEmpty && legacyDirs.isEmpty) {
      // empty trigger: publishing a row-less table would poison every
      // later read ('unable to infer schema') — leave no trace, including
      // the root the in-root delta just created on a fresh table
      fs.delete(new org.apache.hadoop.fs.Path(delta), true)
      if (current.isEmpty && fs.exists(root) && fs.listStatus(root).isEmpty)
        fs.delete(root, false)
      return
    }
    val gen = current.map(_.gen + 1).getOrElse(1L)
    def place(src: String, destName: String): Unit = {
      val d = new org.apache.hadoop.fs.Path(path, destName)
      fs.delete(d, true) // crash-replay leftover from an uncommitted run
      if (!fs.rename(new org.apache.hadoop.fs.Path(src), d))
        throw new java.io.IOException(s"failed to place $destName of generation $gen")
    }
    var newDirs = current.map(_.dirs).getOrElse(Map.empty[Int, Seq[String]])
    var retiredNow = Seq.empty[String]
    if (legacyDirs.nonEmpty) {
      // One-time migration, the only remaining whole-table job: legacy
      // rows + delta, anti-joined and rewritten as the SINGLE level of
      // generation 1. The legacy data is read from its _bkt= dirs
      // EXPLICITLY (basePath keeps partition discovery rooted): scanning
      // the whole root would hit 'conflicting directory structures' on
      // replay after a crash that already renamed some b<k>-g1 dirs in.
      // The dir-name bucket values are DROPPED and recomputed under this
      // table's modulus — the legacy layout's bucket count was never
      // recorded, and trusting it with a different `buckets` argument
      // would strand stale copies of migrated keys in buckets later
      // merges never anti-join. The rename set is what the write
      // ACTUALLY produced (the recomputed modulus can land legacy rows
      // in any bucket and leave others empty — the stage listing is the
      // ground truth).
      // an empty trigger still has to drive the migration forward, but a
      // partitionBy write of zero rows leaves no readable schema — fall
      // back to an empty frame of the batch's own shape
      val b =
        if (deltaBuckets.nonEmpty) spark.read.parquet(delta)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          batch.schema.add(org.apache.spark.sql.types.StructField("_bkt",
            org.apache.spark.sql.types.IntegerType, nullable = true)))
      val legacy = spark.read.option("basePath", path)
        .parquet(legacyDirs.map(d => s"$path/$d"): _*)
        .drop("_bkt")
        .withColumn("_bkt", pmod(hash(col(keyCol)), lit(nBkt)))
      val merged = legacy
        .join(b.select(keyCol), Seq(keyCol), "left_anti")
        .unionByName(b.select(legacy.columns.map(col): _*))
      val stage = s"$path/.stage-g$gen"
      merged.write.mode(SaveMode.Overwrite).partitionBy("_bkt").parquet(stage)
      val staged = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
        .map(_.getPath.getName).filter(_.startsWith("_bkt="))
        .map(_.stripPrefix("_bkt=").toInt).sorted
      staged.foreach(k => place(s"$stage/_bkt=$k", s"b$k-g$gen"))
      newDirs = staged.map(k => k -> Seq(s"b$k-g$gen")).toMap
    } else {
      // LSM append: the delta becomes a NEW LEVEL of each affected
      // bucket — existing data is neither read nor rewritten, so publish
      // cost per trigger is O(delta), not O(table). When every trigger's
      // keys spread over every bucket (any delta larger than the bucket
      // count — the steady state of a crawl stream), the old
      // rewrite-affected-buckets scheme degraded to rewriting the WHOLE
      // table per trigger; measured on the sf1 stream replay, per-batch
      // publish cost grew ~60% across 8 batches on exactly that term.
      // Level lists are kept logarithmic by the classic logarithmic-
      // method tier rule: absorb the maximal suffix of levels each
      // smaller than TWICE the bytes accumulated behind it (delta
      // included), so surviving levels decrease geometrically and every
      // row is rewritten O(log table/delta) times over the table's life.
      def dirBytes(rel: String): Long =
        fs.getContentSummary(new org.apache.hadoop.fs.Path(s"$path/$rel")).getLength
      val plans = deltaBuckets.map { k =>
        val levels = newDirs.getOrElse(k, Nil) // oldest → newest
        var sum = fs.getContentSummary(
          new org.apache.hadoop.fs.Path(s"$delta/_bkt=$k")).getLength
        statDeltaBytes += sum
        var i = levels.length
        while (i > 0 && dirBytes(levels(i - 1)) < tierFactor * sum) {
          sum += dirBytes(levels(i - 1)); i -= 1
        }
        (k, levels.take(i), levels.drop(i))
      }
      // pure appends: the staged delta partition IS the level — rename,
      // zero data movement
      plans.withFilter(_._3.isEmpty).foreach { case (k, keep, _) =>
        place(s"$delta/_bkt=$k", s"b$k-g$gen")
        newDirs += k -> (keep :+ s"b$k-g$gen")
        statAppendBuckets += 1
      }
      // compactions: ONE job over every absorbing bucket — absorbed
      // levels plus their delta partitions, newest generation wins per
      // key (level recency recovered from the b<k>-g<gen>[c] file path;
      // the delta is this generation, strictly newest). The compacted
      // dir takes a 'c' suffix so it can never collide with a same-gen
      // delta level name.
      val compact = plans.filter(_._3.nonEmpty)
      if (compact.nonEmpty) {
        val tCompact0 = System.nanoTime()
        statCompactBuckets = compact.length
        statAbsorbedBytes = compact.flatMap(_._3).map(dirBytes).sum
        val oldRows = spark.read
          .parquet(compact.flatMap(_._3).map(d => s"$path/$d"): _*)
          .withColumn("_graft_gen",
            // anchored to the parent dir (readKeyedParquet's rationale)
            regexp_extract(input_file_name(), "b\\d+-g(\\d+)c?/[^/]+$", 1).cast("long"))
        val deltaRows = spark.read.option("basePath", delta)
          .parquet(compact.map(p => s"$delta/_bkt=${p._1}"): _*)
          .drop("_bkt").withColumn("_graft_gen", lit(gen))
        val all = oldRows.unionByName(deltaRows)
        val others = all.columns.filterNot(c => c == keyCol || c == "_graft_gen")
        val resolved = all.groupBy(col(keyCol))
          .agg(max(struct(col("_graft_gen") +: others.map(col): _*)).as("_r"))
          .select((col(keyCol) +: others.map(c => col(s"_r.$c").as(c))) :+
            pmod(hash(col(keyCol)), lit(nBkt)).as("_bkt"): _*)
        val stage = s"$path/.stage-g$gen"
        resolved.write.mode(SaveMode.Overwrite).partitionBy("_bkt").parquet(stage)
        val staged = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
          .map(_.getPath.getName).filter(_.startsWith("_bkt="))
          .map(_.stripPrefix("_bkt=").toInt).toSet
        // a stage bucket outside the compaction set means some level dir
        // held rows whose key hash does not match its bucket — committing
        // it would repoint that bucket to a strays-only dir and silently
        // drop its other keys, so fail loudly instead
        require(staged == compact.map(_._1).toSet,
          s"bucket invariant violated: compaction covers " +
            s"${compact.map(_._1).mkString(",")} but produced " +
            s"${staged.toSeq.sorted.mkString(",")} — level dirs hold rows whose " +
            "key hash does not match their bucket; repair the table before merging")
        compact.foreach { case (k, keep, absorb) =>
          place(s"$stage/_bkt=$k", s"b$k-g${gen}c")
          newDirs += k -> (keep :+ s"b$k-g${gen}c")
          retiredNow ++= absorb
        }
        statCompactionSec = (System.nanoTime() - tCompact0) / 1e9
      }
    }
    if (current.isEmpty) {
      // same sidecar the JSON sink writes, so Engine.lookup resolves the
      // key column of a parquet result too (underscore = invisible to scans)
      val keyFile = fs.create(new org.apache.hadoop.fs.Path(root, "_graft_key"), true)
      try keyFile.write(keyCol.getBytes("UTF-8")) finally keyFile.close()
    }
    // Migration also reclaims the PREVIOUS layout's external crash
    // leftovers (the old code staged in sibling dirs: .delta, .oldbkt,
    // .stage-gN next to the root) — nothing else ever deletes them. Runs
    // BEFORE the manifest commit: a crash after commit would clear
    // legacyDirs on replay and skip this block forever, while a crash
    // before it replays the whole migration (the _bkt= dirs still exist,
    // so legacyDirs is still non-empty).
    if (legacyDirs.nonEmpty && root.getParent != null && fs.exists(root.getParent)) {
      val base = root.getName
      fs.listStatus(root.getParent).foreach { st =>
        val n = st.getPath.getName
        if (n == s"$base.delta" || n == s"$base.oldbkt" || n == s"$base.inprogress" ||
            n.startsWith(s"$base.stage-g"))
          fs.delete(st.getPath, true)
      }
    }
    Manifest.commit(fs, path, Manifest(gen, nBkt, newDirs, retiredNow))
    // Scan-based GC, not a retired-list walk: everything in the root that
    // none of the newest `retainGenerations + 1` manifests references is
    // garbage — including directories a crashed run left behind at ANY
    // earlier generation, which a one-step-back cleanup would orphan
    // forever. One listStatus of the table root per trigger.
    val DataDir = "^b\\d+-g\\d+c?$".r
    val keep = Manifest.newest(fs, path, retainGenerations + 1)
      .flatMap(_.dirs.values.flatten).toSet
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      val stale =
        (DataDir.findFirstIn(n).isDefined && !keep.contains(n)) ||
          (n.startsWith(".stage-g") &&
            n.stripPrefix(".stage-g").toLongOption.exists(_ <= gen)) ||
          n == ".delta" ||
          // the migrated legacy layout's _bkt= dirs: once ANY manifest
          // exists they are unreferenced by definition (this GC branch is
          // their only deletion path, covering both the normal migration
          // run and a replay after a crash mid-rename)
          n.startsWith("_bkt=")
      if (stale) fs.delete(st.getPath, true)
    }
    fs.listStatus(Manifest.logDir(path)).foreach { st =>
      val n = st.getPath.getName
      val staleManifest = n.startsWith("manifest-") &&
        n.stripPrefix("manifest-").toLongOption.exists(_ < gen - retainGenerations)
      // a crash between creating .tmp-<g> and its rename abandons the temp
      // file; nothing else deletes non-manifest names, so reclaim any temp
      // at or below the committed generation (a racing writer of gen+1 is
      // strictly above and untouched)
      val staleTmp = n.startsWith(".tmp-") &&
        n.stripPrefix(".tmp-").toLongOption.exists(_ <= gen)
      if (staleManifest || staleTmp) fs.delete(st.getPath, false)
    }
    emitMergeStats(MergeStats(path, gen, statDeltaBytes,
      statAppendBuckets, statCompactBuckets, statAbsorbedBytes,
      statCompactionSec, (System.nanoTime() - tMerge0) / 1e9))
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

  /** Clustered parquet: range-partition on `cols`, sort within each
    * partition, write — so every file (and row group) covers a NARROW
    * min/max range of the cluster keys, and parquet's footer statistics
    * let a pushed-down predicate skip whole files/row groups at the scan.
    * The layout-side half of predicate pushdown: pushing a filter into a
    * scan whose every file spans the full key range skips nothing; at
    * 100 TB, clustering the write is what turns a point/range query from
    * a full scan into a few-file read. (Hash-bucketing — [[bucketedTable]]
    * — serves equi-JOIN locality; range-clustering serves range/point
    * FILTER locality; they compose by bucketing on join keys and sorting
    * by filter keys.) ScaleOpsSpec proves the skip with scan metrics: the
    * same point filter reads orders of magnitude fewer rows from the
    * clustered copy than from a round-robin copy. Staged and swapped in
    * like the other sinks, so re-clustering a live table never exposes a
    * partial file set.
    */
  def clusteredParquet(df: DataFrame, path: String,
      cols: Seq[String], shards: Option[Int] = None): Unit = {
    import org.apache.spark.sql.functions.col
    // an explicit shard count pins the file count (AQE coalesces an
    // unpinned range shuffle of a small input down to one file — no
    // ranges, nothing to skip); unpinned, the shard count follows
    // spark.sql.shuffle.partitions + AQE, the right default at scale
    val ranged = shards match {
      case Some(n) => df.repartitionByRange(n, cols.map(col): _*)
      case None => df.repartitionByRange(cols.map(col): _*)
    }
    // normalize before appending the stage suffix: a trailing slash would
    // otherwise put the stage INSIDE the target and the swap would eat it
    val target = new org.apache.hadoop.fs.Path(path).toString
    val tmp = target + ".inprogress"
    ranged.sortWithinPartitions(cols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    swapInto(fileSystem(df.sparkSession, target), tmp, target)
  }

  /** Bucketed catalog table: pre-hash-partitioned (and per-bucket sorted)
    * on the join/group keys, so repeated joins and aggregations on those
    * keys plan with NO exchange — the shuffle is paid once at write time
    * instead of per query. The 100 TB play for fact⋈fact joins Catalyst
    * can't broadcast (see SCALE.md; verified by ScaleOpsSpec asserting an
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
