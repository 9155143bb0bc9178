package graft

import graft.operators.TextPipelines
import graft.sources.{CorpusReader, Sinks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Job configuration — the useful subset of the reference's `config.json`
  * (`master.py:215-216`). `mapperCount`/`reducerCount` collapse into one
  * `partitions` knob (input partitions = shuffle partitions); 0 = leave
  * Spark's defaults alone. `faithful` reproduces reference quirks Q1/Q2.
  */
case class JobConfig(
    operation: String,
    inputPath: String,
    outputPath: String,
    partitions: Int = 0,
    faithful: Boolean = false,
    pretty: Boolean = false)

object JobConfig {

  /** Load a job from a JSON config file — the reference boots from
    * `config.json` (`master.py:215-216`). Accepts both this library's field
    * names (`operation`, `inputPath`, …) and the reference's
    * (`operation_name`, `raw_input_data_path`, `mapper_count`), so a
    * reference config ports without editing. Parsed with `spark.read.json`
    * — no extra dependency, and schema inference handles either spelling.
    */
  def fromJsonFile(spark: SparkSession, path: String): JobConfig = {
    val row = spark.read.option("multiLine", "true").json(path).head()
    // match on the runtime value, not an erased getAs[T]: foreign configs
    // carry loosely-typed fields ("3" vs 3 vs 3.0) and a bad value should
    // fail HERE naming the field, not as a ClassCastException downstream
    def raw(names: String*): Option[(String, Any)] = names.iterator
      .filter(row.schema.fieldNames.contains)
      .map(n => n -> row.get(row.fieldIndex(n)))
      .collectFirst { case (n, v) if v != null => (n, v) }
    def str(names: String*): String = raw(names: _*) match {
      case Some((_, s: String)) => s
      case Some((n, other)) => throw new IllegalArgumentException(
        s"config $path: field $n must be a string, got $other")
      case None => throw new IllegalArgumentException(
        s"config $path missing required field (any of: ${names.mkString(", ")})")
    }
    def int(names: String*): Int = raw(names: _*) match {
      case Some((_, l: java.lang.Long)) => l.toInt
      case Some((_, d: java.lang.Double)) => d.toInt
      case Some((n, s: String)) => scala.util.Try(s.trim.toInt).getOrElse(
        throw new IllegalArgumentException(s"config $path: field $n is not a number: $s"))
      case Some((n, other)) => throw new IllegalArgumentException(
        s"config $path: field $n must be a number, got $other")
      case None => 0
    }
    def bool(names: String*): Boolean = raw(names: _*) match {
      case Some((_, b: java.lang.Boolean)) => b
      case Some((_, s: String)) if s.trim.equalsIgnoreCase("true") => true
      case Some((_, s: String)) if s.trim.equalsIgnoreCase("false") => false
      case Some((n, other)) => throw new IllegalArgumentException(
        s"config $path: field $n must be a boolean, got $other")
      case None => false
    }
    JobConfig(
      operation = str("operation", "operation_name"),
      inputPath = str("inputPath", "raw_input_data_path"),
      outputPath = str("outputPath", "output_data_path"),
      partitions = int("partitions", "mapper_count"),
      faithful = bool("faithful"),
      pretty = bool("pretty", "pretty_json"))
  }
}

/** Name → pipeline dispatch, replacing the reference's triplicated
  * `import_module` registries (`master.py:26-42`, `mapper.py:9-25`,
  * `reducer.py:9-25`). Users register a whole DataFrame pipeline — the
  * analog of the map/reduce function pair, but optimizer-visible.
  */
object OperationRegistry {
  type Pipeline = (DataFrame, Boolean) => DataFrame

  @volatile private var ops: Map[String, Pipeline] = Map(
    "wordcount" -> ((corpus, faithful) => TextPipelines.wordCount(corpus, faithful)),
    "invertedindex" -> ((corpus, faithful) => TextPipelines.invertedIndex(corpus, faithful)))

  def register(name: String, pipeline: Pipeline): Unit =
    synchronized { ops = ops + (name -> pipeline) }

  def apply(name: String): Pipeline =
    ops.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown operation '$name' (registered: ${ops.keys.toSeq.sorted.mkString(", ")})"))

  def names: Seq[String] = ops.keys.toSeq.sorted
}

/** Engine entry points — the Spark restatement of the reference's whole
  * master/KV-store/worker lifecycle (EP1/EP3, `master.py:210-301`): one
  * declarative job replaces VM provisioning, the pickle shuffle, ACK
  * barriers, and the `combine` merge.
  */
object Engine {

  /** Run a configured job end-to-end: scan+clean → pipeline → sorted
    * single-file JSON sink. Returns the result for further composition.
    * `pretty = true` additionally writes `_final_output.json` inside the
    * output directory — byte-for-byte the reference's
    * `json.dump(dict(sorted(...)), fp, indent=4)` artifact (quirk Q3
    * caveat: doc-list ORDER inside a value is this engine's deterministic
    * sorted order; the reference left it nondeterministic).
    */
  def run(spark: SparkSession, config: JobConfig): DataFrame = {
    val corpus0 = CorpusReader.cleaned(spark, config.inputPath)
    val corpus = if (config.partitions > 0) corpus0.repartition(config.partitions) else corpus0
    val result = OperationRegistry(config.operation)(corpus, config.faithful)
    Sinks.sortedSingleFileJson(result, result.columns.head, config.outputPath)
    if (config.pretty)
      // render from the just-published small artifact — rendering from
      // `result` would re-execute the whole uncached pipeline (same
      // reasoning as Main.runJob's count)
      Sinks.prettySingleObjectJson(fetchResult(spark, config.outputPath),
        result.columns.head, config.outputPath + "/_final_output.json")
    // Job complete — the sink has fully executed, so any checkpoints a
    // registered pipeline retired are releasable NOW. Without this a
    // long-lived serving session that runs retiring operations
    // accumulates blocks for the session's life (the r9 bench failure
    // mode, one integration away — r10 VERDICT "What's missing #2").
    // Callers composing further read the PUBLISHED artifact
    // ([[fetchResult]], as Main does); re-executing `result` itself after
    // the drain is unsupported for retiring pipelines (lineage is
    // truncated at the checkpoint).
    graft.operators.Checkpoints.drain()
    result
  }

  /** S9 end-to-end (reference PDF Part 2): a file-arrival stream re-runs
    * the configured operation and republishes the sorted single-file JSON
    * result every trigger — upload → recompute → result queryable at any
    * time via [[fetchResult]]/[[lookup]]. Complete-mode `foreachBatch`
    * hands the full recomputed result to the same sink `run` uses, so
    * batch and streaming outputs are byte-compatible.
    *
    * The checkpoint lives beside the output (`outputPath + ".checkpoint"`):
    * a restarted stream resumes from the last committed file offsets
    * instead of re-reading the whole corpus. For the 100-TB-stream path
    * whose publish cost scales with the delta instead of the result, see
    * [[runStreamIncremental]].
    */
  def runStream(spark: SparkSession, config: JobConfig) = {
    val result = graft.streaming.StreamingPipelines.operationStream(
      spark, config.inputPath, config.operation, config.faithful)
    result.writeStream
      .outputMode("complete")
      .option("checkpointLocation", config.outputPath + ".checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.sortedSingleFileJson(batch, batch.columns.head, config.outputPath)
      }
      .start()
  }

  /** Scale-path streaming: the same registered operation in UPDATE mode,
    * merged incrementally into a bucket-partitioned parquet result
    * ([[Sinks.mergeIntoKeyedParquet]]). Each trigger emits only the keys
    * whose aggregate changed and rewrites only the bucket directories
    * those keys hash into — publish cost scales with the delta, while
    * complete-mode [[runStream]] re-sorts and rewrites the entire result
    * every trigger (reference-faithful, kept as the default).
    *
    * Registered pipelines end with a global `orderBy` (the reference's
    * sorted-artifact contract), which update-mode streams reject — the
    * top-level Sort is dropped from the logical plan here (a keyed
    * parquet table has no meaningful row order; readers sort on demand).
    */
  def runStreamIncremental(spark: SparkSession, config: JobConfig) = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Sort, SubqueryAlias}
    // peel the first global Sort off the top of the plan, looking through
    // the benign wrappers a pipeline may stack above it (a trailing
    // .select/.withColumnRenamed/.as leaves Project/SubqueryAlias over the
    // Sort). Deeper sorts (e.g. under a Limit = top-k) are left alone —
    // they are semantic, and update mode will reject them loudly rather
    // than have us silently change the query.
    def stripTopSort(plan: LogicalPlan): Option[LogicalPlan] = plan match {
      case Sort(_, true, child, _) => Some(child)
      case p: Project => stripTopSort(p.child).map(c => p.withNewChildren(Seq(c)))
      case a: SubqueryAlias => stripTopSort(a.child).map(c => a.withNewChildren(Seq(c)))
      case _ => None
    }
    val result = graft.streaming.StreamingPipelines.operationStream(
      spark, config.inputPath, config.operation, config.faithful)
    val unsorted = stripTopSort(result.queryExecution.logical)
      .map(graft.bridge.SparkInternals.ofRows(spark, _))
      .getOrElse(result)
    val key = unsorted.columns.head
    unsorted.writeStream
      .outputMode("update")
      .option("checkpointLocation", config.outputPath + ".checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.mergeIntoKeyedParquet(batch, key, config.outputPath)
      }
      .start()
  }

  /** EP2 analog (`GET /final_output`): read back a stored result — the
    * JSON artifact [[run]] publishes, or the manifest-published keyed
    * parquet table [[runStreamIncremental]] maintains (detected by its
    * `_graft_log` manifest directory; the read resolves ONE manifest, so
    * it sees one whole generation even while a merge publishes).
    */
  def fetchResult(spark: SparkSession, resultPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(resultPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new org.apache.hadoop.fs.Path(p, "_graft_log")))
      Sinks.readKeyedParquet(spark, resultPath)
    else {
      val legacyDirs =
        if (fs.exists(p))
          fs.listStatus(p).map(_.getPath.getName).filter(_.startsWith("_bkt="))
        else Array.empty[String]
      if (legacyDirs.nonEmpty)
        // pre-manifest layout (upgraded in place by the next merge): the
        // bucket id is a partition column here, not data. The _bkt= dirs
        // are read EXPLICITLY — a whole-root scan would fail with
        // 'conflicting directory structures' in the window where a
        // crashed migration already renamed some b<k>-g1 dirs in but
        // never committed a manifest.
        spark.read.option("basePath", resultPath)
          .parquet(legacyDirs.sorted.map(d => s"$resultPath/$d").toIndexedSeq: _*)
          .drop("_bkt")
      else spark.read.json(resultPath)
    }
  }

  /** PDF Part-2 "Streaming Search" (P7): point lookup of one key in a
    * stored result. The key column resolves, in order: explicit `keyCol`
    * argument → the `_graft_key` sidecar the sink records (authoritative
    * for any registered operation) → the first STRING-typed column
    * (`spark.read.json` orders inferred columns alphabetically, so the
    * positional first column of the read-back result is NOT the sink's
    * key — for wordcount it would be `count`).
    */
  def lookup(spark: SparkSession, resultPath: String, term: String,
      keyCol: String = ""): DataFrame = {
    val df = fetchResult(spark, resultPath)
    val key =
      if (keyCol.nonEmpty) keyCol
      else Sinks.readKeyColumn(spark, resultPath)
        .orElse(df.schema.fields.find(_.dataType == org.apache.spark.sql.types.StringType).map(_.name))
        .getOrElse(df.columns.head)
    df.filter(col(key) === term)
  }
}
