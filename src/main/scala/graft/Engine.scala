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
    faithful: Boolean = false)

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
    def opt[T](names: String*): Option[T] = names.iterator
      .flatMap(n => scala.util.Try(row.getAs[T](n)).toOption)
      .collectFirst { case v if v != null => v }
    def req(names: String*): String = opt[String](names: _*).getOrElse(
      throw new IllegalArgumentException(
        s"config $path missing required field (any of: ${names.mkString(", ")})"))
    JobConfig(
      operation = req("operation", "operation_name"),
      inputPath = req("inputPath", "raw_input_data_path"),
      outputPath = req("outputPath", "output_data_path"),
      partitions = opt[Long]("partitions", "mapper_count").map(_.toInt).getOrElse(0),
      faithful = opt[Boolean]("faithful").getOrElse(false))
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
    */
  def run(spark: SparkSession, config: JobConfig): DataFrame = {
    val corpus0 = CorpusReader.cleaned(spark, config.inputPath)
    val corpus = if (config.partitions > 0) corpus0.repartition(config.partitions) else corpus0
    val result = OperationRegistry(config.operation)(corpus, config.faithful)
    Sinks.sortedSingleFileJson(result, result.columns.head, config.outputPath)
    result
  }

  /** S9 end-to-end (reference PDF Part 2): a file-arrival stream re-runs
    * the configured operation and republishes the sorted single-file JSON
    * result every trigger — upload → recompute → result queryable at any
    * time via [[fetchResult]]/[[lookup]]. Complete-mode `foreachBatch`
    * hands the full recomputed result to the same sink `run` uses, so
    * batch and streaming outputs are byte-compatible.
    */
  def runStream(spark: SparkSession, config: JobConfig) = {
    val result = graft.streaming.StreamingPipelines.operationStream(
      spark, config.inputPath, config.operation, config.faithful)
    result.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.sortedSingleFileJson(batch, batch.columns.head, config.outputPath)
      }
      .start()
  }

  /** EP2 analog (`GET /final_output`): read back a stored result. */
  def fetchResult(spark: SparkSession, resultPath: String): DataFrame =
    spark.read.json(resultPath)

  /** PDF Part-2 "Streaming Search" (P7): point lookup of one key in a
    * stored result. `keyCol` defaults to the result's first STRING-typed
    * column: `spark.read.json` orders inferred columns alphabetically, so
    * the positional first column of the read-back result is NOT the sink's
    * key column (for wordcount it would be `count`).
    */
  def lookup(spark: SparkSession, resultPath: String, term: String,
      keyCol: String = ""): DataFrame = {
    val df = fetchResult(spark, resultPath)
    val key =
      if (keyCol.nonEmpty) keyCol
      else df.schema.fields.find(_.dataType == org.apache.spark.sql.types.StringType)
        .map(_.name).getOrElse(df.columns.head)
    df.filter(col(key) === term)
  }
}
