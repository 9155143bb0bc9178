package graft.sources

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Directory text-corpus source (reference `master.py:63-71`,
  * `generate_dataset`): every file under `dir` becomes rows of
  * `(doc: STRING, line: STRING)` — `doc` is the file's base name, matching
  * the reference's dict-of-docs keying.
  *
  * Unlike the reference (whole corpus into driver memory, then re-uploaded
  * to the KV store), this is a distributed scan: Spark's split planning
  * parallelizes over files/blocks, and downstream filters prune at the
  * reader.
  */
object CorpusReader {

  /** Raw (doc, line) rows. */
  def raw(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir)
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("doc"),
        col("value").as("line"))

  /** Cleaned corpus (reference `master.py:44-61`): punctuation-strip → trim
    * → lowercase → ASCII-fold, blank lines dropped.
    */
  def cleaned(spark: SparkSession, dir: String): DataFrame =
    raw(spark, dir)
      .select(col("doc"), cleanLine(col("line")).as("line"))
      .filter(length(col("line")) > 0)
}
