package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's two built-in operations as declarative DataFrame
  * pipelines over a cleaned `(doc, line)` corpus.
  *
  * WordCount (reference `wordcount_map.py` + `wordcount_reduce.py`): the
  * per-mapper list-of-1s buffer and the reducer sum collapse into Spark's
  * partial→final `HashAggregateExec` — map-side combine the reference's
  * wordcount never had (SURVEY.md quirk Q5), for free.
  *
  * InvertedIndex (reference `invertedindex_map.py` + `invertedindex_reduce
  * .py`): per-mapper set-dedup + reducer set-union become `dropDuplicates`
  * inside `collect_set`'s partial aggregation; `sort_array` pins the
  * doc-list order the reference left nondeterministic (quirk Q3).
  *
  * `faithful = true` reproduces quirk Q1 (`reducer.py:28`): the reference's
  * a–z shuffle silently drops digit-leading tokens.
  */
object TextPipelines {

  private def words(corpus: DataFrame, faithful: Boolean): DataFrame = {
    val w = corpus.select(col("doc"), explode(tokens(col("line"))).as("word"))
    if (faithful) w.filter(azLeading(col("word"))) else w
  }

  /** word → occurrence count, key-sorted. */
  def wordCount(corpus: DataFrame, faithful: Boolean = false): DataFrame =
    words(corpus, faithful)
      .groupBy("word")
      .agg(count(lit(1)).as("count"))
      .orderBy("word")

  /** word → sorted distinct doc list, key-sorted. */
  def invertedIndex(corpus: DataFrame, faithful: Boolean = false): DataFrame =
    words(corpus, faithful)
      .groupBy("word")
      .agg(sort_array(collect_set(col("doc"))).as("docs"))
      .orderBy("word")
}
