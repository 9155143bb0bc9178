package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's text-processing surface re-expressed over the `documents`
  * table: cleanup projection, wordcount, inverted index, point lookup
  * (reference `wordcount_map/reduce.py`, `invertedindex_map/reduce.py`,
  * `master.py:44-61`; PDF Part 2 "Streaming Search" for the lookup).
  *
  * All pipelines are `explode(split(...))` → `groupBy` — Spark's partial
  * aggregation (map-side combine) replaces the reference's per-mapper
  * list-of-1s / set-dedup buffers (SURVEY.md §2.4 A1–A5, quirk Q5).
  */
object TextQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference cleanup chain as a projection (P1–P5) ----
    "text_cleanup" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), cleanLine(col("text")).as("cleaned"))
        .filter(length(col("cleaned")) > 0)
        .orderBy("doc_id")
    }),

    // ---- wordcount (A1–A3): tokenize → count per word ----
    "wordcount" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(explode(tokens(cleanLine(col("text")))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("word")
    }),

    // ---- faithful-mode wordcount (quirk Q1: only a–z-leading tokens) ----
    "wordcount_faithful" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(explode(tokens(cleanLine(col("text")))).as("word"))
        .filter(azLeading(col("word")))
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("word")
    }),

    // ---- inverted index (A4–A5): word → sorted distinct doc list ----
    // The doc list is emitted as a comma-joined STRING (not ARRAY<BIGINT>):
    // the driver's pandas-based compare cannot sort/hash array cells. The
    // array form stays available via TextPipelines.invertedIndex.
    //
    // The aggregation goes through
    // [[graft.operators.Skew.saltedCollectSetHybrid]] (two-phase,
    // value-derived salt, hot keys only): stopword posting lists are the
    // textbook hot key — at 100× one word's doc list would otherwise
    // concentrate a task's entire state — and the salted form bounds any
    // single task to ~1/16 of a hot key's values. The rare-word tail skips
    // the salt (salt 0 → one phase-1 group per key), so the second shuffle
    // carries one tiny row per cold key instead of taxing every key; the
    // result stays value-identical to sort_array(collect_set(...))
    // (ScaleOpsSpec) whichever route a key takes.
    "inverted_index" -> ((s, dir) => {
      val pairs = Tables(s, dir, "documents")
        .select(explode(tokens(cleanLine(col("text")))).as("word"), col("doc_id"))
      graft.operators.Skew.saltedCollectSetHybrid(pairs, col("word"), col("doc_id"))
        .select(col("key").as("word"),
          concat_ws(",", transform(col("values"), d => d.cast("string"))).as("docs"))
        .orderBy("word")
    }),

    // ---- inverted index, flat pair form (the mapper-output shape, A4) ----
    "inverted_index_pairs" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(explode(tokens(cleanLine(col("text")))).as("word"), col("doc_id"))
        .distinct()
        .orderBy("word", "doc_id")
    }),

    // ---- reduce-UDF surface (SURVEY §2.10): wordcount via a user
    // Aggregator registered through functions.udaf — same result as the
    // built-in count, but through the pluggable-reducer path the reference
    // exposes (`reducer.py:100`). Verifies the udaf plans as a real
    // partial/final aggregate with correct values. ----
    "reduce_udaf" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(explode(tokens(cleanLine(col("text")))).as("word"))
        .groupBy("word")
        .agg(graft.functions.Reducers.sumValues(lit(1L)).as("cnt"))
        .orderBy("word")
    }),

    // ---- point lookup on the index (P7, PDF Part 2 "Streaming Search") ----
    "point_lookup" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(explode(tokens(cleanLine(col("text")))).as("word"), col("doc_id"))
        .filter(col("word") === "spark")
        .groupBy("word")
        .agg(concat_ws(",",
          transform(sort_array(collect_set(col("doc_id"))), d => d.cast("string"))).as("docs"))
    })
  )

  private val cleanedSql = cleanLineSql("text")

  /** Exploded (word, doc_id) relation, shared by the oracle queries. */
  private val explodedSql =
    s"""SELECT unnest(${tokensSql(cleanedSql)}) AS word, doc_id FROM documents"""

  def oracles: Map[String, String] = Map(
    "text_cleanup" ->
      s"""SELECT doc_id, $cleanedSql AS cleaned FROM documents
         |WHERE length($cleanedSql) > 0 ORDER BY doc_id""".stripMargin,

    "wordcount" ->
      s"""SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM ($explodedSql)
         |GROUP BY word ORDER BY word""".stripMargin,

    "wordcount_faithful" ->
      s"""SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM ($explodedSql)
         |WHERE substring(word, 1, 1) BETWEEN 'a' AND 'z'
         |GROUP BY word ORDER BY word""".stripMargin,

    "inverted_index" ->
      s"""SELECT word, array_to_string(list(DISTINCT doc_id ORDER BY doc_id), ',') AS docs
         |FROM ($explodedSql) GROUP BY word ORDER BY word""".stripMargin,

    "inverted_index_pairs" ->
      s"""SELECT DISTINCT word, doc_id FROM ($explodedSql)
         |ORDER BY word, doc_id""".stripMargin,

    "reduce_udaf" ->
      s"""SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM ($explodedSql)
         |GROUP BY word ORDER BY word""".stripMargin,

    "point_lookup" ->
      s"""SELECT word, array_to_string(list(DISTINCT doc_id ORDER BY doc_id), ',') AS docs
         |FROM ($explodedSql) WHERE word = 'spark' GROUP BY word""".stripMargin
  )
}
