package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query runs at sf0.001 and satisfies cheap invariants.
  * Exact value parity with DuckDB is the driver's gate (and replicated
  * locally by tools/oracle_check.py); these specs guard plan validity,
  * schema stability, and cross-query consistency.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import SparkTestBase.Sf0001

  test("every declared query executes and is non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, Sf0001).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("wordcount total equals exploded token count") {
    val docs = Tables(spark, Sf0001, "documents")
    val tokenCount = docs
      .select(explode(tokens(cleanLine(col("text")))).as("w")).count()
    val sumCounts = SparkEntry.queries("wordcount")(spark, Sf0001)
      .agg(sum("cnt")).head().getLong(0)
    assert(sumCounts == tokenCount)
  }

  test("inverted index: docs listed for a word actually contain it") {
    val docs = Tables(spark, Sf0001, "documents")
    // `docs` is a comma-joined STRING (driver-hashable form) — split it back
    val idx = SparkEntry.queries("inverted_index")(spark, Sf0001)
      .filter(col("word") === "spark")
      .select(explode(split(col("docs"), ",")).as("d"))
      .select(col("d").cast("long").as("doc_id"))
    val expected = docs
      .filter(array_contains(tokens(cleanLine(col("text"))), "spark"))
      .select(col("doc_id").cast("long").as("doc_id"))
    assert(idx.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(idx).count() == 0)
  }

  test("reduce-UDF wordcount equals built-in wordcount") {
    val viaUdaf = SparkEntry.queries("reduce_udaf")(spark, Sf0001)
    val builtin = SparkEntry.queries("wordcount")(spark, Sf0001)
    assert(viaUdaf.exceptAll(builtin).count() == 0)
    assert(builtin.exceptAll(viaUdaf).count() == 0)
  }

  test("tokenless document degrades to NULL ratios instead of crashing") {
    // the pipeline-level regression for the ANSI fix: a punctuation-only
    // doc has zero tokens, so stopword_ratio divides by zero — must yield
    // NULL (matching the oracle), not SparkArithmeticException
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    Seq((1L, "!!! ???", "en", "synth", 7L),
        (2L, "real words appear here", "en", "synth", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val rows = SparkEntry.queries("text_quality")(spark, dir).collect()
    assert(rows.length == 2)
    val tokenless = rows.find(_.getLong(0) == 1L).get
    assert(tokenless.isNullAt(tokenless.fieldIndex("stopword_ratio")))
    assert(!rows.find(_.getLong(0) == 2L).get.isNullAt(
      rows.head.fieldIndex("stopword_ratio")))
  }

  test("ngram-jaccard hot-shingle cap fires: a df>100 shingle creates no pairs") {
    // 120 docs share exactly one shingle ("xx yy zz", df=120 > MaxShingleDf);
    // every other shingle is unique per doc. With the cap, the hot bucket is
    // dropped BEFORE the self-join and no pairs survive; without it, every
    // doc pair would emit (jaccard = 1/(3+3-1) = 0.2 >= threshold -> 7140
    // rows and an O(n^2) bucket)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hot").toString
    (0 until 120).map(i => (i.toLong, s"xx yy zz a$i b$i", "en", "synth", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    assert(SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).count() == 0,
      "hot-shingle bucket must be dropped before the self-join")
  }

  test("result is invariant to input partitioning") {
    val docs = Tables(spark, Sf0001, "documents")
    val base = docs
      .select(explode(tokens(cleanLine(col("text")))).as("w"))
      .groupBy("w").count()
    val repart = docs.repartition(13)
      .select(explode(tokens(cleanLine(col("text")))).as("w"))
      .groupBy("w").count()
    assert(base.exceptAll(repart).count() == 0)
    assert(repart.exceptAll(base).count() == 0)
  }
}
