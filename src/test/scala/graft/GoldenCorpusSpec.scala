package graft

import graft.operators.TextPipelines
import graft.sources.CorpusReader
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** End-to-end parity with the reference's own corpus and committed golden
  * output (reference `raw-dataset/doc{1..4}.txt` →
  * `kv-data-store/final-output/final-output-wordcount.json`, 16,107 words,
  * Σ counts = 221,070 — FIXTURES.md A5). Faithful mode applies quirk Q1
  * (a–z-leading tokens only).
  */
class GoldenCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val CorpusDir = "/root/reference/raw-dataset"
  private val GoldenFile =
    "/root/reference/kv-data-store/final-output/final-output-wordcount.json"

  /** The golden file is `{ "word": count, ... }` pretty-printed one pair per
    * line — parse with a line regex (no JSON lib in the dependency set).
    */
  private lazy val golden: Map[String, Long] = {
    val Entry = """\s*"(.*)":\s*(\d+),?\s*""".r
    val src = Source.fromFile(GoldenFile)
    try src.getLines().collect { case Entry(w, c) => w -> c.toLong }.toMap
    finally src.close()
  }

  private lazy val computed: Map[String, Long] =
    TextPipelines.wordCount(CorpusReader.cleaned(spark, CorpusDir), faithful = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("golden wordcount: cardinality and total match the reference run") {
    assert(golden.size == 16107)
    assert(golden.values.sum == 221070L)
  }

  test("pretty sink reproduces the reference's committed artifact BYTE-for-byte") {
    // the strongest parity claim available: same corpus in, identical
    // bytes out against the artifact the reference engine itself wrote
    // (json.dump(dict(sorted(...)), indent=4) — S5/kv_store_server.py)
    val out = java.nio.file.Files.createTempDirectory("graft-golden-out").toString + "/wc"
    Engine.run(spark,
      JobConfig("wordcount", CorpusDir, out, faithful = true, pretty = true))
    val ours = java.nio.file.Files.readString(java.nio.file.Path.of(out, "_final_output.json"))
    val goldenBytes = java.nio.file.Files.readString(java.nio.file.Path.of(GoldenFile))
    assert(ours.length == goldenBytes.length,
      s"length ${ours.length} vs golden ${goldenBytes.length}")
    val firstDiff = ours.zip(goldenBytes).indexWhere { case (a, b) => a != b }
    assert(firstDiff == -1,
      s"first byte diff at $firstDiff: ...${ours.slice(firstDiff - 40, firstDiff + 40)}...")
  }

  test("faithful wordcount reproduces the reference's committed output exactly") {
    val missing = golden.keySet -- computed.keySet
    val extra = computed.keySet -- golden.keySet
    assert(missing.isEmpty, s"words missing vs golden (sample): ${missing.take(10)}")
    assert(extra.isEmpty, s"extra words vs golden (sample): ${extra.take(10)}")
    val wrong = golden.collect {
      case (w, c) if computed(w) != c => (w, c, computed(w))
    }
    assert(wrong.isEmpty, s"count mismatches (sample): ${wrong.take(10)}")
  }

  test("default mode additionally keeps digit-leading tokens (quirk Q1 fixed)") {
    val all = TextPipelines.wordCount(CorpusReader.cleaned(spark, CorpusDir))
    val digitLeading = all.filter(!substring(col("word"), 1, 1).between("a", "z")).count()
    assert(digitLeading > 0, "expected digit-leading tokens in default mode")
  }

  test("inverted index: 'the' appears in all four docs, lists sorted") {
    val idx = TextPipelines.invertedIndex(CorpusReader.cleaned(spark, CorpusDir))
    val docs = idx.filter(col("word") === "the")
      .head().getSeq[String](1)
    assert(docs == docs.sorted)
    assert(docs.toSet == Set("doc1.txt", "doc2.txt", "doc3.txt", "doc4.txt"))
  }
}
