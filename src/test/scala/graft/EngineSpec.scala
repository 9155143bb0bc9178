package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine.run / fetchResult / lookup / OperationRegistry round-trips
  * (EP1/EP2/EP3 analogs).
  */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmpCorpus(): String = {
    val dir = Files.createTempDirectory("graft-corpus")
    Files.writeString(dir.resolve("a.txt"), "Hello, world!\nhello AGAIN.\n\n")
    Files.writeString(dir.resolve("b.txt"), "the World spins\n")
    dir.toString
  }

  test("gzip-compressed corpus files read transparently (crawl-dump format)") {
    // real crawl corpora arrive as .txt.gz / .warc.gz; spark.read.text
    // decompresses by extension, so the whole engine surface works on
    // compressed input unchanged — pinned here so a CorpusReader rewrite
    // cannot silently drop it. (Gzip is not splittable: one file = one
    // task, so a 100-TB corpus wants many files, not one big archive.)
    val dir = Files.createTempDirectory("graft-gz")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("a.txt.gz")))
    try gz.write("Hello, world!\nhello again.\n".getBytes("UTF-8")) finally gz.close()
    Files.writeString(dir.resolve("b.txt"), "the world spins\n") // mixed plain+gz
    val out = Files.createTempDirectory("graft-gz-out").toString + "/wc"
    Engine.run(spark, JobConfig("wordcount", dir.toString, out))
    val counts = Engine.fetchResult(spark, out)
      .collect().map(r => r.getAs[String]("word") -> r.getAs[Long]("count")).toMap
    assert(counts == Map("hello" -> 2L, "world" -> 2L, "again" -> 1L,
      "the" -> 1L, "spins" -> 1L), counts.toString)
  }

  test("pretty sink is byte-identical to json.dump(dict(sorted(...)), indent=4)") {
    // golden strings produced by CPython's json.dumps(obj, indent=4);
    // doc-list order inside values is this engine's deterministic sorted
    // order (quirk Q3: the reference left it nondeterministic)
    val corpus = tmpCorpus()
    val outWc = Files.createTempDirectory("graft-out").toString + "/wc"
    Engine.run(spark, JobConfig("wordcount", corpus, outWc, pretty = true))
    val wcBytes = Files.readString(java.nio.file.Path.of(outWc, "_final_output.json"))
    assert(wcBytes ==
      "{\n    \"again\": 1,\n    \"hello\": 2,\n    \"spins\": 1,\n    \"the\": 1,\n    \"world\": 2\n}")

    val outIdx = Files.createTempDirectory("graft-out").toString + "/idx"
    Engine.run(spark, JobConfig("invertedindex", corpus, outIdx, pretty = true))
    val idxBytes = Files.readString(java.nio.file.Path.of(outIdx, "_final_output.json"))
    assert(idxBytes ==
      "{\n    \"again\": [\n        \"a.txt\"\n    ],\n    \"hello\": [\n        \"a.txt\"\n    ],\n    \"spins\": [\n        \"b.txt\"\n    ],\n    \"the\": [\n        \"b.txt\"\n    ],\n    \"world\": [\n        \"a.txt\",\n        \"b.txt\"\n    ]\n}")

    // the hidden artifact must not corrupt the JSON-lines read path
    assert(Engine.fetchResult(spark, outWc).count() == 5)
  }

  test("Engine.run wordcount end-to-end: sorted single-file JSON result") {
    val out = Files.createTempDirectory("graft-out").toString + "/wc"
    val result = Engine.run(spark, JobConfig("wordcount", tmpCorpus(), out))
    val expected = Map("hello" -> 2L, "world" -> 2L, "again" -> 1L, "the" -> 1L, "spins" -> 1L)
    assert(result.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expected)

    // exactly one part file, readable back, key-sorted
    val parts = new java.io.File(out).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
    val back = Engine.fetchResult(spark, out)
    assert(back.count() == 5)
    val keys = spark.read.text(parts.head.getPath)
      .collect().map(_.getString(0)).toSeq
    assert(keys == keys.sorted, "single-file JSON must be written key-sorted")
  }

  test("Engine.lookup finds a single term (P7)") {
    val out = Files.createTempDirectory("graft-out").toString + "/wc2"
    Engine.run(spark, JobConfig("wordcount", tmpCorpus(), out))
    val hit = Engine.lookup(spark, out, "hello").collect()
    assert(hit.length == 1 && hit.head.getAs[Long]("count") == 2L)
    assert(Engine.lookup(spark, out, "absent").isEmpty)
  }

  test("invertedindex operation via registry") {
    val out = Files.createTempDirectory("graft-out").toString + "/idx"
    val result = Engine.run(spark, JobConfig("invertedindex", tmpCorpus(), out))
    val docs = result.filter(col("word") === "world").head().getSeq[String](1)
    assert(docs == Seq("a.txt", "b.txt"))
  }

  test("unknown operation fails with the registered names") {
    val e = intercept[IllegalArgumentException] {
      Engine.run(spark, JobConfig("nope", tmpCorpus(), "/tmp/never"))
    }
    assert(e.getMessage.contains("invertedindex"))
  }

  test("user-registered operation dispatches like built-ins") {
    OperationRegistry.register("linecount",
      (corpus, _) => corpus.groupBy("doc").count().orderBy("doc"))
    val out = Files.createTempDirectory("graft-out").toString + "/lc"
    val result = Engine.run(spark, JobConfig("linecount", tmpCorpus(), out))
    assert(result.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a.txt" -> 2L, "b.txt" -> 1L))
  }

  test("reduce-UDF surface: custom Aggregator through udaf + registry (SURVEY §2.10)") {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.expressions.Aggregator
    // a user reducer the built-ins don't cover: the word with the highest
    // count per first-letter group (ties → lexicographically greatest)
    object MaxCountWord extends Aggregator[(String, Long), (String, Long), String] {
      def zero: (String, Long) = ("", -1L)
      def reduce(b: (String, Long), a: (String, Long)): (String, Long) =
        if (a._2 > b._2 || (a._2 == b._2 && a._1 > b._1)) a else b
      def merge(b1: (String, Long), b2: (String, Long)): (String, Long) = reduce(b1, b2)
      def finish(b: (String, Long)): String = b._1
      def bufferEncoder: Encoder[(String, Long)] = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
      def outputEncoder: Encoder[String] = Encoders.STRING
    }
    val maxCountWord = org.apache.spark.sql.functions.udaf(MaxCountWord)
    graft.functions.Reducers.register(spark, "max_count_word", maxCountWord)

    // wired through the operation registry like any built-in operation
    OperationRegistry.register("topword",
      (corpus, _) => operators.TextPipelines.wordCount(corpus)
        .groupBy(substring(col("word"), 1, 1).as("letter"))
        .agg(maxCountWord(col("word"), col("count")).as("top_word"))
        .orderBy("letter"))
    val out = Files.createTempDirectory("graft-out").toString + "/tw"
    val result = Engine.run(spark, JobConfig("topword", tmpCorpus(), out))
    val got = result.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // counts: again 1, hello 2, spins 1, the 1, world 2
    assert(got == Map("a" -> "again", "h" -> "hello", "s" -> "spins", "t" -> "the", "w" -> "world"))

    // the same reducer is callable from SQL once registered
    spark.createDataFrame(Seq(("x", 1L), ("y", 5L), ("z", 5L)))
      .toDF("w", "c").createOrReplaceTempView("tw_sql")
    val viaSql = spark.sql("SELECT max_count_word(w, c) AS top FROM tw_sql")
      .head().getString(0)
    assert(viaSql == "z")
  }

  test("JobConfig.fromJsonFile accepts reference-style config.json field names") {
    val corpus = tmpCorpus()
    val out = Files.createTempDirectory("graft-out").toString + "/cfg"
    val cfgFile = Files.createTempDirectory("graft-cfg").resolve("config.json")
    // the reference's spelling (master.py:215-216 / config.json)
    Files.writeString(cfgFile,
      s"""{
         |  "operation_name": "wordcount",
         |  "raw_input_data_path": "$corpus",
         |  "output_data_path": "$out",
         |  "mapper_count": 3
         |}""".stripMargin)
    val cfg = JobConfig.fromJsonFile(spark, cfgFile.toString)
    assert(cfg == JobConfig("wordcount", corpus, out, partitions = 3))
    val result = Engine.run(spark, cfg)
    assert(result.count() == 5)
  }

  test("Main.dispatch: run/fetch/lookup round-trip (S7/S8 analog)") {
    val corpus = tmpCorpus()
    val out = Files.createTempDirectory("graft-out").toString + "/cli"
    assert(Main.dispatch(spark, Seq("run", "wordcount", corpus, out)) == 0)
    assert(Main.dispatch(spark, Seq("fetch", out)) == 0)
    assert(Main.dispatch(spark, Seq("lookup", out, "hello")) == 0)
    assert(Main.dispatch(spark, Seq("bogus")) == 2)
  }

  test("Engine.runStream: file arrival republishes the queryable result (Part-2 loop)") {
    val corpusDir = Files.createTempDirectory("graft-stream-corpus")
    Files.writeString(corpusDir.resolve("a.txt"), "hello world\n")
    val out = Files.createTempDirectory("graft-out").toString + "/live"
    val q = Engine.runStream(spark, JobConfig("wordcount", corpusDir.toString, out))
    try {
      q.processAllAvailable()
      assert(Engine.lookup(spark, out, "hello").head().getAs[Long]("count") == 1L)

      Files.writeString(corpusDir.resolve("b.txt"), "hello again\n")
      q.processAllAvailable()
      assert(Engine.lookup(spark, out, "hello").head().getAs[Long]("count") == 2L)
      assert(Engine.fetchResult(spark, out).count() == 3)
    } finally q.stop()
  }

  test("engine sessions use non-ANSI semantics: x/0 and bad element_at are NULL") {
    // Spark 4 defaults to ANSI (these THROW); the DuckDB oracle returns
    // NULL, and a tokenless document must degrade, not kill the job
    val r = spark.sql("SELECT 1/0 AS d, element_at(array(1), 5) AS e").head()
    assert(r.isNullAt(0), "x/0 must be NULL under engine sessions")
    assert(r.isNullAt(1), "out-of-bounds element_at must be NULL under engine sessions")
  }

  test("partition count is config-driven and does not change results") {
    val corpus = tmpCorpus()
    val o1 = Files.createTempDirectory("graft-out").toString + "/p1"
    val o2 = Files.createTempDirectory("graft-out").toString + "/p2"
    val r1 = Engine.run(spark, JobConfig("wordcount", corpus, o1, partitions = 1))
    val r2 = Engine.run(spark, JobConfig("wordcount", corpus, o2, partitions = 7))
    assert(r1.collect().toSeq == r2.collect().toSeq)
  }

  test("Engine.run drains retired checkpoints at job completion") {
    // A pipeline that retires a checkpoint — the shape every dedup
    // catalog query has. Engine.run must give the serving path the same
    // between-queries lifecycle as Bench/Verify: after the job's sink
    // completes, the retired blocks are GONE (blocking drain), so a
    // long-lived session running retiring operations cannot accumulate
    // blocks until shutdown (the r9 bench heap-poisoning failure mode).
    OperationRegistry.register("retiring_wc", (corpus, _) => {
      val counts = graft.operators.Checkpoints.retire(
        corpus.select(explode(split(col("line"), "\\s+")).as("word"))
          .filter(length(col("word")) > 0)
          .groupBy("word").agg(count(lit(1)).as("count"))
          .localCheckpoint())
      counts.orderBy("word")
    })
    val corpus = tmpCorpus()
    def cachedRddIds(): Set[Int] =
      spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    val before = cachedRddIds()
    val o1 = Files.createTempDirectory("graft-out").toString + "/r1"
    Engine.run(spark, JobConfig("retiring_wc", corpus, o1))
    assert(graft.operators.Checkpoints.retiredCount == 0,
      "run 1 left retired checkpoints undrained")
    assert(cachedRddIds() == before,
      "run 1's checkpoint blocks survived the job-completion drain")
    // second run through the same session: still no accumulation
    val o2 = Files.createTempDirectory("graft-out").toString + "/r2"
    Engine.run(spark, JobConfig("retiring_wc", corpus, o2))
    assert(graft.operators.Checkpoints.retiredCount == 0)
    assert(cachedRddIds() == before,
      "a second run accumulated blocks — the serving lifecycle leaks")
    // and the published artifacts are intact after their blocks released
    assert(Engine.fetchResult(spark, o2).count() > 0)
  }
}
