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

  test("partition count is config-driven and does not change results") {
    val corpus = tmpCorpus()
    val o1 = Files.createTempDirectory("graft-out").toString + "/p1"
    val o2 = Files.createTempDirectory("graft-out").toString + "/p2"
    val r1 = Engine.run(spark, JobConfig("wordcount", corpus, o1, partitions = 1))
    val r2 = Engine.run(spark, JobConfig("wordcount", corpus, o2, partitions = 7))
    assert(r1.collect().toSeq == r2.collect().toSeq)
  }
}
