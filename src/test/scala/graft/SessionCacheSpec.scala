package graft

import graft.operators.{Checkpoints, SessionCache}
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The materialize-once session cache: fill-once semantics, survival
  * across harness drains (the property retired checkpoints deliberately
  * do NOT have), equality of cached vs rebuilt relations, and targeted
  * invalidation. All fixtures live in spec-private temp dirs so the
  * shared session's cache entries from other suites are never touched.
  */
class SessionCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmpCorpus(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cache").toString
    (0 until 40).map { i =>
      // four exact-duplicate families so the exact-folded map has
      // non-singleton clusters to get wrong
      (i.toLong, s"shared boilerplate text body number ${i % 4} with filler tokens", "en", "synth", 16L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    (0 until 40).map(i => (i.toLong, Array.fill(4)(((i % 4) + 1).toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(dir + "/embeddings.parquet")
    dir
  }

  test("second consumer reuses the cached frame without rebuilding") {
    val dir = tmpCorpus()
    val f0 = SessionCache.fills
    val a = DedupQueries.rareShinglePairStats(spark, dir)
    val afterFirst = SessionCache.fills
    assert(afterFirst == f0 + 1)
    val b = DedupQueries.rareShinglePairStats(spark, dir)
    assert(SessionCache.fills == afterFirst, "second call rebuilt the relation")
    assert(a eq b, "cache must hand back the same checkpointed frame")
    SessionCache.invalidate(spark, dir)
  }

  test("cached frames survive the harness drain that frees retired checkpoints") {
    val dir = tmpCorpus()
    val cached = DedupQueries.rareShinglePairStats(spark, dir)
    val rows = cached.count()
    Checkpoints.drain() // the between-queries lifecycle Bench/Verify run
    // still scannable: the blocks were NOT retired with the build's
    // corpus-scaled intermediates
    assert(cached.count() == rows)
    SessionCache.invalidate(spark, dir)
  }

  test("cached cluster map equals a cold rebuild row-for-row") {
    val dir = tmpCorpus()
    def canonical(): Seq[(Long, Long, Long, Boolean)] =
      SparkEntry.queries("dedup_canonical")(spark, dir)
        .select(col("doc_id"), col("cluster_id"), col("canon_id"), col("keep"))
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val warmTwice = { canonical(); canonical() } // second hits the cache
    SessionCache.invalidate(spark, dir)
    val cold = canonical()
    assert(warmTwice == cold, "cache hit and cold rebuild must be identical")
    // sanity: the fixture really exercises multi-member clusters
    assert(cold.count(!_._4) > 0, "fixture must produce DROP decisions")
    SessionCache.invalidate(spark, dir)
  }

  test("invalidate drops only the named dir's entries") {
    val d1 = tmpCorpus()
    val d2 = tmpCorpus()
    DedupQueries.rareShinglePairStats(spark, d1)
    DedupQueries.rareShinglePairStats(spark, d2)
    val before = SessionCache.size
    SessionCache.invalidate(spark, d1)
    assert(SessionCache.size == before - 1)
    val fills = SessionCache.fills
    DedupQueries.rareShinglePairStats(spark, d2) // still warm
    assert(SessionCache.fills == fills)
    DedupQueries.rareShinglePairStats(spark, d1) // cold again
    assert(SessionCache.fills == fills + 1)
    SessionCache.invalidate(spark, d1)
    SessionCache.invalidate(spark, d2)
  }
}
