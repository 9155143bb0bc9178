package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR (or the directory given as the first argument —
  * e.g. the 10× `.localdata/sf1` replica `graft.ScaleData` builds) and
  * prints ONE JSON line with per-query seconds, so scaling evidence is
  * the same machine-checkable artifact at every SF.
  *
  * Queries are forced through the `noop` sink rather than `.count()` —
  * count() lets Catalyst prune all projections away, which would benchmark
  * an empty plan for projection-shaped queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineSession.local(cpus, "graft-bench")

    // Warm the session before timing: file listing, parquet footer reads,
    // page cache, and JIT of the scan path otherwise land entirely on the
    // alphabetically first query (agg_rollup carried ~4s of warmup in r2).
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      try Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }

    // A query that throws still gets a timing entry, but is ALSO listed in
    // "failed" — a broken query must never read as a speedup in the bench
    // line.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      // this query's action is complete — release any checkpoints it
      // retired, so block accumulation can't poison later queries' heap
      // (the r9 driver-bench regression; Checkpoints scaladoc)
      graft.operators.Checkpoints.drain()
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results
      .map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
