package graft

import org.apache.spark.sql.functions._

/** Dev tool (the `Explain` family): per-stage cardinalities of the two
  * LSH-banded queries whose wall-clock scaling needs attribution —
  * `dedup_minhash_lsh` and `ann_lsh_multiprobe`. Prints one JSON line per
  * query with the band-row / hot-bucket / cold-row / candidate-pair /
  * emitted-pair counts at the given SF dir, so a super-linear TIME curve
  * can be split into "candidate growth" (these counts grow super-linearly
  * too) vs "per-row cost or host noise" (they don't).
  *
  * The stages are built FROM the queries' own machinery and constants
  * (`DedupQueries.shingleTable`/`minhashBands`/`K`/`MaxBucket`,
  * `SimilarityQueries.LshBits`/`Probes`/`MaxBucket`) — a probe with its
  * own copies would silently desynchronize from the operator it measures
  * the first time a constant or the band geometry changes.
  *
  * Usage: runMain graft.LshStats <sfDir>
  */
object LshStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineSession.local(cpus, "graft-lsh-stats")
    import graft.functions.VectorFunctions._
    import graft.queries.{DedupQueries => DQ, SimilarityQueries => SQ}

    // ---- dedup_minhash_lsh stages (the query's own machinery) ----
    {
      val bands0 = DQ.minhashBands(DQ.shingleTable(spark, sfDir), Nil, DQ.K)
        .localCheckpoint() // count the stages off ONE materialization
      val hotFull = bands0.groupBy("band", "bval").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val hot = hotFull.filter(col("n") > DQ.MaxBucket).select("band", "bval")
      val cold = bands0.join(broadcast(hot), Seq("band", "bval"), "left_anti")
        .localCheckpoint()
      val cand = cold.as("a").join(cold.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      val matches = (0 until DQ.K).map(i =>
        when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0)).reduce(_ + _)
      val pairs = cand
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          (matches / lit(DQ.K.toDouble)).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5).dropDuplicates("d1", "d2")
      val maxCold = hotFull.filter(col("n") <= DQ.MaxBucket)
        .agg(coalesce(max("n"), lit(0L))).head().getLong(0)
      println(s"""{"query":"dedup_minhash_lsh","sf":"$sfDir"""" +
        s""","band_rows":${bands0.count()},"buckets":${hotFull.count()}""" +
        s""","hot_buckets":${hot.count()},"cold_rows":${cold.count()}""" +
        s""","max_cold_bucket":$maxCold""" +
        s""","candidate_pairs":${cand.count()},"emitted_pairs":${pairs.count()}}""")
    }

    // ---- dedup_chunk_minhash stages (the query's own machinery) ----
    {
      import graft.functions.TextFunctions._
      val sh = graft.queries.CurationQueries.chunkTable(spark, sfDir)
        .select(col("doc_id"), col("chunk_id"),
          explode(shingles3(tokens(col("chunk")))).as("sh"))
        .distinct()
      val bands0 = DQ.minhashBands(sh, Seq("chunk_id"), DQ.K).localCheckpoint()
      val hotFull = bands0.groupBy("band", "bval").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val hot = hotFull.filter(col("n") > DQ.MaxBucket).select("band", "bval")
      val cold = bands0.join(broadcast(hot), Seq("band", "bval"), "left_anti")
        .localCheckpoint()
      val cand = cold.as("a").join(cold.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          (col("a.doc_id") < col("b.doc_id") ||
            (col("a.doc_id") === col("b.doc_id") &&
              col("a.chunk_id") < col("b.chunk_id"))))
      val maxCold = hotFull.filter(col("n") <= DQ.MaxBucket)
        .agg(coalesce(max("n"), lit(0L))).head().getLong(0)
      println(s"""{"query":"dedup_chunk_minhash","sf":"$sfDir"""" +
        s""","band_rows":${bands0.count()},"buckets":${hotFull.count()}""" +
        s""","hot_buckets":${hot.count()},"cold_rows":${cold.count()}""" +
        s""","max_cold_bucket":$maxCold""" +
        s""","candidate_pairs":${cand.count()}}""")
    }

    // ---- ann_lsh_multiprobe stages (the query's own constants) ----
    {
      val tabs = Tables(spark, sfDir, "embeddings")
        .filter(col("vec_id").isNotNull)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        .select(col("vec_id"), col("v"),
          posexplode(array((0 until SQ.Probes).map(t =>
            signBucketAt(col("v"), t * SQ.LshBits, SQ.LshBits)): _*)))
        .toDF("vec_id", "v", "tbl", "bucket")
        .filter(col("bucket").isNotNull)
        .localCheckpoint()
      val hotFull = tabs.groupBy("tbl", "bucket").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val hot = hotFull.filter(col("n") > SQ.MaxBucket).select("tbl", "bucket")
      val cold = tabs.join(broadcast(hot), Seq("tbl", "bucket"), "left_anti")
        .localCheckpoint()
      val cand = cold.as("a").join(cold.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      val maxCold = hotFull.filter(col("n") <= SQ.MaxBucket)
        .agg(coalesce(max("n"), lit(0L))).head().getLong(0)
      println(s"""{"query":"ann_lsh_multiprobe","sf":"$sfDir"""" +
        s""","band_rows":${tabs.count()},"buckets":${hotFull.count()}""" +
        s""","hot_buckets":${hot.count()},"cold_rows":${cold.count()}""" +
        s""","max_cold_bucket":$maxCold""" +
        s""","candidate_pairs":${cand.count()}}""")
    }
    spark.stop()
  }
}
