package graft

/** Scale probe for the dedup candidate-tier precision/recall harness —
  * RecallProbe's shape over `dedup_recall`: runs the oracle-checked
  * query at a given SF dir and prints one JSON line for a committed
  * DEDUPRECALL_sf* artifact. The driver's DuckDB gate pins the VALUES
  * at sf0.01; this snapshot is the evidence that each tier's
  * precision/recall trade against exact rare-shingle Jaccard truth
  * holds where the oracle can't follow (sf1/sf10 replicas).
  */
object DedupRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(".localdata/sf1")
    val spark = EngineSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "dedup-recall-probe")
    // raw-corpus tiers + the post-canon tiers (dedup_recall_canon —
    // r15: the pipeline-order claim's instrument) in one artifact; the
    // two queries share schema, so one formatter serves both. Drain
    // between them: each is a complete harness with its own retired
    // checkpoints (the Bench per-query lifecycle).
    // optional comma-list second arg restricts the harnesses run — the
    // threshold-ladder probe runs ONLY dedup_recall_canon per rung, and
    // the band-spread repro needs the canon tier isolated
    val qs = args.lift(1).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("dedup_recall", "dedup_recall_canon"))
    val rows = qs.flatMap { q =>
      val rs = SparkEntry.queries(q)(spark, dir)
        .collect()
        .map { r =>
          // NULL-guarded ratios (an empty tier emits NULL, not NaN) —
          // mirror them as JSON null
          def ratio(i: Int): String =
            if (r.isNullAt(i)) "null" else r.getDouble(i).toString
          s"""{"method":"${r.getString(0)}","n_cand":${r.getLong(1)},""" +
            s""""n_hit":${r.getLong(2)},"n_true":${r.getLong(3)},""" +
            s""""precision":${ratio(4)},"recall":${ratio(5)}}"""
        }
      graft.operators.Checkpoints.drain()
      rs
    }
    println(s"""{"metric":"dedup_recall","dir":"$dir",""" +
      s""""min_est_jaccard":${graft.queries.DedupQueries.MinEstJaccard},""" +
      s""""tiers":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
