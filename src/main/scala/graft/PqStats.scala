package graft

/** Codebook-health probe for the PQ index (the LSHSTATS precedent):
  * per-subspace codeword occupancy at a given SF — dead codewords
  * (trained away by Lloyd's), min/max occupancy, and the total code
  * count — printed as one JSON line for a committed PQSTATS artifact.
  * Quantization quality degrades loudly through THESE numbers (a
  * subspace collapsing to few live codewords means its 4 bits carry
  * less information), so the committed snapshot is the scale evidence
  * that the per-subspace training keeps all PqM·PqK codewords alive at
  * corpus scale.
  */
object PqStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(".localdata/sf1")
    val spark = EngineSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "pq-stats")
    // pq_occupancy IS this relation (oracle-checked at sf0.01) — probe it
    // directly rather than re-deriving from the packed code words.
    val occ = SparkEntry.queries("pq_occupancy")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val m = graft.queries.SimilarityQueries.PqM
    val k = graft.queries.SimilarityQueries.PqK
    val live = occ.size
    val dead = m * k - live
    val perJ = (0 until m).map { j =>
      val cs = (0 until k).map(c => occ.getOrElse((j, c), 0L))
      s"""{"j":$j,"live":${cs.count(_ > 0)},"min":${cs.min},"max":${cs.max}}"""
    }
    val total = occ.values.sum
    println(s"""{"metric":"pq_stats","dir":"$dir","m":$m,"k":$k,"vectors":${total / m},""" +
      s""""live_codewords":$live,"dead_codewords":$dead,"per_subspace":[${perJ.mkString(",")}]}""")
    spark.stop()
  }
}
