package graft

/** Scale probe for the ANN recall ladder (the LSHSTATS/PQSTATS
  * precedent): runs the oracle-checked `ann_recall` harness at a given
  * SF and prints one row per tier (SimilarityQueries.recallTiers — the
  * harness and this probe share the list) as one JSON line for a committed
  * RECALL_sf* artifact. The driver's DuckDB gate pins the VALUES at
  * sf0.01; this snapshot is the evidence that the ladder's shape — the
  * exact tier at 1.0, exact-reranked PQ recovering what raw 4-bit ADC
  * loses, nprobe above single-cell IVF — holds where the oracle can't
  * follow (sf1/sf10 replicas).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(".localdata/sf1")
    val spark = EngineSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "recall-probe")
    val rows = SparkEntry.queries("ann_recall")(spark, dir)
      .collect()
      .map { r =>
        // A tier returning zero rows makes hit_rate 0/0 = NaN, which is
        // not legal JSON — emit null and let the reader see the empty
        // tier through n_ret=0.
        val rate =
          if (r.getLong(1) == 0L || r.getDouble(3).isNaN) "null"
          else r.getDouble(3).toString
        s"""{"method":"${r.getString(0)}","n_ret":${r.getLong(1)},""" +
          s""""n_hits":${r.getLong(2)},"hit_rate":$rate}"""
      }
    println(s"""{"metric":"ann_recall","dir":"$dir","tiers":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
