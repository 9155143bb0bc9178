package graft

import org.apache.spark.sql.functions._

/** Micro-probe: decompose approx_quantiles' cost at a given SF.
  *
  * approx_quantiles measured 9.8 → 58 s across the round-12 sf10 chains
  * while agg_quantiles (the SAME exact-percentile counts map, same
  * grouping, array form) stayed at 6.5–9.1 s in the same sessions. This
  * main times each component in isolation — exact scalar percentile,
  * the GK sketch alone, both fused in one aggregate (the catalog
  * query's shape), and both computed as two aggregations joined — to
  * attribute the delta. Scratch diagnostic; not part of the contract.
  */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(".localdata/sf10")
    val spark = EngineSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "quant-probe")
    val l = Tables(spark, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice"))
    l.write.format("noop").mode("overwrite").save() // warm scan

    def time(name: String)(f: => Unit): Unit = {
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s min=${reps.min}%8.2f s  reps=${reps.map(r => f"$r%.2f").mkString(",")}")
    }

    time("exact_scalar") {
      l.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
        .write.format("noop").mode("overwrite").save()
    }
    time("exact_array3") {
      l.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.25D,0.5D,0.95D))").as("m"))
        .write.format("noop").mode("overwrite").save()
    }
    time("sketch_alone") {
      l.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("a"))
        .write.format("noop").mode("overwrite").save()
    }
    time("fused_exact_plus_sketch") {
      l.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("m"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("a"))
        .write.format("noop").mode("overwrite").save()
    }
    time("windowed_counts_array3") {
      graft.operators.Quantiles.exactByGroup(
          l, "l_returnflag", "l_extendedprice",
          Seq(0.25, 0.5, 0.95), Seq("p25", "median", "p95"))
        .write.format("noop").mode("overwrite").save()
    }
    time("joined_two_aggs") {
      val e = l.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      val a = l.groupBy(col("l_returnflag"))
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("a"))
      e.join(a, "l_returnflag").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
