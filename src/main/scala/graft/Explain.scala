package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-audit tool: print the formatted physical plan of named catalog
  * queries (all of them with no args) against `SPARK_GRAFT_SF_DIR`.
  *
  * {{{
  *   sbt "runMain graft.Explain q1_pricing dedup_simhash_pairs"
  * }}}
  *
  * The things to look for (see SCALE.md): `PushedFilters`/`ReadSchema` on
  * scans, `ReusedExchange` on self-joins, `partial_*` aggregates before
  * exchanges, `TakeOrderedAndProject` for top-k, broadcast only on
  * structurally small sides, and wide `WholeStageCodegen` spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = EngineSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), "graft-explain")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"===== $name =====")
        println(fn(spark, sfDir).queryExecution.explainString(FormattedMode))
      }
    }
    spark.stop()
    if (unknown.nonEmpty) {
      System.err.println(
        s"unknown queries: ${unknown.mkString(", ")} (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
      sys.exit(2)
    }
  }
}
