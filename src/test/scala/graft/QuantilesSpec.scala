package graft

import graft.operators.Quantiles
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Quantiles.exactByGroup]] BIT-equal to Spark's built-in exact
  * `percentile` aggregate — the operator replaces the built-in in the
  * catalog (the built-in's single boxed buffer is a GC bomb and has no
  * spill path; see the operator scaladoc), so equality must hold on
  * hostile shapes, not just money-like values: repeated values (the
  * lowerKey == higherKey short-circuit), single-row groups, integral and
  * fractional target ranks, negative values, and subnormal-scale spreads.
  * Doubles are compared with java.lang.Double.compare on the raw values
  * (bitwise for the hash-oracle's purposes; no tolerance).
  */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Ps = Seq(0.0, 0.25, 0.5, 0.95, 1.0)
  private val Names = Seq("p0", "p25", "p50", "p95", "p100")

  /** Built-in reference on the same frame. */
  private def builtin(df: org.apache.spark.sql.DataFrame) = {
    val arr = Ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    df.groupBy(col("k"))
      .agg(expr(s"percentile(v, $arr)").as("ps"))
      .select(col("k") +: Names.zipWithIndex.map { case (n, i) =>
        element_at(col("ps"), i + 1).as(n)
      }: _*)
  }

  private def assertBitEqual(df: org.apache.spark.sql.DataFrame): Unit = {
    val ours = Quantiles.exactByGroup(df, "k", "v", Ps, Names)
      .collect().map(r => r.getString(0) -> r).toMap
    val ref = builtin(df).collect().map(r => r.getString(0) -> r).toMap
    assert(ours.keySet == ref.keySet)
    for ((k, r) <- ref; i <- 1 to Ps.length) {
      val (a, b) = (ours(k).getDouble(i), r.getDouble(i))
      assert(java.lang.Double.compare(a, b) == 0,
        s"key=$k p=${Ps(i - 1)}: ours=$a builtin=$b (delta=${a - b})")
    }
  }

  test("hand-built hostile shapes match the built-in bitwise") {
    val rows = Seq(
      // single-row group: every quantile is the value itself
      ("solo", 42.17),
      // all-equal group: the lowerKey == higherKey short-circuit on every rank
      ("flat", 7.0), ("flat", 7.0), ("flat", 7.0), ("flat", 7.0),
      // heavy repetition with one outlier: fractional ranks inside a run
      ("runs", 1.5), ("runs", 1.5), ("runs", 1.5), ("runs", 1.5),
      ("runs", 1.5), ("runs", 1.5), ("runs", 99.25),
      // negative + wide magnitude spread
      ("wide", -1e12), ("wide", -3.25), ("wide", 0.0),
      ("wide", 5e-13), ("wide", 2.75e9),
      // two rows: every fractional p interpolates
      ("pair", 10.0), ("pair", 20.0))
    assertBitEqual(rows.toDF("k", "v"))
  }

  test("nulls are ignored like the built-in") {
    val df = Seq(("g", Some(1.0)), ("g", None), ("g", Some(3.0)), ("g", None))
      .toDF("k", "v")
    assertBitEqual(df)
  }

  test("fuzz: random multisets with repetition match bitwise (seeded)") {
    // values drawn from a SMALL pool so repeated values (the short-circuit
    // branch) occur constantly; sizes hit 1-row and even/odd groups. All
    // 30 trials go into ONE frame as 30 keys — one Spark job, not 30.
    val rnd = new scala.util.Random(0xC0FFEE)
    val rows = (0 until 30).flatMap { trial =>
      val pool = Vector.fill(1 + rnd.nextInt(6))(rnd.nextDouble() * 2000 - 1000)
      val n = 1 + rnd.nextInt(40)
      Seq.fill(n)((s"t$trial", pool(rnd.nextInt(pool.length))))
    }
    assertBitEqual(rows.toDF("k", "v"))
  }

  test("ungrouped form matches the built-in over the whole frame") {
    val df = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0).toDF("v")
    val ours = Quantiles.exact(df, "v", Seq(0.5), Seq("med")).collect()
    val Array(Row(ref: Double)) =
      df.agg(expr("percentile(v, 0.5)").as("m")).collect()
    assert(ours.length == 1 &&
      java.lang.Double.compare(ours(0).getDouble(0), ref) == 0)
  }

  test("the plan contains no TypedImperativeAggregate percentile buffer") {
    val df = Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
    val plan = Quantiles.exactByGroup(df, "k", "v", Seq(0.5), Seq("m"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("),
      "the operator must not fall back to the built-in aggregate")
  }

  test("plan shape: partial-agg'd counts and ONE window exchange for both frames") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("k", "v")
    val q = Quantiles.exactByGroup(df, "k", "v", Seq(0.25, 0.5), Seq("a", "b"))
    q.collect() // drive THIS QueryExecution so the adaptive plan is final
    // AQE prints the Initial Plan after the Final Plan — count shuffles
    // in the FINAL section only, or every exchange double-counts
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // counts stage: map-side partial count before its exchange
    assert(plan.contains("partial_count"),
      s"expected a partial-agg'd counts stage:\n$plan")
    // the ordered (cumulative) and unbounded (group total) window frames
    // must share one (key)-partitioning — no third corpus exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2,
      s"expected at most 2 shuffles (counts + window), got $exchanges:\n$plan")
  }
}
