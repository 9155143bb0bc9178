package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact continuous-interpolation quantiles via a counts table and a
  * cumulative window — no `percentile` aggregate anywhere in the plan.
  *
  * Spark's exact `percentile` is a TypedImperativeAggregate holding an
  * OpenHashMap of EVERY distinct value of the group in ONE aggregation
  * buffer: boxed entries on the driver-of-the-group's heap, the whole
  * value domain in a single task. Two ways that fails at scale:
  *
  *  1. The buffer is corpus-value-domain-sized with no spill path — a
  *     group whose distinct-value set outgrows one executor's heap is an
  *     OOM, not a slow query.
  *  2. The boxed map is a GC bomb measured live in round 12: at sf10
  *     (60 M rows) one `percentile(l_extendedprice, …)` pass allocates
  *     multi-GB of boxed `Double` map entries, and the NEXT
  *     allocation-heavy aggregate in the same JVM pays for it — G1
  *     measured `approx_quantiles` at 58–95 s (vs 5 s in a fresh
  *     session) purely from heap aftermath; ParallelGC cut it to 13 s
  *     but still billed 18 s of full-GC to the following query.
  *
  * This operator computes the identical doubles with only codegen'd
  * Tungsten operators, all spill-capable:
  *
  *  1. `groupBy(key, value).count()` — hash aggregate, partial-agg'd
  *     map-side, shuffle bounded by distinct (key, value) pairs;
  *  2. one window partition per key: running count BEFORE each distinct
  *     value (cumulative sum ordered by value) and the group total;
  *  3. for each requested fraction p: target rank `pos = p·(n−1)`, the
  *     bracketing distinct values picked by a conditional min over the
  *     [cumBefore, cumBefore+cnt) interval containing floor(pos) /
  *     ceil(pos), then Spark/DuckDB's shared linear interpolation
  *     `lower + (higher − lower) · (pos − floor(pos))` — the same IEEE
  *     double operations `Percentile.getPercentile` performs, so results
  *     hash-match both Spark's built-in and DuckDB's `quantile_cont`
  *     (QuantilesSpec pins bit-equality against the built-in).
  *
  * The per-key window sort is bounded by the VALUE DOMAIN (distinct
  * values), not corpus rows — the counts table is the compression. A
  * low-cardinality key (3 return flags) caps window parallelism at the
  * key count; that is inherent to exact per-group order statistics, and
  * the heavy, corpus-proportional stage (stage 1) is fully parallel.
  */
object Quantiles {

  /** Exact quantiles of `value` per `key`.
    *
    * @param df       input frame
    * @param key      grouping column name
    * @param value    numeric value column name (nulls ignored, like the
    *                 built-in aggregate)
    * @param ps       fractions in [0, 1]
    * @param outNames one output column name per fraction
    * @return one row per key: (key, outNames…), doubles bit-equal to
    *         `percentile(value, array(ps…))`
    */
  def exactByGroup(df: DataFrame, key: String, value: String,
      ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == outNames.length,
      s"ps(${ps.length}) and outNames(${outNames.length}) must align")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"fractions out of [0,1]: $ps")

    val v = col(value).cast("double")
    val counts = df.filter(v.isNotNull)
      .groupBy(col(key), v.as("_v"))
      .agg(count(lit(1)).as("_c"))

    // Both windows share the (key) partitioning — one exchange, the
    // ordered frame adds the per-partition sort exact order statistics
    // cannot avoid.
    val ordered = Window.partitionBy(col(key)).orderBy(col("_v"))
    val whole = Window.partitionBy(col(key))
    val cum = counts
      .withColumn("_cb", sum(col("_c")).over(ordered) - col("_c"))
      .withColumn("_n", sum(col("_c")).over(whole))

    // pos/lo/hi are per-key constants computed row-level; the bracketing
    // rows are picked by conditional aggregation (exactly one distinct
    // value's [cb, cb+c) interval contains each integer rank).
    val pickers = ps.zipWithIndex.flatMap { case (p, i) =>
      val pos = lit(p) * (col("_n") - 1).cast("double")
      val lo = floor(pos)
      val hi = ceil(pos)
      Seq(
        min(when(col("_cb") <= lo && lo < col("_cb") + col("_c"), col("_v")))
          .as(s"_lo$i"),
        min(when(col("_cb") <= hi && hi < col("_cb") + col("_c"), col("_v")))
          .as(s"_hi$i"))
    }
    val agged = cum.groupBy(col(key))
      .agg(max(col("_n")).as("_n"), pickers: _*)

    val outs = ps.zipWithIndex.map { case (p, i) =>
      // Percentile.getPercentile's exact arithmetic (verified in the
      // 4.1.2 bytecode): position = (n−1).toDouble · p; result =
      // (ceil(pos) − pos) · lowerValue + (pos − floor(pos)) · higherValue,
      // SHORT-CIRCUITING to lowerValue when both bracketing values are
      // the same distinct value — the full formula can differ by 1 ulp
      // there ((hi−pos)+(pos−lo) rounds to 1±ulp), so the branch is a
      // bit-equality requirement, not an optimization.
      val pos = lit(p) * (col("_n") - 1).cast("double")
      val vlo = col(s"_lo$i")
      val vhi = col(s"_hi$i")
      when(vlo === vhi, vlo)
        .otherwise((ceil(pos) - pos) * vlo + (pos - floor(pos)) * vhi)
        .as(outNames(i))
    }
    agged.select(col(key) +: outs: _*)
  }

  /** Ungrouped form: exact quantiles of `value` over the whole frame. */
  def exact(df: DataFrame, value: String, ps: Seq[Double],
      outNames: Seq[String]): DataFrame =
    exactByGroup(df.withColumn("_k", lit(1)), "_k", value, ps, outNames)
      .drop("_k")
}
