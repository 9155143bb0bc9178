package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<DOUBLE>` columns, built from codegen'd
  * higher-order functions (`zip_with`/`aggregate`) — no UDFs, so the
  * expressions stay inside whole-stage codegen and distribute trivially.
  *
  * Determinism: `aggregate` is a sequential left fold, so the floating-point
  * summation order is fixed (same bits on every run / partitioning). The
  * DuckDB oracle mirrors use an explicit fold too ([[dotSql]]).
  */
object VectorFunctions {

  /** Sequential-fold dot product of two ARRAY<DOUBLE> columns — the native
    * code-generated [[graft.expressions.DotProduct]] (HOF lambdas run
    * interpreted; this is the ANN hot loop). [[dotHof]] keeps the
    * composed-builtin form as the semantic reference.
    */
  def dot(a: Column, b: Column): Column =
    graft.bridge.SparkInternals.column(
      graft.expressions.DotProduct(
        graft.bridge.SparkInternals.expression(a),
        graft.bridge.SparkInternals.expression(b)))

  /** The same fold as composed built-ins (zip_with + aggregate), which
    * [[dot]] is tested bit-identical against.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Native nearest-centroid argmin ([[graft.expressions.ArgMinDist2]]):
    * (v, cents: ARRAY<STRUCT<cid, c>>) → STRUCT<d2, cid>. Codegen'd — the
    * Lloyd assignment hot loop once K is corpus-derived.
    */
  def argMinDist2(v: Column, cents: Column): Column =
    graft.bridge.SparkInternals.column(
      graft.expressions.ArgMinDist2(
        graft.bridge.SparkInternals.expression(v),
        graft.bridge.SparkInternals.expression(cents)))

  /** The composed-builtin argmin (the pre-native spelling), kept as the
    * semantic reference [[argMinDist2]] is spec-pinned bit-equal to.
    */
  def argMinDist2Hof(v: Column, cents: Column): Column =
    element_at(array_sort(transform(cents,
      ct => struct(dist2(v, ct.getField("c")).as("d2"),
        ct.getField("cid").as("cid")))), 1)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance as the same sequential left fold as [[dotHof]]
    * (deterministic summation order; no norm, so a zero vector needs no
    * NULL-degrade here — k-means' reason to prefer L2 over cosine).
    * (x−y)² is never −0.0, so the 0.0-init fold is bit-identical to
    * DuckDB's first-element-init `list_reduce` ([[dist2Sql]]).
    * Native code-generated [[graft.expressions.Dist2]] — the ADC-table
    * stage evaluates this corpus × PqM·PqK times for knn_join, where the
    * interpreted HOF lambdas were the measured bottleneck; [[dist2Hof]]
    * keeps the composed-builtin form as the semantic reference it is
    * spec-pinned bit-equal to.
    */
  def dist2(a: Column, b: Column): Column =
    graft.bridge.SparkInternals.column(
      graft.expressions.Dist2(
        graft.bridge.SparkInternals.expression(a),
        graft.bridge.SparkInternals.expression(b)))

  /** The same fold as composed built-ins — [[dist2]]'s semantic
    * reference (see [[dotHof]]).
    */
  def dist2Hof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Elementwise difference a − b (the IVF residual): per-element IEEE
    * double subtraction — exactly rounded, no fold, no reordering — so
    * both engines agree bit-for-bit ([[vsubSql]]).
    */
  def vsub(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x - y)

  /** Sign-bit bucket over the first `nBits` dimensions — an axis-aligned
    * locality-sensitive hash (random-hyperplane LSH with unit-axis planes).
    * Exact on floats, so Spark and the SQL oracle always agree.
    */
  def signBucket(v: Column, nBits: Int): Column = signBucketAt(v, 0, nBits)

  /** Sign bucket over dimensions [offset+1, offset+nBits] — disjoint
    * offsets give INDEPENDENT hash tables for multi-probe LSH.
    */
  def signBucketAt(v: Column, offset: Int, nBits: Int): Column =
    concat((0 until nBits).map(i =>
      when(element_at(v, offset + i + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)

  // ===== DuckDB-oracle SQL mirrors =====

  /** DuckDB dot product with the same left-fold order as [[dot]]
    * (list_reduce folds left; fold(0.0)+x1 ≡ x1 bit-exactly).
    */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> p[1]*p[2]), (acc, x) -> acc + x)"

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)})"

  /** DuckDB elementwise difference mirroring [[vsub]]. */
  def vsubSql(a: String, b: String): String =
    s"list_transform(list_zip($a, $b), p -> p[1] - p[2])"

  /** DuckDB squared L2 distance with the same fold order as [[dist2]]. */
  def dist2Sql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> (p[1]-p[2])*(p[1]-p[2])), (acc, x) -> acc + x)"

  def signBucketSql(v: String, nBits: Int): String = signBucketAtSql(v, 0, nBits)

  def signBucketAtSql(v: String, offset: Int, nBits: Int): String =
    (0 until nBits).map(i =>
      s"(CASE WHEN $v[${offset + i + 1}] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
}
