package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document duplicate statistics of the doc's n-gram (or, at n = 1,
  * token) multiset: `gram_multiset_stats(tokens, n, with_md5)` returns
  * `STRUCT<n_items, n_distinct, max_c, sum_c2: BIGINT[, min_md5: STRING]>`
  * — Σ c, distinct count, the largest duplicate count, Σ c² (the Simpson
  * collision numerator), and (when `withMd5`) the lexicographic minimum
  * of `md5(gram)` in lowercase hex over the doc's grams.
  *
  * One kernel serves three catalog queries that all previously paid a
  * corpus-scale (doc, gram) exchange to count duplicates that never
  * leave their document's row (the [[GopherGramStats]] argument):
  * `doc_repetition` (max_c / n_items at n = 3), `doc_fingerprint`
  * (min_md5 + n_items + n_distinct at n = 3) and `token_diversity`
  * (n_items + n_distinct + sum_c2 at n = 1). Each becomes
  * scan + project + sort — shuffle-free, linear in the doc's own bytes.
  *
  * Fidelity pins: grams are single-space joins of n consecutive tokens
  * ([[graft.functions.TextFunctions.shinglesN]]; n = 1 is the token
  * itself), equality is byte equality (SQL grouping semantics);
  * `min_md5` hashes the gram's UTF-8 bytes exactly like `md5(s)` and
  * compares digests as unsigned bytes — hex encoding is byte-order-
  * preserving, so the digest minimum IS the hex-string minimum; min
  * over distinct grams equals min over all occurrences. A doc with < n
  * tokens has no grams: n_items = 0 (the explode-form's dropped-doc
  * marker) and min_md5 = ''.
  */
case class GramMultisetStats(child: Expression, n: Int, withMd5: Boolean)
    extends UnaryExpression {
  require(n >= 1, s"gram width must be >= 1, got $n")

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gram_multiset_stats expects ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(
    Seq(
      StructField("n_items", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("max_c", LongType, nullable = false),
      StructField("sum_c2", LongType, nullable = false)) ++
      (if (withMd5) Seq(StructField("min_md5", StringType, nullable = false))
       else Nil))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "gram_multiset_stats"

  override protected def nullSafeEval(t: Any): Any =
    GramMultisetStats.stats(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n, withMd5)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.GramMultisetStats.stats($c, $n, $withMd5)")

  override protected def withNewChildInternal(newChild: Expression): GramMultisetStats =
    copy(child = newChild)
}

object GramMultisetStats {

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Unsigned byte-wise comparison of equal-length digests. */
  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def stats(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      n: Int, withMd5: Boolean): InternalRow = {
    val m = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    val md = if (withMd5) java.security.MessageDigest.getInstance("MD5") else null
    var minDigest: Array[Byte] = null
    if (m >= n) {
      // token bytes materialized once; grams built by raw byte copy
      // (UTF8String equality/hash is byte equality)
      val tokBytes = new Array[Array[Byte]](m)
      var i = 0
      while (i < m) { tokBytes(i) = arr.getUTF8String(i).getBytes; i += 1 }
      var s = 0
      while (s + n <= m) {
        val key =
          if (n == 1) UTF8String.fromBytes(tokBytes(s))
          else {
            var bytes = n - 1
            var j = s
            while (j < s + n) { bytes += tokBytes(j).length; j += 1 }
            val g = new Array[Byte](bytes)
            var o = 0
            j = s
            while (j < s + n) {
              if (j > s) { g(o) = ' '; o += 1 }
              System.arraycopy(tokBytes(j), 0, g, o, tokBytes(j).length)
              o += tokBytes(j).length
              j += 1
            }
            UTF8String.fromBytes(g)
          }
        val cell = counts.get(key)
        if (cell == null) {
          counts.put(key, Array(1))
          if (withMd5) {
            // first occurrence only: min over distinct = min over all
            md.reset()
            val d = md.digest(key.getBytes)
            if (minDigest == null || lessUnsigned(d, minDigest)) minDigest = d
          }
        } else cell(0) += 1
        s += 1
      }
    }
    var nItems = 0L
    var maxC = 0L
    var sumC2 = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toLong
      nItems += c
      sumC2 += c * c
      if (c > maxC) maxC = c
    }
    val base = Array[Any](nItems, counts.size().toLong, maxC, sumC2)
    if (!withMd5) new GenericInternalRow(base)
    else {
      val hex =
        if (minDigest == null) UTF8String.EMPTY_UTF8
        else {
          val out = new Array[Byte](32)
          var i = 0
          while (i < 16) {
            out(2 * i) = HexDigits((minDigest(i) >> 4) & 0xF).toByte
            out(2 * i + 1) = HexDigits(minDigest(i) & 0xF).toByte
            i += 1
          }
          UTF8String.fromBytes(out)
        }
      new GenericInternalRow(base :+ (hex: Any))
    }
  }
}
