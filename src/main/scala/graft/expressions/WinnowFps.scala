package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint scan (Schleimer et al. 2003 §2):
  * `winnow_fps(tokens, w)` over `ARRAY<STRING>` returns the DISTINCT
  * window-minimum md5 hex digests of the token array's 3-token shingles
  * under a sliding window of `w` consecutive shingle hashes — exactly
  * the values the HOF spelling produced with
  * `array_distinct(transform(sequence(0, m-w), i ->
  * array_min(slice(hs, i+1, w))))` over
  * `hs = transform(shingles3(tokens), t -> md5(t))`, including its two
  * degenerate branches: `0 < m < w` yields the single global min and
  * `m = 0` (fewer than 3 tokens) yields an empty list.
  *
  * Why native: the HOF form materializes the shingle STRING and its md5
  * hex for every position through three interpreted lambda layers, then
  * re-scans `w` hashes per window via `slice`+`array_min` — the same
  * interpreted-lambda tax that made the CDC boundary scan the catalog's
  * #2 sf10 cost before [[CdcBoundaryEnds]]. This kernel extracts each
  * token's UTF-8 bytes once, hashes each shingle's joined bytes directly
  * (no intermediate shingle string), keeps the window minima with a
  * monotonic deque (amortized O(1) per position instead of O(w)), and
  * dedups in first-occurrence order as it goes. `doGenCode` keeps the
  * call inside whole-stage codegen ([[DotProduct]]/[[AsciiClean]]
  * precedent).
  *
  * Fidelity: shingles are the 3 consecutive tokens joined with a single
  * 0x20, null elements skipped without doubling the separator
  * (concat_ws semantics — token arrays from `tokens()` never carry
  * nulls, but the kernel must not diverge if one does); digests are
  * rendered as lowercase hex, whose lexicographic order equals Spark's
  * UTF8String binary order on these ASCII-only values, so the window
  * minima are bit-for-bit the HOF's and the DuckDB mirror's
  * ([[graft.queries.TextAnalysisQueries.winnowFpsSql]] is unchanged).
  */
case class WinnowFps(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fps expects ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(tv: Any): Any =
    WinnowUtil.fps(tv.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.WinnowUtil.fps($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowUtil {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Distinct sliding-window-min fingerprints of the token array's
    * 3-shingle hashes. One kernel for the codegen and interpreted paths.
    */
  def fps(tv: ArrayData, w: Int): ArrayData = {
    val n = tv.numElements()
    val m = n - 2 // shingle count (may be <= 0)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tv.isNullAt(i)) null else tv.getUTF8String(i).getBytes
      i += 1
    }
    val digest = md5.get()
    // hash every shingle: tokens i, i+1, i+2 joined by ' ' (nulls skipped
    // without doubling the separator — concat_ws semantics)
    val hs = new Array[String](m)
    i = 0
    while (i < m) {
      digest.reset()
      var first = true
      var j = i
      while (j < i + 3) {
        val t = toks(j)
        if (t != null) {
          if (!first) digest.update(' '.toByte)
          digest.update(t)
          first = false
        }
        j += 1
      }
      hs(i) = hex(digest.digest())
      i += 1
    }
    // distinct-in-first-occurrence-order accumulator (array_distinct's
    // contract)
    val seen = new java.util.LinkedHashSet[String]()
    if (m < w) {
      // fewer shingles than the window: the HOF's single-global-min branch
      var best = hs(0)
      i = 1
      while (i < m) { if (hs(i).compareTo(best) < 0) best = hs(i); i += 1 }
      seen.add(best)
    } else {
      // monotonic deque of candidate indices: values strictly increase
      // front-to-back, front is the current window's min
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < m) {
        while (tail > head && hs(deque(tail - 1)).compareTo(hs(i)) >= 0) tail -= 1
        deque(tail) = i
        tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) seen.add(hs(deque(head)))
        i += 1
      }
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
