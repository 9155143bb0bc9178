package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native RefinedWeb §G line-correction scan:
  * `line_filter_stats(text)` returns
  * `STRUCT<text_filtered: STRING, n_lines: INT, n_kept: INT>` — the
  * document with its failing lines removed, plus the line counts the
  * >5%-removed doc gate needs — under the exact rule the HOF spelling
  * evaluated per line with three `regexp_replace` passes:
  * keep iff `length(l) = 0` (blank = document structure) OR
  * (`length(l) > 10` AND the line has ≥ 1 ASCII letter AND
  * `2 · n_upper ≤ n_alpha`, the uppercase-majority test).
  *
  * Why native: the declarative form ran `filter(split(text, '\n'), l ->
  * …)` with `length(regexp_replace(l, '[^A-Za-z]', ''))` and
  * `length(regexp_replace(l, '[^A-Z]', ''))` inside the lambda — each
  * line allocated two regex-built strings through an interpreted lambda
  * layer, and the kept array was joined back with a third pass. At sf10
  * that constant factor made `line_filter` the catalog's #2 query
  * (37.9 s) for what is semantically a single byte scan. This kernel
  * walks the UTF-8 bytes once: lines split at 0x0A (a byte that never
  * occurs inside a multi-byte UTF-8 sequence), code points counted as
  * non-continuation bytes (`(b & 0xC0) != 0x80` — `length()` counts
  * code points, not bytes), and the alpha/upper classes are the ASCII
  * ranges the regex character classes matched, so multi-byte letters
  * count toward length but never toward alpha/upper — exactly the
  * `[A-Za-z]`/`[A-Z]` semantics. Kept line byte ranges are copied once
  * into the output joined by 0x0A. `doGenCode` keeps the call inside
  * whole-stage codegen ([[CdcBoundaryEnds]]/[[WinnowFps]] precedent),
  * and the three struct-field consumers in one projection share a
  * single evaluation via codegen subexpression elimination.
  *
  * Fidelity pins ([[graft.queries.TextAnalysisQueries.lineFilterSql]]
  * is unchanged): `split` with Spark's -1 limit keeps trailing empty
  * strings, so "a\n" is TWO lines (the trailing blank is kept) and ""
  * is ONE blank line — the byte walk reproduces that by closing a line
  * at end-of-input unconditionally.
  */
case class LineFilterStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"line_filter_stats expects STRING, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("text_filtered", StringType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "line_filter_stats"

  override protected def nullSafeEval(t: Any): Any =
    LineFilterUtil.stats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.LineFilterUtil.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): LineFilterStats =
    copy(child = newChild)
}

object LineFilterUtil {

  /** One-pass line scan. A line is kept iff it is blank, or has more
    * than 10 code points, at least one ASCII letter, and at most half
    * its letters uppercase. One kernel for codegen and interpreted paths.
    */
  def stats(t: UTF8String): InternalRow = {
    val bytes = t.getBytes
    val n = bytes.length
    var nLines = 0
    var nKept = 0
    var keptBytes = 0
    // kept line byte ranges, flattened (start0, end0, start1, end1, …)
    var ranges = new Array[Int](16)
    var nr = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        nLines += 1
        var cp = 0
        var alpha = 0
        var upper = 0
        var j = start
        while (j < i) {
          val b = bytes(j)
          if ((b & 0xC0) != 0x80) cp += 1
          if (b >= 'A' && b <= 'Z') { alpha += 1; upper += 1 }
          else if (b >= 'a' && b <= 'z') alpha += 1
          j += 1
        }
        if (cp == 0 || (cp > 10 && alpha > 0 && 2 * upper <= alpha)) {
          nKept += 1
          keptBytes += i - start
          if (nr == ranges.length) ranges = java.util.Arrays.copyOf(ranges, nr * 2)
          ranges(nr) = start
          ranges(nr + 1) = i
          nr += 2
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Byte](keptBytes + math.max(0, nKept - 1))
    var o = 0
    var r = 0
    while (r < nr) {
      if (r > 0) { out(o) = '\n'; o += 1 }
      val len = ranges(r + 1) - ranges(r)
      System.arraycopy(bytes, ranges(r), out, o, len)
      o += len
      r += 2
    }
    new GenericInternalRow(
      Array[Any](UTF8String.fromBytes(out), nLines, nKept))
  }
}
