package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Gopher (Rae et al. 2021, Table A1) n-gram repetition battery:
  * `gopher_gram_stats(tokens)` returns, for each gram width
  * n ∈ {2, 3, 4, 5, 10}, the occurrence-weighted char totals the
  * repetition gates divide —
  * `all<n>` (Σ c·len over the doc's n-grams), `top<n>` (c·len of the
  * elected top gram: largest count, ties to the longest gram) and
  * `dup<n>` (Σ c·len over grams with c ≥ 2) — as one
  * `STRUCT<all2,top2,dup2,…,all10,top10,dup10: BIGINT>`.
  *
  * Why native: repetition is a PER-DOCUMENT statistic — every gram a doc
  * emits lives in that doc's own row, so the declarative spelling's
  * corpus-scale explode + `groupBy(doc, n, gram)` exchange moves ~5×
  * token-count rows across the cluster to count duplicates that never
  * leave the row. At the 10× replica that exchange concentrated ~1.5 B
  * gram rows into the reducers' hash state at once (140 s, 19 s GC, for
  * what r11's five-pipeline form did in 30 s); at 100 TB it is a
  * non-starter. This kernel counts each width in one local hash map per
  * document — the query becomes scan + project, shuffle-free.
  *
  * Fidelity pins (the DuckDB oracle is unchanged): grams are the
  * single-space joins of n consecutive tokens
  * ([[graft.functions.TextFunctions.shinglesN]]); gram equality is exact
  * BYTE equality (UTF8String keys — the same equality SQL grouping
  * applies); `len` counts CODE POINTS like `length()` (token code
  * points summed + n−1 separators); a doc with < n tokens has no
  * n-gram rows, surfaced as all = 0 (a real gram's length is ≥ 2n−1 > 0,
  * so all = 0 ⇔ no grams — the battery's inner-join drop). The top
  * election packs (c, len) lexicographically, matching the oracle's
  * max-c-then-max-len two-step; only c·len of the winner is emitted, so
  * same-(c, len) ties are immaterial.
  */
case class GopherGramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gopher_gram_stats expects ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(
    GopherRepUtil.Widths.flatMap(n => Seq(
      StructField(s"all$n", LongType, nullable = false),
      StructField(s"top$n", LongType, nullable = false),
      StructField(s"dup$n", LongType, nullable = false))))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "gopher_gram_stats"

  override protected def nullSafeEval(t: Any): Any =
    GopherRepUtil.gramStats(
      t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.GopherRepUtil.gramStats($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherGramStats =
    copy(child = newChild)
}

/** The line half of the battery: `gopher_line_stats(text)` returns
  * `STRUCT<n_lines, dup_lines, line_chars, dup_line_chars: BIGINT>` over
  * the doc's NON-EMPTY lines (empty lines are paragraph structure,
  * excluded) — `n_lines` = Σ c, `dup_lines` = Σ (c−1) over repeated
  * lines, `line_chars` = Σ c·len, `dup_line_chars` = Σ (c−1)·len — the
  * exact aggregates the duplicate-line-fraction gates divide. Same
  * per-document argument as [[GopherGramStats]]; same byte-walk line
  * split as [[LineFilterStats]] (0x0A never occurs inside a multi-byte
  * UTF-8 sequence), line equality is byte equality, `len` counts code
  * points. A doc with no non-empty line returns all zeros (n_lines = 0 ⇔
  * the declarative form's groupBy emitted no row for the doc).
  */
case class GopherLineStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes() = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"gopher_line_stats expects STRING, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("dup_lines", LongType, nullable = false),
    StructField("line_chars", LongType, nullable = false),
    StructField("dup_line_chars", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "gopher_line_stats"

  override protected def nullSafeEval(t: Any): Any =
    GopherRepUtil.lineStats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.GopherRepUtil.lineStats($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherLineStats =
    copy(child = newChild)
}

object GopherRepUtil {

  /** The paper's widths: top-gram concentration at 2–4, duplicate-gram
    * fraction at the 5..10 range's two ends (SCALE.md rationale).
    */
  val Widths: Seq[Int] = Seq(2, 3, 4, 5, 10)

  /** One count-and-length cell per distinct key. */
  private final class Cell(var c: Int, val len: Int)

  /** Count duplicates of `keys(i)` (byte equality) with code-point
    * lengths `lens(i)`, and fold into (all = Σ c·len,
    * top = c·len of the max-(c, len) key, dup = Σ c·len where c ≥ 2),
    * appended to `out` at `o`.
    */
  private def foldCounts(map: java.util.HashMap[UTF8String, Cell],
      out: Array[Any], o: Int): Unit = {
    var all = 0L
    var dup = 0L
    var topC = 0
    var topLen = 0
    val it = map.values().iterator()
    while (it.hasNext) {
      val cell = it.next()
      val cl = cell.c.toLong * cell.len
      all += cl
      if (cell.c >= 2) dup += cl
      if (cell.c > topC || (cell.c == topC && cell.len > topLen)) {
        topC = cell.c; topLen = cell.len
      }
    }
    out(o) = all
    out(o + 1) = topC.toLong * topLen
    out(o + 2) = dup
  }

  /** One pass per width over the doc's own token array; token bytes and
    * code-point lengths are materialized once and shared by all five
    * widths' gram builds.
    */
  def gramStats(arr: org.apache.spark.sql.catalyst.util.ArrayData): InternalRow = {
    val m = arr.numElements()
    val tokBytes = new Array[Array[Byte]](m)
    val tokCp = new Array[Int](m)
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      tokBytes(i) = t.getBytes
      tokCp(i) = t.numChars()
      i += 1
    }
    val out = new Array[Any](Widths.length * 3)
    val map = new java.util.HashMap[UTF8String, Cell]()
    var w = 0
    while (w < Widths.length) {
      val n = Widths(w)
      if (m >= n) {
        map.clear()
        var s = 0
        while (s + n <= m) {
          // gram = single-space join of tokens s..s+n-1, built once as
          // raw bytes (UTF8String equality/hash is byte equality)
          var bytes = n - 1
          var cp = n - 1
          var j = s
          while (j < s + n) { bytes += tokBytes(j).length; cp += tokCp(j); j += 1 }
          val g = new Array[Byte](bytes)
          var o = 0
          j = s
          while (j < s + n) {
            if (j > s) { g(o) = ' '; o += 1 }
            System.arraycopy(tokBytes(j), 0, g, o, tokBytes(j).length)
            o += tokBytes(j).length
            j += 1
          }
          val key = UTF8String.fromBytes(g)
          val cell = map.get(key)
          if (cell == null) map.put(key, new Cell(1, cp)) else cell.c += 1
          s += 1
        }
        foldCounts(map, out, w * 3)
      } else {
        out(w * 3) = 0L; out(w * 3 + 1) = 0L; out(w * 3 + 2) = 0L
      }
      w += 1
    }
    new GenericInternalRow(out)
  }

  /** Non-empty-line duplicate counts in one byte walk (split at 0x0A,
    * zero-byte lines skipped).
    */
  def lineStats(t: UTF8String): InternalRow = {
    val bytes = t.getBytes
    val nb = bytes.length
    val map = new java.util.HashMap[UTF8String, Cell]()
    var start = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || bytes(i) == '\n') {
        if (i > start) {
          var cp = 0
          var j = start
          while (j < i) { if ((bytes(j) & 0xC0) != 0x80) cp += 1; j += 1 }
          val key = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, i))
          val cell = map.get(key)
          if (cell == null) map.put(key, new Cell(1, cp)) else cell.c += 1
        }
        start = i + 1
      }
      i += 1
    }
    var nLines = 0L
    var dupLines = 0L
    var lineChars = 0L
    var dupLineChars = 0L
    val it = map.values().iterator()
    while (it.hasNext) {
      val cell = it.next()
      nLines += cell.c
      lineChars += cell.c.toLong * cell.len
      if (cell.c >= 2) {
        dupLines += cell.c - 1
        dupLineChars += (cell.c - 1).toLong * cell.len
      }
    }
    new GenericInternalRow(Array[Any](nLines, dupLines, lineChars, dupLineChars))
  }
}
