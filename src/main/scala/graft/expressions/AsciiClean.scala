package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference corpus-cleanup chain
  * (reference `master.py:44-61`): strip the 32 ASCII `string.punctuation`
  * chars → trim `\s` runs at both ends → lowercase → drop non-ASCII chars,
  * in that exact order (quirk Q2: `don't` → `dont`, `café` → `caf`).
  *
  * Semantically identical to the 3-regex + lower chain in
  * `TextFunctions.cleanLineRegex`, but one code-generated pass instead of
  * three NFA traversals and four string allocations per row (SURVEY §7.3
  * reserved exactly this upgrade). `doGenCode` emits a plain static call, so
  * the expression stays inside whole-stage codegen — no CodegenFallback, no
  * interpreted row boundary.
  *
  * The common all-ASCII row takes a single byte-level pass with zero
  * intermediate allocation; rows with non-ASCII content fall back to a path
  * that reuses `UTF8String.toLowerCase` so Unicode case mapping (e.g.
  * `İ` → `i` + combining dot, whose ASCII residue must survive) matches
  * Spark's built-in `lower` bit-for-bit.
  */
case class AsciiClean(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "ascii_clean"

  override protected def nullSafeEval(input: Any): Any =
    AsciiCleanUtil.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.AsciiCleanUtil.clean($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiClean =
    copy(child = newChild)
}

object AsciiCleanUtil {

  /** Python `string.punctuation` membership table (ASCII range). */
  private val Punct: Array[Boolean] = {
    val t = new Array[Boolean](128)
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".foreach(c => t(c) = true)
    t
  }

  /** Java-regex `\s` (ASCII): space, \t, \n, , \f, \r. */
  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  /** Entry point (also the codegen call target via static forwarder). */
  def clean(s: UTF8String): UTF8String =
    if (s.isFullAscii) cleanAscii(s) else cleanGeneric(s.toString)

  /** Single-pass fast path for all-ASCII input. Punct-strip, trim, and
    * lowercase all act per-byte on ASCII, so one traversal + one boundary
    * trim reproduces the chain's strip→trim→lower order exactly.
    */
  private def cleanAscii(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val out = new Array[Byte](n)
    var len = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (!Punct(b)) {
        out(len) = (if (b >= 'A' && b <= 'Z') b + 32 else b).toByte
        len += 1
      }
      i += 1
    }
    var lo = 0
    var hi = len
    while (lo < hi && isWs(out(lo) & 0xff)) lo += 1
    while (hi > lo && isWs(out(hi - 1) & 0xff)) hi -= 1
    UTF8String.fromBytes(out, lo, hi - lo)
  }

  /** Exact-order general path: strip punct → trim → Spark `lower`
    * (via `UTF8String.toLowerCase`, so Unicode case mapping matches the
    * built-in) → drop non-ASCII chars.
    */
  private def cleanGeneric(str: String): UTF8String = {
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c >= 128 || !Punct(c)) sb.append(c)
      i += 1
    }
    var lo = 0
    var hi = sb.length
    while (lo < hi && isWs(sb.charAt(lo))) lo += 1
    while (hi > lo && isWs(sb.charAt(hi - 1))) hi -= 1
    val lowered = UTF8String.fromString(sb.substring(lo, hi)).toLowerCase.toString
    val out = new java.lang.StringBuilder(lowered.length)
    i = 0
    while (i < lowered.length) {
      val c = lowered.charAt(i)
      if (c < 128) out.append(c)
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}
