package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pack the "is this hex digit >= '8'" predicate of the first 32 characters
  * of a string into one INT mask (character i sets bit 31-i).
  *
  * This is the per-token kernel of the SimHash sketch: digit i of an md5
  * hex string is >= '8' exactly when the high bit of nibble i is set, and
  * the sketch majority-votes that bit over a document's tokens. The
  * composed-builtin form spends 64 `substring(md5(w), i, 1) >= '8'`
  * evaluations per token — 64 UTF8String allocations and string compares
  * per row in the aggregate's hot loop. This expression is one pass over
  * the md5's 32 bytes; the per-bit vote then becomes integer shift/mask
  * arithmetic on the packed word.
  *
  * Value parity with the builtin form it replaces: a single-character
  * substring compare against "8" is an unsigned byte compare of that one
  * ASCII character ('8'..'9','a'..'f' pass, '0'..'7' fail), and an
  * out-of-range substring yields "" which compares < "8" — so characters
  * past the string's end leave their bit clear. Property-fuzzed
  * bit-identical in HexMsbMaskProps.
  */
case class HexMsbMask(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // (Return type left inferred: AbstractDataType is private[sql];
  // Seq covariance makes Seq[DataType] a conforming override.)
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hex_msb_mask"

  override protected def nullSafeEval(h: Any): Any =
    HexMsbMaskUtil.mask(h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HexMsbMaskUtil.mask($c)")

  override protected def withNewChildInternal(newChild: Expression): HexMsbMask =
    copy(child = newChild)
}

object HexMsbMaskUtil {

  /** One pass over the raw UTF-8 bytes, indexed by CHARACTER exactly as
    * Spark's `substring` counts them, so the packed bits match
    * `substring(h, i+1, 1) >= '8'` on ANY input — not just the md5-hex
    * ASCII domain (the function is SQL-registered session-wide, so the
    * general contract must hold). Comparing a one-character UTF8String
    * against "8" is an unsigned byte-lexicographic compare — decided
    * entirely by the character's FIRST byte (every multi-byte lead
    * 0xC2..0xF4 is > '8', so any non-ASCII character sets its bit). The
    * walk advances by `UTF8String.numBytesForFirstByte` — the SAME table
    * Spark's substring uses — so even invalid UTF-8 (stray continuation
    * bytes, truncated sequences, which a binary→string cast can smuggle
    * in) indexes identically to the predicate this replaces. On ASCII
    * this degenerates to the byte-per-character fast path.
    * Property-fuzzed bit-identical in HexMsbMaskProps (incl. non-ASCII);
    * invalid-UTF-8 parity pinned in TextFunctionsSpec against Spark's own
    * substring evaluation.
    */
  def mask(s: UTF8String): Int = {
    val nb = s.numBytes()
    var m = 0
    var i = 0 // byte index
    var c = 0 // character index (Spark substring semantics)
    while (i < nb && c < 32) {
      // one unsafe read per character: the signed byte feeds the advance,
      // its unsigned view (& 0xFF) the compare
      val sb = s.getByte(i)
      if ((sb & 0xFF) >= '8') m |= 1 << (31 - c)
      c += 1
      i += UTF8String.numBytesForFirstByte(sb)
    }
    m
  }
}
