package graft

import graft.expressions.HexMsbMaskUtil
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck fuzz of the native [[graft.expressions.HexMsbMask]] kernel
  * against the composed-builtin predicate it replaces in the SimHash
  * pipeline: bit 31-i of the mask must equal `substring(h, i+1, 1) >= '8'`
  * (single-character lexicographic compare; out-of-range substring is ""
  * which compares < "8"). Fuzzed over hex strings (the md5 domain), short
  * strings, and arbitrary ASCII.
  */
object HexMsbMaskProps extends Properties("HexMsbMask") {

  private val hexChar: Gen[Char] = Gen.oneOf("0123456789abcdef".toSeq)
  private val asciiChar: Gen[Char] = Gen.choose(1.toChar, 127.toChar)

  private val hex32: Gen[String] = Gen.listOfN(32, hexChar).map(_.mkString)
  private val shortHex: Gen[String] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, hexChar)).map(_.mkString)
  private val ascii: Gen[String] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, asciiChar)).map(_.mkString)

  /** The reference semantics: character-level substring compare. */
  private def reference(s: String): Int = {
    var m = 0
    for (i <- 0 until 32) {
      val sub = if (i < s.length) s.substring(i, i + 1) else ""
      if (sub >= "8") m |= 1 << (31 - i)
    }
    m
  }

  private def native(s: String): Int =
    HexMsbMaskUtil.mask(UTF8String.fromString(s))

  property("equals the substring predicate on md5-shaped hex") =
    Prop.forAll(hex32) { s => native(s) == reference(s) }

  property("equals the substring predicate on short hex (trailing bits clear)") =
    Prop.forAll(shortHex) { s => native(s) == reference(s) }

  property("equals the substring predicate on arbitrary ASCII") =
    Prop.forAll(ascii) { s => native(s) == reference(s) }

  // --- non-ASCII: the SQL-facing contract is CODEPOINT-indexed ---
  // Spark's substring counts codepoints, and a one-codepoint UTF8String
  // compares against "8" byte-lexicographically, which UTF-8 makes
  // equivalent to comparing the codepoint itself against 0x38. (The Java
  // String reference above can't express this: String.substring counts
  // UTF-16 units and would split surrogate pairs.)
  private val anyCodepoint: Gen[Int] = Gen.oneOf(
    Gen.choose(0x01, 0x7f), // ASCII
    Gen.choose(0x80, 0x7ff), // 2-byte UTF-8
    Gen.choose(0x4e00, 0x9fff), // CJK, 3-byte
    Gen.choose(0x1f300, 0x1f6ff)) // emoji, 4-byte (surrogate pair in UTF-16)

  private val mixed: Gen[String] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, anyCodepoint))
      .map(_.flatMap(Character.toChars(_)).mkString)

  private def referenceCodepoints(s: String): Int = {
    val cps = s.codePoints().toArray
    var m = 0
    for (i <- 0 until 32)
      if (i < cps.length && cps(i) >= '8') m |= 1 << (31 - i)
    m
  }

  property("codepoint-indexed on mixed-width input (incl. astral)") =
    Prop.forAll(mixed) { s => native(s) == referenceCodepoints(s) }
}
