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
}
