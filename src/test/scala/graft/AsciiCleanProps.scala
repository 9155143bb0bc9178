package graft

import graft.expressions.AsciiCleanUtil
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck fuzz of the native [[graft.expressions.AsciiClean]] cleanup
  * against a straight-line reference built from the SAME primitives Spark's
  * built-ins use (java.util.regex + `UTF8String.toLowerCase`), over
  * generator-mixed ASCII / punctuation / whitespace / Unicode input —
  * including the case-mapping edge cases (İ, ß, Σ) where a naive
  * reimplementation diverges. Complements the example-based and
  * whole-corpus equality tests in TextFunctionsSpec.
  */
object AsciiCleanProps extends Properties("AsciiClean") {

  /** The regex chain verbatim (reference order: punct → trim → lower →
    * ascii), the ground truth the native expression must match.
    */
  private def reference(s: String): String = {
    val p1 = s.replaceAll("""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]""", "")
    val p2 = p1.replaceAll("""^\s+|\s+$""", "")
    val p3 = UTF8String.fromString(p2).toLowerCase.toString
    p3.replaceAll("""[^\x00-\x7F]""", "")
  }

  private def clean(s: String): String =
    AsciiCleanUtil.clean(UTF8String.fromString(s)).toString

  private val asciiPrintable: Gen[Char] = Gen.choose(32, 126).map(_.toChar)
  private val punct: Gen[Char] = Gen.oneOf("""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""".toSeq)
  private val ws: Gen[Char] = Gen.oneOf(' ', '\t', '\n', '\r', '\f', '\u000B')
  private val caseEdge: Gen[Char] = Gen.oneOf('İ', 'ı', 'ß', 'Σ', 'ς', 'é', 'Ä', 'ﬀ')
  private val bmp: Gen[Char] = Gen.choose(0x80, 0xFFFF).map(_.toChar)
    .suchThat(c => !Character.isSurrogate(c))
  private val astral: Gen[String] = Gen.choose(0x10000, 0x10FFFF)
    .map(cp => new String(Character.toChars(cp)))

  private val mixed: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> asciiPrintable.map(_.toString),
    2 -> punct.map(_.toString),
    2 -> ws.map(_.toString),
    1 -> caseEdge.map(_.toString),
    1 -> bmp.map(_.toString),
    1 -> astral)).map(_.mkString)

  property("matches the regex chain on mixed input") = Prop.forAll(mixed) { s =>
    val got = clean(s)
    val want = reference(s)
    if (got != want) println(
      s"input=${s.map(c => f"\\u${c.toInt}%04x").mkString} got=$got want=$want")
    got == want
  }

  // NOTE: the chain is deliberately NOT idempotent on arbitrary Unicode —
  // the reference trims with ASCII `\s` BEFORE ASCII-folding, so non-ASCII
  // whitespace (e.g. U+2028) survives the trim and is then folded away,
  // which can expose new edge whitespace (quirk of the reference's cleanup
  // order, master.py:44-61). Parity with the chain is the contract; the
  // stronger invariants below hold on the all-ASCII fast path.

  property("output is ASCII and punctuation-free") = Prop.forAll(mixed) { s =>
    clean(s).forall(c =>
      c < 128 && !"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~""".contains(c))
  }

  private val asciiOnly: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> asciiPrintable, 2 -> punct, 2 -> ws)).map(_.mkString)

  property("idempotent on ASCII input") = Prop.forAll(asciiOnly) { s =>
    val once = clean(s)
    clean(once) == once
  }

  property("ASCII input: no leading/trailing whitespace, all lowercase") =
    Prop.forAll(asciiOnly) { s =>
      val out = clean(s)
      (out.isEmpty || (!out.head.isWhitespace && !out.last.isWhitespace)) &&
        !out.exists(c => c >= 'A' && c <= 'Z')
    }
}
