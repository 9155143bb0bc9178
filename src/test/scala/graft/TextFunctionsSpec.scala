package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cleanup-chain edge cases pinned to the reference semantics
  * (reference master.py:44-61; SURVEY.md §2.12 Q2).
  */
class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("line").select(cleanLine($"line")).as[String].head()

  private def tok(s: String): Seq[String] =
    Seq(s).toDF("line").select(tokens(cleanLine($"line")).as("t")).as[Seq[String]].head()

  test("punctuation stripped before lowercase: don't -> dont") {
    assert(clean("Don't") == "dont")
  }

  test("hyphenated words fuse: re-use -> reuse") {
    assert(clean("re-use") == "reuse")
  }

  test("non-ASCII deleted after lowering: Café -> caf") {
    assert(clean("Café") == "caf")
  }

  test("all 32 string.punctuation chars removed") {
    val punct = """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""
    assert(clean(s"a${punct}b") == "ab")
  }

  test("trim removes surrounding whitespace") {
    assert(clean("  hello world \t") == "hello world")
  }

  test("tokenize matches Python str.split(): no empty tokens") {
    assert(tok("  foo   bar\tbaz  ") == Seq("foo", "bar", "baz"))
    assert(tok("   ") == Seq.empty)
    assert(tok("") == Seq.empty)
  }

  test("faithful-mode a-z filter drops digit-leading tokens (quirk Q1)") {
    val df = Seq("1st", "2", "abc", "zebra").toDF("w")
    val kept = df.filter(azLeading($"w")).as[String].collect().toSet
    assert(kept == Set("abc", "zebra"))
  }
}
