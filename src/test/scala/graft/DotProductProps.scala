package graft

import graft.expressions.DotProductUtil
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck fuzz of the native [[graft.expressions.DotProduct]] kernel
  * against the straight-line sequential fold it must reproduce bit-for-bit
  * (the zip_with+aggregate HOF order, which the DuckDB oracle also
  * mirrors) — including NaN/infinity propagation and the length-mismatch
  * NULL rule. Complements the Spark-level parity tests in
  * VectorFunctionsSpec.
  */
object DotProductProps extends Properties("DotProduct") {

  private val element: Gen[Double] = Gen.frequency(
    8 -> Gen.choose(-1e6, 1e6),
    1 -> Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1e300, -1e300),
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))

  private val vec: Gen[Array[Double]] =
    Gen.choose(0, 128).flatMap(n => Gen.listOfN(n, element)).map(_.toArray)

  private def fold(a: Array[Double], b: Array[Double]): java.lang.Double =
    if (a.length != b.length) null
    else {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }

  private def native(a: Array[Double], b: Array[Double]): java.lang.Double =
    DotProductUtil.dot(ArrayData.toArrayData(a), ArrayData.toArrayData(b))

  private def bitsEqual(x: java.lang.Double, y: java.lang.Double): Boolean =
    (x == null && y == null) ||
      (x != null && y != null &&
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y))

  property("equals the sequential fold bit-for-bit (same-length vectors)") =
    Prop.forAll(vec) { a =>
      Prop.forAll(Gen.listOfN(a.length, element).map(_.toArray)) { b =>
        bitsEqual(native(a, b), fold(a, b))
      }
    }

  property("length mismatch is NULL") =
    Prop.forAll(vec, vec) { (a, b) =>
      a.length == b.length || native(a, b) == null
    }
}
