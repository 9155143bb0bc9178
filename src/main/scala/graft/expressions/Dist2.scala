package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native sequential-fold squared-L2 distance of two `ARRAY<DOUBLE>`
  * columns — [[DotProduct]]'s skeleton with a `(x−y)²` kernel.
  *
  * Value-identical to the higher-order-function form
  * `aggregate(zip_with(a, b, (x, y) => (x−y)*(x−y)), 0.0, (acc, v) => acc + v)`
  * — same left-to-right fold (bit-exact doubles; subtraction, multiply
  * and add are each exactly rounded, so the DuckDB `list_reduce` mirrors
  * keep matching), same null semantics (length mismatch or a null
  * element → NULL).
  *
  * Why native: the per-query ADC-table stage evaluates dist2 once per
  * (query, subspace, codeword) — corpus × PqM · PqK rows for knn_join —
  * and the HOF lambdas run interpreted (excluded from whole-stage
  * codegen), three boxed invocations per element per row. One tight
  * primitive loop; `doGenCode` emits a static call so the stage stays
  * inside whole-stage codegen.
  */
case class Dist2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // ImplicitCastInputTypes: ARRAY<FLOAT> coerces to ARRAY<DOUBLE>, as
  // through the HOF composition (DotProduct's rationale).
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dist2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Dist2Util.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("d2")
      s"""
         |java.lang.Double $tmp = graft.expressions.Dist2Util.dist2($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2 =
    copy(left = newLeft, right = newRight)
}

object Dist2Util {

  /** Boxed so codegen/interpreted paths share one null-aware kernel.
    * Strictly ascending index order = the HOF fold order.
    */
  def dist2(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}
