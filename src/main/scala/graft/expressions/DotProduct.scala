package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native sequential-fold dot product of two `ARRAY<DOUBLE>` columns.
  *
  * Value-identical to the higher-order-function form
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)`
  * — same left-to-right fold (bit-exact doubles, so the DuckDB oracle
  * mirrors keep matching), same null semantics (mismatched lengths or a
  * null element → NULL, exactly what zip_with's null-padding + null
  * propagation through `+` produce).
  *
  * Why native: Catalyst's higher-order functions evaluate their lambdas
  * INTERPRETED (they are excluded from whole-stage codegen), so the HOF
  * cosine costs three boxed lambda invocations per element per row — the
  * hot inner loop of every ANN/dedup-embedding pair score. This
  * expression is one tight primitive loop, and `doGenCode` emits a plain
  * static call so it stays inside whole-stage codegen.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // ImplicitCastInputTypes: ARRAY<FLOAT>/ARRAY<INT> arguments coerce to
  // ARRAY<DOUBLE> like they did through the HOF composition — the SQL
  // surface must not be stricter than the form it replaced. (Return type
  // left inferred: AbstractDataType is private[sql]; Seq covariance makes
  // Seq[ArrayType] a conforming override.)
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.expressions.DotProductUtil.dot($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProductUtil {

  /** Boxed so codegen/interpreted paths share one null-aware kernel.
    * Strictly ascending index order = the HOF fold order.
    */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
