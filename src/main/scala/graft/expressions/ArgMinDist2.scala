package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native nearest-centroid argmin for the Lloyd assignment pass:
  * `arg_min_dist2(v, cents)` over `v: ARRAY<DOUBLE>` and
  * `cents: ARRAY<STRUCT<cid INT, c ARRAY<DOUBLE>>>`, returning
  * `STRUCT<d2 DOUBLE, cid INT>` — the (squared-L2, cluster-id)
  * lexicographic minimum over the centroid list.
  *
  * Value-identical to the HOF spelling it replaces
  * (`element_at(array_sort(transform(cents, ct -> struct(dist2(v, ct.c),
  * ct.cid))), 1)`, kept as [[graft.functions.VectorFunctions.argMinDist2Hof]]
  * and spec-pinned bit-equal): per-centroid distance is the same
  * sequential left fold as [[DotProduct]]/`dist2` (fixed summation
  * order, bit-exact), ties on exact d2 break toward the smaller cid
  * exactly like the lexicographic struct sort, and `(x−y)²` is never
  * −0.0 so plain `<`/`==` on primitives is the full ordering (no NaN in
  * the corpus by construction, as everywhere in this family).
  *
  * Why native: the HOF transform evaluates its lambda INTERPRETED — K
  * boxed dist2 folds per row per pass. K was a compile-time 8 when the
  * HOF cost was acceptable; with K derived from the corpus
  * (SemDeDup's provisioning rule — cells must stay under the candidate
  * cap as the corpus grows, see SimilarityQueries.kmeansK) the argmin is
  * K·dim work per row and MUST stay inside whole-stage codegen to keep
  * the assignment pass a scan, not the bottleneck.
  *
  * Null semantics: null `v` or null `cents` → NULL (nullSafeEval). A
  * degenerate centroid entry (null struct, null/length-mismatched
  * centroid array, null element) or an EMPTY centroid list → NULL
  * result, loudly — the HOF form would produce an undefined-order sort
  * over null distances there; no valid corpus reaches either state.
  */
case class ArgMinDist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes() = {
    val ok = left.dataType match {
      case ArrayType(DoubleType, _) => right.dataType match {
        case ArrayType(StructType(Array(f1, f2)), _) =>
          f1.dataType == IntegerType &&
            (f2.dataType match {
              case ArrayType(DoubleType, _) => true
              case _ => false
            })
        case _ => false
      }
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"arg_min_dist2 expects (ARRAY<DOUBLE>, ARRAY<STRUCT<INT, ARRAY<DOUBLE>>>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "arg_min_dist2"

  override protected def nullSafeEval(v: Any, cents: Any): Any =
    ArgMinDist2Util.argMin(v.asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) => {
      val tmp = ctx.freshName("amin")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $tmp =
         |  graft.expressions.ArgMinDist2Util.argMin($v, $cents);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMinDist2 =
    copy(left = newLeft, right = newRight)
}

object ArgMinDist2Util {

  /** One kernel for the codegen and interpreted paths. Returns null on
    * any degenerate input (empty list, null entry, dim mismatch, null
    * element) — see the expression scaladoc.
    */
  def argMin(v: ArrayData, cents: ArrayData): InternalRow = {
    val k = cents.numElements()
    if (k == 0) return null
    val dim = v.numElements()
    var bestD2 = 0.0
    var bestCid = 0
    var found = false
    var i = 0
    while (i < k) {
      if (cents.isNullAt(i)) return null
      val entry = cents.getStruct(i, 2)
      if (entry.isNullAt(0) || entry.isNullAt(1)) return null
      val cid = entry.getInt(0)
      val c = entry.getArray(1)
      if (c.numElements() != dim) return null
      var acc = 0.0
      var j = 0
      while (j < dim) {
        if (v.isNullAt(j) || c.isNullAt(j)) return null
        val d = v.getDouble(j) - c.getDouble(j)
        acc += d * d
        j += 1
      }
      if (!found || acc < bestD2 || (acc == bestD2 && cid < bestCid)) {
        bestD2 = acc
        bestCid = cid
        found = true
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestD2, bestCid))
  }
}
