package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native content-defined-chunking boundary scan:
  * `cdc_boundary_ends(tokens)` over `ARRAY<STRING>` returns the 1-based
  * token positions `i ∈ [w, n]` whose trailing `w`-token window hashes
  * to a boundary — exactly the positions the HOF spelling selected with
  * `filter(sequence(w, n), i -> substring(md5(concat_ws(" ",
  * slice(tv, i-w+1, w))), 1, 1) = "0")` (FastCDC's gear-hash boundary
  * test transposed to the md5-prefix rule both engine mirrors share;
  * the first hex digit is '0' iff the digest's leading nibble is 0, a
  * P=1/16 data-dependent boundary).
  *
  * Why native: the HOF form re-materializes and re-hashes the joined
  * window string through three interpreted lambda layers PER TOKEN —
  * `doc_chunks_cdc` was the catalog's #2 query at sf10 (153 s,
  * run-to-run identical) on exactly that constant factor. This kernel
  * extracts each token's UTF-8 bytes once per row, rebuilds only the
  * w-token window buffer per position, and calls MD5 directly —
  * the same O(n·w) byte work with none of the lambda/boxing tax — and
  * `doGenCode` keeps it inside whole-stage codegen
  * ([[DotProduct]]/[[AsciiClean]] precedent).
  *
  * Fidelity: the window string is the tokens joined with a single 0x20,
  * null elements skipped without doubling the separator (concat_ws
  * semantics); `n < w` yields an EMPTY list (the HOF's `otherwise`
  * branch). The digest is computed over the identical bytes, so the
  * emitted positions are bit-for-bit the HOF's and the DuckDB mirror's
  * ([[graft.queries.CurationQueries.cdcChunksSqlRel]] is unchanged).
  */
case class CdcBoundaryEnds(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_boundary_ends expects ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cdc_boundary_ends"

  override protected def nullSafeEval(tv: Any): Any =
    CdcBoundaryUtil.ends(tv.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.CdcBoundaryUtil.ends($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaryEnds =
    copy(child = newChild)
}

object CdcBoundaryUtil {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Boundary positions of the token array under the w-token md5-prefix
    * rule. One kernel for the codegen and interpreted paths.
    */
  def ends(tv: ArrayData, w: Int): ArrayData = {
    val n = tv.numElements()
    if (n < w) return new GenericArrayData(Array.emptyIntArray)
    // token bytes extracted ONCE; null elements marked and skipped at
    // join time exactly like concat_ws (no doubled separator)
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tv.isNullAt(i)) null else tv.getUTF8String(i).getBytes
      i += 1
    }
    val digest = md5.get()
    val out = new java.util.ArrayList[Integer](n / 8 + 4)
    var end = w // 1-based inclusive end of the window
    while (end <= n) {
      digest.reset()
      var j = end - w
      var first = true
      while (j < end) {
        val t = toks(j)
        if (t != null) {
          if (!first) digest.update(' '.toByte)
          digest.update(t)
          first = false
        }
        j += 1
      }
      // first hex digit '0' ⇔ leading nibble of the digest is 0
      if ((digest.digest()(0) & 0xF0) == 0) out.add(end)
      end += 1
    }
    val arr = new Array[Int](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}
