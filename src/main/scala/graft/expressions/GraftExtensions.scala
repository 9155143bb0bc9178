package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions exposing graft's native expressions to SQL
  * (`SELECT ascii_clean(text) …`). Installed by `EngineSession.local`;
  * external users pass `spark.sql.extensions=graft.expressions.GraftExtensions`.
  *
  * DataFrame-API callers don't need this — `TextFunctions.cleanLine` builds
  * the expression directly — it exists so the SQL surface is complete.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("ascii_clean"),
      new ExpressionInfo(classOf[AsciiClean].getName, "ascii_clean"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => AsciiClean(c)
        case _ => throw new IllegalArgumentException(
          s"ascii_clean expects exactly 1 argument, got ${children.size}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException(
          s"dot_product expects exactly 2 arguments, got ${children.size}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("hex_msb_mask"),
      new ExpressionInfo(classOf[HexMsbMask].getName, "hex_msb_mask"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => HexMsbMask(c)
        case _ => throw new IllegalArgumentException(
          s"hex_msb_mask expects exactly 1 argument, got ${children.size}")
      }))
    // upgrade hand-composed regex cleanup chains to the native expression
    ext.injectOptimizerRule(_ => graft.plans.CleanupChainRule)
  }
}
