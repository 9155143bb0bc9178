package graft.plans

import graft.expressions.AsciiClean
import graft.functions.TextFunctions
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Lower, RegExpReplace}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule rewriting the documented composed-built-ins cleanup chain
  *
  * `regexp_replace(lower(regexp_replace(regexp_replace(x, PUNCT, ''), TRIM,
  * ''))), NONASCII, '')`
  *
  * into the single-pass native [[AsciiClean]] — SQL users (and anyone
  * composing `TextFunctions.cleanLineRegex`) get the codegen'd one-pass
  * form without knowing it exists. Pattern-matches the EXACT regex
  * literals this library documents (SURVEY §2.2 P1–P5); any deviation in
  * pattern, replacement, or order is left untouched, so the rewrite can
  * never change semantics (AsciiClean ≡ the chain is property-tested in
  * AsciiCleanProps). Injected via `GraftExtensions.injectOptimizerRule`.
  */
object CleanupChainRule extends Rule[LogicalPlan] {

  private def is(e: Expression, s: String): Boolean = e match {
    case Literal(v, _) => v != null && v.toString == s
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case RegExpReplace(
            Lower(RegExpReplace(RegExpReplace(x, p, r1, pos1), t, r2, pos2)),
            na, r3, pos3)
          if is(p, TextFunctions.PunctClass) && is(t, TextFunctions.TrimRe) &&
            is(na, TextFunctions.NonAscii) &&
            is(r1, "") && is(r2, "") && is(r3, "") &&
            // a non-default start position changes semantics — only the
            // full-string (pos=1) form is equivalent to AsciiClean
            is(pos1, "1") && is(pos2, "1") && is(pos3, "1") =>
        AsciiClean(x)
    }
}
