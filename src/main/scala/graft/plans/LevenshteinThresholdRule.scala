package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a threshold comparison on an unbounded levenshtein is
  * rewritten to
  *
  *   abs(length(a) - length(b)) <= k  AND  levenshtein(a, b, k) >= 0
  *
  * Both conjuncts are pure wins for fuzzy-join filters at scale:
  * - `|len(a)-len(b)| <= levenshtein(a,b)` always, so the cheap length
  *   guard short-circuits the O(n·m) DP for most non-matching pairs;
  * - the bounded form `levenshtein(a, b, k)` (Spark 3.5+) abandons the
  *   DP as soon as the running distance exceeds k and returns -1.
  *
  * The rewrite flips the predicate shape (`>= 0` on the bounded form),
  * so the rule cannot re-match its own output — naturally fixpoint-safe.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      f.copy(condition = rewrite(cond))
  }

  private def rewrite(e: Expression): Expression = e transformUp {
    case LessThanOrEqual(lev @ Levenshtein(a, b, None), k @ Literal(_, IntegerType)) =>
      guarded(a, b, k, k)
    case GreaterThanOrEqual(k @ Literal(_, IntegerType), lev @ Levenshtein(a, b, None)) =>
      guarded(a, b, k, k)
    case LessThan(lev @ Levenshtein(a, b, None), Literal(k: Int, IntegerType)) =>
      guarded(a, b, Literal(k - 1), Literal(k - 1))
  }

  private def guarded(
      a: Expression, b: Expression,
      lenBound: Expression, threshold: Expression): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), lenBound),
      GreaterThanOrEqual(Levenshtein(a, b, Some(threshold)), Literal(0)))
}
