package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bounded edit-distance predicates get the banded
  * kernel.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic
  * program and then compares — but Spark's three-argument
  * `Levenshtein(l, r, threshold)` runs the banded variant, O(k·max)
  * with early exit, returning -1 when the distance exceeds the
  * threshold. The two predicates are equivalent:
  * `lev(a,b) <= k  ⟺  lev(a,b,k) >= 0` (a non-(-1) result is by
  * construction ≤ k, and NULL inputs yield NULL on both sides). For
  * a near-dup gate where most pairs are far apart — the normal case
  * after cheap blocking — the banded kernel abandons each rejected
  * pair after ~k·max steps instead of max² (and any projected full
  * distance is then computed only for the rows that survive the
  * pushed-down filter).
  *
  * The rewrite fires only on a bare two-argument `Levenshtein`
  * compared to a non-negative integer literal, and always produces
  * the three-argument form — which the patterns below never match —
  * so the rule is idempotent under the optimizer's fixed-point batch.
  * Registered via `GraftExtensions` (`injectOptimizerRule`) and, for
  * externally built sessions, `Sessions.ensureQueryConfs`
  * (`experimental.extraOptimizations`).
  */
object LevenshteinThreshold extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None),
          Literal(k: Int, IntegerType)) if k >= 0 => bounded(l, r, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType),
          Levenshtein(l, r, None)) if k >= 0 => bounded(l, r, k)
      case LessThan(Levenshtein(l, r, None),
          Literal(k: Int, IntegerType)) if k >= 1 => bounded(l, r, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType),
          Levenshtein(l, r, None)) if k >= 1 => bounded(l, r, k - 1)
    }

  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))
}
