package graft.plans

import graft.functions.expr.JaccardSortedLong
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a filter `jaccard(a, b) >= t` implies the cheap
  * size bound `t * max(|a|,|b|) <= min(|a|,|b|)` — because
  * |A∩B| ≤ min and |A∪B| ≥ max, so j ≤ min/max. The rule injects that
  * bound as an extra conjunct, pruning length-skewed pairs with two
  * array-length reads BEFORE the O(|a|+|b|) merge-walk kernel runs.
  *
  * On uniform-length corpora (the test data) it's a no-op cost-wise;
  * on real corpora — where document lengths are heavy-tailed and most
  * blocked pairs differ wildly in size — it short-circuits the
  * majority of kernel evaluations. Results are unchanged: the bound is
  * implied by the predicate it accompanies.
  *
  * Idempotence (the optimizer runs user rules to fixpoint): the rule
  * skips any filter that already contains an injected bound, detected
  * structurally (t * greatest(...) <= least(...) over the same
  * children).
  */
object JaccardSizeBound extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val wanted = thresholds(cond).filterNot(alreadyBounded(cond))
      if (wanted.isEmpty) f
      else Filter(And(cond, wanted.map(bound).reduce(And)), child)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** (jaccard-expr, threshold) pairs guarded by this condition. */
  private def thresholds(cond: Expression): Seq[(JaccardSortedLong, Double)] =
    conjuncts(cond).collect {
      case GreaterThanOrEqual(j: JaccardSortedLong, Literal(t: Double, DoubleType)) if t > 0 => (j, t)
      case GreaterThan(j: JaccardSortedLong, Literal(t: Double, DoubleType)) if t > 0 => (j, t)
      case LessThanOrEqual(Literal(t: Double, DoubleType), j: JaccardSortedLong) if t > 0 => (j, t)
      case LessThan(Literal(t: Double, DoubleType), j: JaccardSortedLong) if t > 0 => (j, t)
    }

  private def sizes(j: JaccardSortedLong): (Expression, Expression) =
    (Cast(Size(j.left, legacySizeOfNull = false), DoubleType),
      Cast(Size(j.right, legacySizeOfNull = false), DoubleType))

  private def bound(jt: (JaccardSortedLong, Double)): Expression = {
    val (j, t) = jt
    val (sa, sb) = sizes(j)
    LessThanOrEqual(Multiply(Literal(t), Greatest(Seq(sa, sb))), Least(Seq(sa, sb)))
  }

  /** Structural detection of an already-injected bound for `j`. */
  private def alreadyBounded(cond: Expression)(jt: (JaccardSortedLong, Double)): Boolean = {
    val (j, _) = jt
    conjuncts(cond).exists {
      case LessThanOrEqual(Multiply(Literal(_, DoubleType), Greatest(Seq(a, _)), _), Least(_)) =>
        a.semanticEquals(sizes(j)._1)
      case _ => false
    }
  }
}
