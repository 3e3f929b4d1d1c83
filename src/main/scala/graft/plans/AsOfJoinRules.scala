package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeMap, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Filter pushdown THROUGH the custom as-of node — the §7.3 option-(c)
  * `Rule[LogicalPlan]` leg. Catalyst's own PushPredicateThroughJoin
  * only knows built-in nodes, so without this rule a
  * `Filter(cond, AsOfJoinNode(...))` strands the predicate above the
  * join and the parquet scans read everything:
  *
  *  - conjuncts referencing only LEFT output push into the left child
  *    (as-of is left-preserving: each left row maps to exactly one
  *    output row, so a left-only predicate commutes with the join);
  *  - pushed conjuncts over the left JOIN KEYS additionally copy to
  *    the right child with the key attributes rewritten — right rows
  *    of a filtered-out key can never be matched, so pre-filtering
  *    them is free candidate reduction on both exchange inputs;
  *  - right-referencing and nondeterministic conjuncts stay above
  *    (a right-column predicate does NOT commute: failing the match
  *    nulls the row rather than dropping it — left-outer semantics).
  *
  * Registered at session build via
  * `SparkSessionExtensions.injectOptimizerRule` and on live sessions
  * via `experimental.extraOptimizations` (NativeAsOfJoin self-registers
  * both the strategy and this rule on first use).
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j @ AsOfJoinNode(l, r, lk, rk, _, _, _)) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(l.outputSet))
      if (pushable.isEmpty) f
      else {
        val leftToRightKey = AttributeMap(lk.zip(rk))
        val keyOnly = pushable.filter(_.references.forall(a =>
          lk.exists(_.semanticEquals(a))))
        val rightCopies = keyOnly.map(_.transform {
          case a: Attribute => leftToRightKey.getOrElse(a, a)
        })
        val newLeft = Filter(pushable.reduce(org.apache.spark.sql.catalyst.expressions.And), l)
        val newRight =
          if (rightCopies.isEmpty) r
          else Filter(rightCopies.reduce(org.apache.spark.sql.catalyst.expressions.And), r)
        val pushed = j.copy(left = newLeft, right = newRight)
        kept.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Column pruning through the custom as-of node — the other half of
  * what Catalyst's ColumnPruning can't do for unknown nodes: when a
  * Project above the join uses only a subset of each side's output,
  * insert child Projects keeping exactly the referenced columns plus
  * the join keys and timestamps. The parquet scans then read only
  * those columns (ReadSchema narrows), and — more importantly at
  * 100 TB — the exchanges ship only them.
  */
object PruneColumnsThroughAsOfJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j @ AsOfJoinNode(l, r, lk, rk, lts, rts, _)) =>
      val needed = org.apache.spark.sql.catalyst.expressions.AttributeSet(
        projList.flatMap(_.references) ++ lk ++ rk ++ Seq(lts, rts))
      val keepL = l.output.filter(needed.contains)
      val keepR = r.output.filter(needed.contains)
      if (keepL.length == l.output.length && keepR.length == r.output.length) p
      else Project(projList, j.copy(
        left = if (keepL.length == l.output.length) l else Project(keepL, l),
        right = if (keepR.length == r.output.length) r else Project(keepR, r)))
  }
}
