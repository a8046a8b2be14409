package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: prune columns through [[GreedyThin]].
  *
  * Catalyst's ColumnPruning does not know the custom node, so
  * `thin(df).select("k")` would otherwise scan EVERY column of the
  * input — the classic unpruned-read defect at 100 TB. The operator
  * is a filter (it passes rows through unchanged), so any column not
  * needed by the parent projection and not one of its own
  * (keys, ts, tiebreak) inputs can be dropped BELOW it: a Project is
  * inserted under the node, the node's output (= child.output)
  * shrinks with it, and the scan's ReadSchema shrinks to match
  * (spec-pinned). Fires only when it strictly narrows the child, so
  * it is idempotent and cannot loop with CollapseProject.
  */
object PruneColumnsThroughGreedyThin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(exprs, gt: GreedyThin) =>
      val needed = AttributeSet(exprs.flatMap(_.references)) ++
        AttributeSet(gt.keys.flatMap(_.references)) ++
        gt.ts.references ++ gt.gap.references ++
        AttributeSet(gt.tiebreak.flatMap(_.references))
      val kept = gt.child.output.filter(needed.contains)
      if (kept.length == gt.child.output.length) p
      else p.copy(child = gt.copy(child = Project(kept, gt.child)))
  }
}
