package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** Top-k projection transpose: `Limit(Sort(Project(exprs, child)))` →
  * `Project(exprs, Limit(Sort(child)))` when the sort keys resolve
  * against `child` and the projection computes something non-trivial.
  *
  * Catalyst keeps projections below sorts (column pruning works that
  * way), so a `SELECT expensive_expr FROM t ORDER BY key LIMIT k`
  * evaluates the expression for EVERY row and then discards all but k.
  * At 100 TB the top-k scan itself is unavoidable, but per-row
  * expression work (JSON parsing, regex, vector math) for rows that
  * cannot survive the limit is pure waste — this rule defers it to the
  * k survivors. Physical planning still fuses the inner
  * `Limit(Sort(child))` into TakeOrderedAndProject; the transposed
  * projection then runs on k rows.
  *
  * Safety: fires only when every projection expression is
  * deterministic, sort order references only `child` output (no
  * computed aliases), and at least one projection is more than an
  * attribute/literal/alias-of-attribute (else there is nothing to
  * save). Idempotent: the rewritten shape no longer matches.
  */
object ProjectThroughTopK extends Rule[LogicalPlan] {

  private def trivial(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e match {
      case _: Attribute | _: Literal => true
      case a: Alias => trivial(a.child)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case gl @ GlobalLimit(_, ll @ LocalLimit(_,
        srt @ Sort(order, true, prj @ Project(exprs, child), _)))
        if exprs.forall(_.deterministic) &&
          exprs.exists(e => !trivial(e)) &&
          order.forall(_.references.subsetOf(child.outputSet)) =>
      Project(exprs,
        gl.copy(child = ll.copy(child = srt.copy(child = child))))
  }
}
