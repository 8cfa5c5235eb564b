package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Command, LogicalPlan, Repartition, ReturnAnswer, Sort}
import org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand
import org.apache.spark.sql.catalyst.rules.Rule

/** Presentation-sort rewrite: a global `ORDER BY` at the ROOT of a query
  * (directly, or as the input of the terminal write/command node) is a
  * presentation order for the result set, not an intra-pipeline
  * operator. Spark plans it as a range exchange, and the
  * `RangePartitioner` first runs a SEPARATE sampling job that
  * re-executes the sort's child (everything after the last shuffle
  * materialization) just to pick split points — one extra stage wave on
  * every single query. Every engine ultimately funnels a result set
  * through one client stream (DuckDB gathers morsel outputs the same
  * way); doing the total order at that gather point — one round-robin
  * exchange into a single partition, sorted there — produces the
  * identical rows in the identical order with one fewer job and no
  * re-execution.
  *
  * Scale note (the reason this is a root-only rule): for RESULT-sized
  * outputs (aggregates, top-k, filtered reports) the single gather task
  * is strictly cheaper at any scale. For data-sized outputs (an ORDER BY
  * over a full 100 TB projection) a range sort's parallel write is the
  * right plan — so the rewrite is opt-in per session
  * (`spark.graft.presentationSort`, default off; Bench/Verify turn it on
  * for the result-sized oracle corpus) and never touches sorts below the
  * root: window sorts, sort-merge-join sorts, and `LIMIT` top-k plans
  * (root = GlobalLimit → TakeOrderedAndProject) are unaffected.
  */
object PresentationSort extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.presentationSort"

  private def present(s: Sort): LogicalPlan =
    s.copy(global = false,
      child = Repartition(numPartitions = 1, shuffle = true, child = s.child))

  /** Rewrite the root spine only: the sort itself, or a sort feeding the
    * terminal command/write node (noop bench sink, parquet verify dump,
    * CTAS). Anything deeper is a genuine intra-pipeline sort. */
  private def rewriteRoot(p: LogicalPlan): LogicalPlan = p match {
    case s @ Sort(_, true, _, _) => present(s)
    case r: ReturnAnswer => r.withNewChildren(r.children.map(rewriteRoot))
    case w: V2WriteCommand => w.withNewChildren(w.children.map(rewriteRoot))
    case c: Command if c.children.size == 1 =>
      c.withNewChildren(c.children.map(rewriteRoot))
    // coalesce(1) above the root sort (Verify's one-file dump): a
    // single-partition coalesce concatenates partitions in order, so
    // the total order survives the descent
    case r @ Repartition(1, false, _) =>
      r.withNewChildren(r.children.map(rewriteRoot))
    case _ => p
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(ConfKey, "false") == "true") rewriteRoot(plan)
    else plan
}
