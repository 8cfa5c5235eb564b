package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard membership cap that fails LOUDLY — the
  * §5 guard for the dedup bucket aggregations (VERDICT r15 item 4 /
  * ADVICE r15).
  *
  * A plain collect_list holds an entire group in ONE aggregation-buffer
  * row that cannot spill per-group: a degenerate bucket (a multi-
  * million-member exact-duplicate cluster is normal in a 100 TB dedup
  * corpus) OOMs the task with no indication of which bucket or why.
  * This variant enforces the cap ON EVERY UPDATE/MERGE, so per-group
  * memory is bounded by cap × element size at all times, and a
  * pathological bucket fails the query with a message naming the
  * bucket size limit and the conf to raise.
  *
  * Why fail-loudly instead of routing oversized buckets through a
  * streaming self-join: all three routing designs were built and
  * measured this round (OPTIMIZATION_r16.md) — each costs a structural
  * re-execution (count+join-back re-runs the map work: ReuseExchange
  * cannot share an exchange whose other consumer prunes columns; a
  * window count sorts the whole bucket table: regressed at sf1; a
  * shared explicit repartition still duplicates the map work because
  * self-join relation deduplication defeats cross-Union-branch
  * exchange reuse). And for the pair-emitting queries guarded here,
  * a bucket beyond the cap implies ≥ cap²/2 output pairs — the query
  * result itself is infeasible, so the operationally correct behavior
  * is a bounded-memory, descriptive failure, not a silent grind.
  */
case class BoundedCollectList(
    child: Expression,
    cap: Int,
    what: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(cap > 0, "bounded_collect_list cap must be positive")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override protected def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  // lazy: child.dataType must not be touched while the expression is
  // still unresolved (same pattern as Spark's own CollectList)
  override protected lazy val bufferElementType: DataType = child.dataType

  private def guard(buffer: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    if (buffer.length > cap) {
      throw new org.apache.spark.SparkException(
        s"[graft] $what bucket exceeds spark.graft.dedup.bucketExplodeCap " +
          s"($cap members). A bucket this size implies >= cap^2/2 candidate " +
          "pairs - the exact pair set is infeasible to emit; raise the conf " +
          "only if you mean it.")
    }
    buffer
  }

  override def update(buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] =
    guard(super.update(buffer, input))

  override def merge(buffer: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] =
    guard(super.merge(buffer, other))

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BoundedCollectList =
    copy(child = newChild)

  override def prettyName: String = "bounded_collect_list"
}

object BoundedCollectList {
  /** Column-level entry point (mirrors functions.collect_list). */
  def column(c: Column, cap: Int, what: String): Column =
    GraftBridge.toColumn(
      BoundedCollectList(GraftBridge.toExpression(c), cap, what)
        .toAggregateExpression())
}
