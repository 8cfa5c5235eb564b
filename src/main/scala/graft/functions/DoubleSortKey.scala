package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Order-preserving IEEE-754 key: maps a DOUBLE to a LONG whose SIGNED
  * order equals the double's numeric order (radix-sort key).
  *
  *   b = doubleToLongBits(v)
  *   k = b >= 0 ? b : b ^ 0x7FFFFFFFFFFFFFFF
  *
  * Positive doubles keep their ascending bit patterns (non-negative
  * longs); negative doubles keep the sign bit and flip the magnitude
  * bits, reversing their order so more-negative sorts lower. The top
  * bits of k are then a FIXED-width, data-independent bucket id
  * (shiftright(k, s)) that is monotone in v — the exact-percentile
  * operator buckets on it without a prior min/max pass over the data,
  * dropping a full scan + broadcast wave from the plan.
  *
  * Codegen'd: stays inside whole-stage codegen in the aggregate's hash
  * probe loop.
  */
case class DoubleSortKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "double_sort_key"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects DOUBLE, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
    if (b >= 0L) b else b ^ 0x7FFFFFFFFFFFFFFFL
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""
         |long $b = java.lang.Double.doubleToLongBits($c);
         |${ev.value} = ($b >= 0L) ? $b : ($b ^ 0x7FFFFFFFFFFFFFFFL);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): DoubleSortKey =
    copy(child = c)
}

/** Exact inverse of [[DoubleSortKey]]: LONG key back to the DOUBLE it
  * encodes. The key is a bijection on the bit pattern, so operators can
  * carry ONLY the key through shuffles/aggregates (narrow primitive
  * rows, no per-row string/struct) and reconstruct the value at the
  * presentation edge. */
case class SortKeyToDouble(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sort_key_to_double"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects BIGINT, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any = {
    val k = v.asInstanceOf[Long]
    java.lang.Double.longBitsToDouble(if (k >= 0L) k else k ^ 0x7FFFFFFFFFFFFFFFL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = java.lang.Double.longBitsToDouble(
         |  ($c >= 0L) ? ($c) : (($c) ^ 0x7FFFFFFFFFFFFFFFL));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SortKeyToDouble =
    copy(child = c)
}

object DoubleSortKeyFn {
  import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
  def doubleSortKey(c: Column): Column = toColumn(DoubleSortKey(toExpression(c)))
  def sortKeyToDouble(c: Column): Column = toColumn(SortKeyToDouble(toExpression(c)))
}
