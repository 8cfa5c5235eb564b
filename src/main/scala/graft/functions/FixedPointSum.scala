package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Exact sum of fixed-point LONG values with a ZERO-allocation,
  * pure-primitive accumulator — the Spark-side answer to a native
  * engine's int128 money sum (the reference delegates these to
  * DuckDB's hugeint SUM; `duck_server` README.md:17 "OLAP").
  *
  * Spark's built-in `sum` over `DECIMAL(p,0)` is exact but allocates a
  * `Decimal` per row inside the agg update (plus overflow bookkeeping),
  * which is the dominant per-row cost of the TPC-H revenue aggregates
  * once the per-row multiply is already a long (`BENCH_NOTES` q1/q3
  * class). This aggregate keeps the running total as TWO long buffer
  * slots interpreted as `hi * 2^62 + lo` with `lo ∈ [0, 2^62)`:
  *
  *  - update: `tmp = lo + v; hi += tmp >> 62; lo = tmp & (2^62-1)`
  *    — arithmetic shift IS floor-division for negative `tmp`, and the
  *    bitmask IS the matching floor-modulus, so negative inputs
  *    normalize correctly with no branches;
  *  - merge: same normalization on `lo₁ + lo₂` (each < 2^62, so the
  *    long add cannot overflow);
  *  - evaluate: `hi * 2^62 + lo` reconstructed in DECIMAL(38,0) — a
  *    per-GROUP cost, not per-row.
  *
  * Whole-stage codegen sees only long add/shift/and and a boolean or:
  * no object churn, no ANSI overflow branches (every intermediate is
  * proven in range). Capacity is ±2^125 ≈ 4.2e37 — a 100 TB group sum
  * of 1e-6-scaled money (~1e23) has 14 orders of magnitude headroom,
  * where a raw LONG sum would silently wrap at ~9.2e18.
  *
  * Contract: inputs must satisfy |v| < 2^61 (callers pass per-row
  * money products ≤ ~1.2e11). NULL inputs are skipped; an all-NULL
  * group yields NULL, matching SQL SUM.
  */
case class FixedPointSum(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fixed_point_sum expects BIGINT, got ${other.simpleString}")
  }
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "fixed_point_sum"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  private def mask = Literal((1L << 62) - 1)
  private def shift = Literal(62)
  // LEGACY arithmetic: the invariants above prove no long overflow is
  // possible, so the ANSI checked-add branches would be dead weight in
  // the per-row codegen.
  private def add(l: Expression, r: Expression) = Add(l, r, EvalMode.LEGACY)

  override lazy val updateExpressions: Seq[Expression] = {
    val v = Coalesce(Seq(child, Literal(0L)))
    val tmp = add(lo, v)
    Seq(
      add(hi, ShiftRight(tmp, shift)),
      BitwiseAnd(tmp, mask),
      Or(seen, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val tmp = add(lo.left, lo.right)
    Seq(
      add(add(hi.left, hi.right), ShiftRight(tmp, shift)),
      BitwiseAnd(tmp, mask),
      Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression = {
    val hiDec = Multiply(
      Cast(hi, DecimalType(20, 0)),
      Literal(Decimal(1L << 62), DecimalType(19, 0)),
      EvalMode.LEGACY)
    val total = Add(hiDec, Cast(lo, DecimalType(20, 0)), EvalMode.LEGACY)
    If(seen, Cast(total, DecimalType(38, 0)), Literal(null, DecimalType(38, 0)))
  }

  override protected def withNewChildInternal(c: Expression): FixedPointSum =
    copy(child = c)
}

object FixedPointSum {
  /** SUM(longColumn) → DECIMAL(38,0), exact, allocation-free per row. */
  def sumFix(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
    toColumn(FixedPointSum(toExpression(c)).toAggregateExpression())
  }
}
