package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `double → DECIMAL(18,6)` without BigDecimal: the unscaled value is
  * `Math.round(v * 1e6)` (HALF_UP for the non-negative money/quantity
  * columns this feeds), wrapped as a compact long-backed Decimal.
  *
  * `CAST(double AS DECIMAL(18,6))` routes every row through
  * `BigDecimal.valueOf(v).setScale(6)` — an allocation plus slow-path
  * rounding that dominates decimal-exact aggregations like TPC-H Q1
  * (4 casts × every lineitem row). The arithmetic here is identical
  * for inputs whose magnitude fits 12 integer digits; larger values
  * (unscaled beyond ±9.2e18 would overflow the long) raise, matching
  * ANSI cast-overflow behavior.
  */
case class DoubleToDec6(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DecimalType(18, 6)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"to_dec6 expects DOUBLE, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case f: java.lang.Float => DoubleToDec6.toDec(f.toDouble)
    case d => DoubleToDec6.toDec(d.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DoubleToDec6.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, v => s"$helper.toDec($v)")
  }

  override protected def withNewChildInternal(c: Expression): DoubleToDec6 = copy(child = c)
}

object DoubleToDec6 {
  def toDec(v: Double): Decimal = {
    val scaled = v * 1e6
    // fast path only where Math.round provably matches the exact
    // decimal expansion: |scaled| small enough that one FP multiply's
    // absolute error (≤ ulp) stays far below the 1e-3 boundary guard,
    // and the fraction not within the guard of a rounding boundary.
    // Everything else — including ties, where HALF_UP on negatives
    // differs between Math.round and BigDecimal — takes the exact path.
    if (java.lang.Double.isFinite(scaled) && Math.abs(scaled) < 1e13) {
      val frac = scaled - Math.floor(scaled)
      if (Math.abs(frac - 0.5) > 1e-3)
        return Decimal.createUnsafe(Math.round(scaled), 18, 6)
    }
    exact(v)
  }

  /** Bit-identical to `CAST(v AS DECIMAL(18,6))`: the exact decimal
    * expansion of the double, HALF_UP at scale 6. */
  def exact(v: Double): Decimal = {
    if (v.isNaN || v.isInfinite)
      throw new ArithmeticException(s"to_dec6 overflow: $v")
    val bd = java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP)
    Decimal(bd, 18, 6)
  }

  /** Column-level helper for query definitions. */
  def dec6(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
    toColumn(DoubleToDec6(toExpression(c)))
  }
}

/** `double → long` at a fixed decimal scale: `(long) Math.floor(v *
  * factor + 0.5)` — nearest-rounding for inputs that sit on the
  * `1/factor` grid (the 2-decimal money/rate columns: their doubles
  * are within ~1e-9 of the grid point, never at a .5/factor tie), as
  * one codegen'd multiply+floor with no allocation. `round()` on
  * DOUBLE routes every row through `BigDecimal.setScale`, and the
  * dialect layer rewrites `floor()` to the DOUBLE-returning DuckDB
  * form — this expression is the internal fast path the fixed-point
  * aggregates (FixedPointSum) consume.
  */
case class DoubleToScaledLong(child: Expression, factor: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"to_scaled_long expects DOUBLE, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case f: java.lang.Float => Math.floor(f.toDouble * factor + 0.5).toLong
    case d => Math.floor(d.asInstanceOf[Double] * factor + 0.5).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"(long) Math.floor((double)($v) * $factor + 0.5d)")

  override protected def withNewChildInternal(c: Expression): DoubleToScaledLong = copy(child = c)
}

object DoubleToScaledLong {
  /** Column helper: 2-decimal double → integer cents/hundredths long. */
  def cents(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
    toColumn(DoubleToScaledLong(toExpression(c), 100))
  }
}
