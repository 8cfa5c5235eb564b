package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `list_sum` / `list_aggregate(l, 'sum')` — sum of a list's elements
  * with the result type dispatched on the ELEMENT type, matching DuckDB
  * (reference dialect surface; DuckDB list_sum([1,2,3]) = 6, an
  * integer, not 6.0):
  *
  *   - integral elements → BIGINT (exact above 2^53, overflow raises)
  *   - float/double      → DOUBLE
  *   - decimal(p,s)      → DECIMAL(38,s) (stable precision, so the
  *                         accumulator type does not widen per step the
  *                         way a raw `aggregate()` lambda does)
  *
  * NULL elements are ignored; an empty or all-NULL list sums to NULL
  * (SQL aggregate semantics). A generic `ArrayAggregate` cannot express
  * this: its accumulator must hold ONE static type, so either every
  * list sums as DOUBLE (lossy for bigint) or decimal lists fail to
  * type-check (decimal addition widens precision every step). Codegen
  * emits a static-helper call, keeping the projection inside
  * whole-stage codegen (dialect scalar — not a bench hot path, but no
  * interpreted-fallback cliff either).
  */
case class ListSum(child: Expression) extends UnaryExpression {

  private def elem: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _                => NullType
  }

  override def dataType: DataType = elem match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType => DoubleType
    case d: DecimalType         => DecimalType(38, d.scale)
    case _                      => LongType
  }

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"list_sum expects ARRAY<numeric>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    elem match {
      case ByteType | ShortType | IntegerType | LongType =>
        ListSum.sumIntegral(a, ListSum.kindOf(elem))
      case FloatType        => ListSum.sumFloating(a, isFloat = true)
      case DoubleType       => ListSum.sumFloating(a, isFloat = false)
      case d: DecimalType   => ListSum.sumDecimal(a, d.precision, d.scale)
      case other            => throw new IllegalStateException(s"list_sum: $other")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ListSum.getClass.getName.stripSuffix("$")
    val call = elem match {
      case ByteType | ShortType | IntegerType | LongType =>
        (a: String) => s"$helper.sumIntegral($a, ${ListSum.kindOf(elem)})"
      case FloatType        => (a: String) => s"$helper.sumFloating($a, true)"
      case DoubleType       => (a: String) => s"$helper.sumFloating($a, false)"
      case d: DecimalType   => (a: String) => s"$helper.sumDecimal($a, ${d.precision}, ${d.scale})"
      case other            => throw new IllegalStateException(s"list_sum: $other")
    }
    val box = CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, a => {
      val res = ctx.freshName("lsRes")
      s"""
         |Object $res = ${call(a)};
         |${ev.isNull} = $res == null;
         |if (!${ev.isNull}) { ${ev.value} = ($box) $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): ListSum = copy(child = c)
}

object ListSum {
  // element-kind tags for the integral getter switch (stable across codegen)
  final val KByte = 0; final val KShort = 1; final val KInt = 2; final val KLong = 3

  private[functions] def kindOf(it: DataType): Int = it match {
    case ByteType => KByte; case ShortType => KShort
    case IntegerType => KInt; case _ => KLong
  }

  /** Boxed Long sum, null if no non-null elements; overflow raises
    * (ANSI-mode spirit — silent wraparound would corrupt results). */
  def sumIntegral(a: ArrayData, kind: Int): java.lang.Long = {
    val n = a.numElements(); var acc = 0L; var seen = false; var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = kind match {
          case KByte => a.getByte(i).toLong
          case KShort => a.getShort(i).toLong
          case KInt => a.getInt(i).toLong
          case _ => a.getLong(i)
        }
        acc = Math.addExact(acc, v); seen = true
      }
      i += 1
    }
    if (seen) java.lang.Long.valueOf(acc) else null
  }

  /** Boxed Double sum (sequential left-to-right fold, matching DuckDB's
    * order for the oracle's hash compare), null if no elements. */
  def sumFloating(a: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = a.numElements(); var acc = 0.0; var seen = false; var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        acc += (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)); seen = true
      }
      i += 1
    }
    if (seen) java.lang.Double.valueOf(acc) else null
  }

  /** Decimal(38, s) sum, null if no elements; raises if the total
    * exceeds 38 digits (same contract as Spark's decimal SUM). */
  def sumDecimal(a: ArrayData, precision: Int, scale: Int): Decimal = {
    val n = a.numElements(); var acc: java.math.BigDecimal = null; var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = a.getDecimal(i, precision, scale).toJavaBigDecimal
        acc = if (acc == null) v else acc.add(v)
      }
      i += 1
    }
    if (acc == null) null else Decimal(acc, 38, scale)
  }
}
