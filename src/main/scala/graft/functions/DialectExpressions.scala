package graft.functions

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, RuntimeReplaceable, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** Scalar dialect surface DuckDB ships natively and Spark lacks
  * (reference delegates all of these to the embedded engine; probed
  * against DuckDB 1.0.0 for exact semantics). Everything here is a
  * codegen'd Catalyst expression — no UDFs. */
object DialectScalars {

  // ---------------------------------------------------------------- helpers

  def stripAccents(s: UTF8String): UTF8String = {
    val norm = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    UTF8String.fromString(norm.replaceAll("\\p{Mn}+", ""))
  }

  /** DuckDB format_bytes: binary units, one TRUNCATED decimal
    * ("1.9 KiB" for 2040), "N bytes"/"1 byte" below 1 KiB. */
  def formatBytes(n: Long): UTF8String = {
    val units = Array("KiB", "MiB", "GiB", "TiB", "PiB", "EiB")
    val neg = n < 0
    val abs = Math.abs(n)
    val s =
      if (abs < 1024) s"$abs ${if (abs == 1) "byte" else "bytes"}"
      else {
        var k = 0
        var base = 1024L
        while (k < units.length - 1 && abs / base >= 1024) { k += 1; base *= 1024 }
        val tenths = abs * 10 / base // floor at one decimal, like DuckDB
        s"${tenths / 10}.${tenths % 10} ${units(k)}"
      }
    UTF8String.fromString(if (neg) "-" + s else s)
  }

  def gamma(x: Double): Double = org.apache.commons.math3.special.Gamma.gamma(x)
  def lgamma(x: Double): Double = org.apache.commons.math3.special.Gamma.logGamma(x)

  def gcd(a: Long, b: Long): Long = {
    var x = Math.abs(a); var y = Math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0 else Math.abs(a / gcd(a, b) * b)

  /** PostgreSQL/DuckDB age(): symbolic year/month/day/time difference —
    * whole months from t2 up to t1 (end-of-month clamped), then days,
    * then the time remainder. Negative differences mirror. */
  def age(t1Micros: Long, t2Micros: Long): CalendarInterval = {
    if (t1Micros < t2Micros) {
      val i = age(t2Micros, t1Micros)
      return new CalendarInterval(-i.months, -i.days, -i.microseconds)
    }
    val d1 = DateTimeUtils.microsToLocalDateTime(t1Micros)
    val d2 = DateTimeUtils.microsToLocalDateTime(t2Micros)
    var months = ChronoUnit.MONTHS.between(d2, d1).toInt // clamp-aware whole months
    var base = d2.plusMonths(months.toLong)
    if (base.isAfter(d1)) { months -= 1; base = d2.plusMonths(months.toLong) }
    val days = ChronoUnit.DAYS.between(base, d1).toInt
    val rem = base.plusDays(days.toLong)
    val micros = ChronoUnit.MICROS.between(rem, d1)
    new CalendarInterval(months, days, micros)
  }

  /** time_bucket: width in whole days (origin Monday 2000-01-03) or
    * sub-day micros (origin 2000-01-01), both per DuckDB. */
  val dayOriginDays: Int = 10959 // 2000-01-03 as days since epoch
  val microOrigin: Long = 946684800000000L // 2000-01-01 00:00:00 UTC in micros
  val dayOriginMicros: Long = dayOriginDays.toLong * 86400000000L // 2000-01-03 in micros

  def bucketDays(days: Int, widthDays: Int): Int = {
    val off = days - dayOriginDays
    val b = Math.floorDiv(off, widthDays) * widthDays
    dayOriginDays + b
  }

  def bucketMicros(micros: Long, widthMicros: Long): Long =
    bucketMicrosFrom(micros, widthMicros, microOrigin)

  /** Day-granular widths anchor at Monday 2000-01-03 even for
    * TIMESTAMP inputs (DuckDB: week buckets start on Monday). */
  def bucketMicrosDays(micros: Long, widthDays: Int): Long =
    bucketMicrosFrom(micros, widthDays.toLong * 86400000000L, dayOriginMicros)

  def bucketMicrosFrom(micros: Long, widthMicros: Long, origin: Long): Long = {
    val off = micros - origin
    origin + Math.floorDiv(off, widthMicros) * widthMicros
  }
}

/** One-argument double math dispatched on a tag (gamma, lgamma) —
  * commons-math3 (already on Spark's classpath) provides the special
  * functions the JDK lacks. */
case class MathUnary(fn: String, child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$fn expects DOUBLE, got ${other.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = fn match {
    case "gamma" => DialectScalars.gamma(v.asInstanceOf[Double])
    case _ => DialectScalars.lgamma(v.asInstanceOf[Double])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DialectScalars.getClass.getName.stripSuffix("$")
    val m = if (fn == "gamma") "gamma" else "lgamma"
    defineCodeGen(ctx, ev, v => s"$helper.$m($v)")
  }
  override protected def withNewChildInternal(c: Expression): MathUnary = copy(child = c)
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"strip_accents expects STRING, got ${other.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    DialectScalars.stripAccents(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DialectScalars.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, v => s"$helper.stripAccents($v)")
  }
  override protected def withNewChildInternal(c: Expression): StripAccents = copy(child = c)
}

case class FormatBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"format_bytes expects BIGINT, got ${other.simpleString}")
  }
  private def toLong(v: Any): Long = v match {
    case i: Int => i.toLong; case l: Long => l; case s: Short => s.toLong; case b: Byte => b.toLong
  }
  override def nullSafeEval(v: Any): Any = DialectScalars.formatBytes(toLong(v))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DialectScalars.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, v => s"$helper.formatBytes((long) $v)")
  }
  override protected def withNewChildInternal(c: Expression): FormatBytes = copy(child = c)
}

case class GcdLcm(fn: String, left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ByteType | ShortType | IntegerType | LongType,
            ByteType | ShortType | IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$fn expects integers")
    }
  private def toLong(v: Any): Long = v match {
    case i: Int => i.toLong; case l: Long => l; case s: Short => s.toLong; case b: Byte => b.toLong
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    if (fn == "gcd") DialectScalars.gcd(toLong(a), toLong(b))
    else DialectScalars.lcm(toLong(a), toLong(b))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DialectScalars.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$helper.$fn((long) $a, (long) $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GcdLcm =
    copy(left = l, right = r)
}

/** PostgreSQL/DuckDB `age(t1[, t2])` → CALENDAR INTERVAL with symbolic
  * year/month/day decomposition (reference clients use it via psql). */
case class AgeInterval(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = CalendarIntervalType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (TimestampType, TimestampType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("age expects timestamps")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    DialectScalars.age(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DialectScalars.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$helper.age($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AgeInterval =
    copy(left = l, right = r)
}

/** DuckDB time_bucket(width, ts): fixed-width buckets — day-granular
  * widths anchor at Monday 2000-01-03 and keep DATE inputs DATE;
  * sub-day widths anchor at 2000-01-01 in epoch micros. Month-granular
  * widths are not supported (raise at planning). */
case class TimeBucket(widthMonths: Int, widthDays: Int, widthMicros: Long, child: Expression)
    extends UnaryExpression {
  private def dayWidth = widthDays > 0 && widthMicros == 0
  override def dataType: DataType = child.dataType match {
    case DateType if dayWidth => DateType
    case DateType => TimestampType
    case other => other // TIMESTAMP in → TIMESTAMP out, NTZ preserved
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    if (widthMonths != 0)
      return TypeCheckResult.TypeCheckFailure("time_bucket: month-granular widths not supported")
    if (widthDays < 0 || widthMicros < 0 || (widthDays == 0 && widthMicros <= 0 && !dayWidth))
      return TypeCheckResult.TypeCheckFailure("time_bucket: width must be positive")
    child.dataType match {
      case DateType | TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"time_bucket expects DATE/TIMESTAMP, got ${other.simpleString}")
    }
  }
  override def nullSafeEval(v: Any): Any = child.dataType match {
    case DateType if dayWidth =>
      DialectScalars.bucketDays(v.asInstanceOf[Int], widthDays)
    case DateType =>
      DialectScalars.bucketMicros(DateTimeUtils.daysToMicros(v.asInstanceOf[Int],
        java.time.ZoneOffset.UTC), widthMicros)
    case _ if dayWidth =>
      DialectScalars.bucketMicrosDays(v.asInstanceOf[Long], widthDays)
    case _ =>
      DialectScalars.bucketMicros(v.asInstanceOf[Long], widthMicros)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DialectScalars.getClass.getName.stripSuffix("$")
    val code: String => String = child.dataType match {
      case DateType if dayWidth => v => s"$helper.bucketDays($v, $widthDays)"
      case DateType => v =>
        s"$helper.bucketMicros(org.apache.spark.sql.catalyst.util.DateTimeUtils.daysToMicros($v, java.time.ZoneOffset.UTC), ${widthMicros}L)"
      case _ if dayWidth => v => s"$helper.bucketMicrosDays($v, $widthDays)"
      case _ => v => s"$helper.bucketMicros($v, ${widthMicros}L)"
    }
    defineCodeGen(ctx, ev, code)
  }
  override protected def withNewChildInternal(c: Expression): TimeBucket = copy(child = c)
}

/** DuckDB `len(x)`: list/map length OR string length, dispatched on the
  * resolved argument type (Spark separates size() and length()). */
case class LenOf(child: Expression) extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Size(child, legacySizeOfNull = false), LongType)
    case _ => org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Length(child), LongType)
  }
  override protected def withNewChildInternal(c: Expression): LenOf = copy(child = c)
}

/** DuckDB `map(keys_list, values_list)` vs Spark's variadic
  * `map(k1, v1, …)`: two array-typed arguments build from arrays. */
case class MapDispatch(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  override lazy val replacement: Expression = (left.dataType, right.dataType) match {
    case (_: ArrayType, _: ArrayType) =>
      org.apache.spark.sql.catalyst.expressions.MapFromArrays(left, right)
    case _ => org.apache.spark.sql.catalyst.expressions.CreateMap(Seq(left, right))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MapDispatch =
    copy(left = l, right = r)
}
