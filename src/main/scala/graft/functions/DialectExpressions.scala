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

  def nfcNormalize(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** unicode(): code point of the first character; -1 for '' (DuckDB). */
  def unicodeCp(s: UTF8String): Int = {
    val str = s.toString
    if (str.isEmpty) -1 else str.codePointAt(0)
  }

  /** Escape regex metacharacters (DuckDB regexp_escape / RE2::QuoteMeta:
    * backslash every non-[A-Za-z0-9_] ASCII char). */
  def regexpEscape(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length * 2)
    str.foreach { c =>
      val safe = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c > 127
      if (!safe) sb.append('\\')
      sb.append(c)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Optimal-string-alignment Damerau-Levenshtein (DuckDB semantics:
    * damerau_levenshtein('ca','abc') = 2 is true DL; OSA gives 3 —
    * DuckDB returns 2, so full DL with alphabet map). */
  def damerauLevenshtein(aU: UTF8String, bU: UTF8String): Long = {
    val a = aU.toString; val b = bU.toString
    val inf = a.length + b.length
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](a.length + 2, b.length + 2)
    d(0)(0) = inf
    for (i <- 0 to a.length) { d(i + 1)(0) = inf; d(i + 1)(1) = i }
    for (j <- 0 to b.length) { d(0)(j + 1) = inf; d(1)(j + 1) = j }
    for (i <- 1 to a.length) {
      var db = 0
      for (j <- 1 to b.length) {
        val k = Option(da.get(b.charAt(j - 1))).map(_.intValue).getOrElse(0)
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          math.min(d(i)(j + 1) + 1, d(k)(l) + (i - k - 1) + 1 + (j - l - 1)))
      }
      da.put(a.charAt(i - 1), i)
    }
    d(a.length + 1)(b.length + 1).toLong
  }

  def jaro(aU: UTF8String, bU: UTF8String): Double = {
    val a = aU.toString; val b = bU.toString
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val window = math.max(a.length, b.length) / 2 - 1
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var matches = 0
    for (i <- a.indices) {
      val lo = math.max(0, i - window); val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
    }
    if (matches == 0) return 0.0
    var t = 0; var j = 0
    for (i <- a.indices if aM(i)) {
      while (!bM(j)) j += 1
      if (a.charAt(i) != b.charAt(j)) t += 1
      j += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - t / 2.0) / m) / 3.0
  }

  def jaroWinkler(aU: UTF8String, bU: UTF8String): Double = {
    val j = jaro(aU, bU)
    val a = aU.toString; val b = bU.toString
    var prefix = 0
    while (prefix < math.min(math.min(a.length, b.length), 4) &&
      a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  // parse_path family (DuckDB: forward-slash and backslash separators)
  private def pathParts(p: String): Array[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    if (p.startsWith("/") || p.startsWith("\\")) parts += p.substring(0, 1)
    p.split("[/\\\\]+").foreach(s => if (s.nonEmpty) parts += s)
    parts.toArray
  }
  def parsePath(p: UTF8String): Array[UTF8String] =
    pathParts(p.toString).map(UTF8String.fromString)
  def parseDirname(p: UTF8String): UTF8String = {
    val parts = pathParts(p.toString)
    UTF8String.fromString(if (parts.length >= 2) parts(0) else "")
  }
  def parseDirpath(p: UTF8String): UTF8String = {
    val s = p.toString
    val idx = math.max(s.lastIndexOf('/'), s.lastIndexOf('\\'))
    UTF8String.fromString(
      if (idx < 0) "" else if (idx == 0) s.substring(0, 1) else s.substring(0, idx))
  }
  def parseFilename(p: UTF8String, trimExt: Boolean): UTF8String = {
    val s = p.toString
    val idx = math.max(s.lastIndexOf('/'), s.lastIndexOf('\\'))
    val name = s.substring(idx + 1)
    val out = if (trimExt) {
      val dot = name.lastIndexOf('.')
      if (dot > 0) name.substring(0, dot) else name
    } else name
    UTF8String.fromString(out)
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

  /** PostgreSQL/DuckDB age(): symbolic year/month/day/time difference,
    * computed COMPONENT-WISE with borrowing (DuckDB interval_age):
    * time borrows 24h from days; days borrow days_in_month(t2's month).
    * This differs from a "whole months then remainder" walk when the
    * day-of-month decreases across unequal month lengths — e.g.
    * age('2024-03-15','2022-01-20') is 2y 1m 26d (borrow Jan=31), not
    * 2y 1m 24d (walk through Feb=29). Negative differences mirror. */
  def age(t1Micros: Long, t2Micros: Long): CalendarInterval = {
    if (t1Micros < t2Micros) {
      val i = age(t2Micros, t1Micros)
      return new CalendarInterval(-i.months, -i.days, -i.microseconds)
    }
    val d1 = DateTimeUtils.microsToLocalDateTime(t1Micros)
    val d2 = DateTimeUtils.microsToLocalDateTime(t2Micros)
    var micros = d1.toLocalTime.toNanoOfDay / 1000L - d2.toLocalTime.toNanoOfDay / 1000L
    var days = d1.getDayOfMonth - d2.getDayOfMonth
    var months = (d1.getYear - d2.getYear) * 12 + (d1.getMonthValue - d2.getMonthValue)
    if (micros < 0) { micros += 86400000000L; days -= 1 }
    if (days < 0) {
      days += java.time.YearMonth.of(d2.getYear, d2.getMonthValue).lengthOfMonth()
      months -= 1
    }
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

/** DuckDB 1-arg `trunc(x)`: toward-zero integer part KEEPING the
  * input's numeric type (trunc(1.9::DOUBLE) = 1.0::DOUBLE, trunc(5) =
  * 5), dispatched on the resolved argument. Floating inputs with
  * |x| ≥ 2^53 (including ±Inf) are already integral and pass through
  * untouched — the round-trip Cast would clamp them at ±2^63. NaN
  * passes through as NaN. Integral inputs are the identity. */
case class TruncTowardZero(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  override def prettyName: String = "trunc"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric argument, got ${dt.simpleString}")
    }
  override lazy val replacement: Expression = child.dataType match {
    case DoubleType | FloatType =>
      val d = Cast(child, DoubleType)
      val alreadyIntegral = Or(IsNaN(d),
        GreaterThanOrEqual(Abs(d), Literal(9.007199254740992e15)))
      val truncated = Cast(Cast(d, LongType, None, EvalMode.LEGACY), DoubleType)
      Cast(If(alreadyIntegral, d, truncated), child.dataType)
    case ByteType | ShortType | IntegerType | LongType => child
    // DuckDB trunc(DECIMAL(p,s)) keeps the decimal family: DECIMAL(p,0)
    // (fuzzer find: the BIGINT fallback diverged the wire OID/typeof).
    // Toward-zero = floor for ≥0, ceil for <0 — exact decimal ops, no
    // Long round-trip (which would clamp beyond-2^63 values)
    case dt: DecimalType =>
      val zero = Cast(Literal(0), dt)
      Cast(If(GreaterThanOrEqual(child, zero), Floor(child), Ceil(child)),
        DecimalType(math.max(dt.precision, 1), 0))
    case _ => Cast(child, LongType, None, EvalMode.LEGACY)
  }
  override protected def withNewChildInternal(c: Expression): TruncTowardZero = copy(child = c)
}

/** DuckDB slice `x[lo:hi]` — 1-based, both bounds inclusive, either
  * bound omissible (rewritten to NULL), over lists and strings —
  * dispatched on the resolved operand. Out-of-range clamps like
  * DuckDB's (Slice/Substring already clamp the high end; a hi < lo
  * yields the empty list/string via the greatest(…, 0) length). */
case class GraftSlice(child: Expression, lo: Expression, hi: Expression)
    extends RuntimeReplaceable with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  override def first: Expression = child
  override def second: Expression = lo
  override def third: Expression = hi
  override lazy val replacement: Expression = {
    val loC = Coalesce(Seq(Cast(lo, IntegerType), Literal(1)))
    def lenFrom(hiDefault: Expression) = {
      val hiC = Coalesce(Seq(Cast(hi, IntegerType), hiDefault))
      Greatest(Seq(Add(Subtract(hiC, loC), Literal(1)), Literal(0)))
    }
    child.dataType match {
      case StringType => Substring(child, loC, lenFrom(Length(child)))
      case _ => Slice(child, loC, lenFrom(Size(child)))
    }
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GraftSlice =
    copy(child = f, lo = s, hi = t)
}

/** RFC 7386 JSON merge patch (DuckDB json_merge_patch, reference
  * pass-through surface): object keys from the patch overwrite the
  * target's; explicit JSON null in the patch DELETES the key; non-object
  * patches replace the target wholesale. Jackson-based eval (Spark's
  * own bundled Jackson) — interpreted, not codegen'd; JSON string ops
  * are not a bulk-scan hot path. */
case class JsonMergePatch(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def merge(target: com.fasterxml.jackson.databind.JsonNode,
      patch: com.fasterxml.jackson.databind.JsonNode): com.fasterxml.jackson.databind.JsonNode = {
    import com.fasterxml.jackson.databind.node.ObjectNode
    if (!patch.isObject) return patch
    val result: ObjectNode =
      if (target.isObject) target.deepCopy[ObjectNode]()
      else mapper.createObjectNode()
    val it = patch.fields()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.isNull) result.remove(e.getKey)
      else result.set[ObjectNode](e.getKey, merge(result.path(e.getKey), e.getValue))
    }
    result
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = mapper.readTree(l.asInstanceOf[UTF8String].toString)
    val b = mapper.readTree(r.asInstanceOf[UTF8String].toString)
    UTF8String.fromString(mapper.writeValueAsString(merge(a, b)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonMergePatch =
    copy(left = l, right = r)
}

/** DuckDB json_contains(doc, needle): true when the needle JSON value
  * appears anywhere in the document tree (any-subtree equality, the
  * shape DuckDB implements). Jackson-based, interpreted. */
case class JsonContains(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def containedIn(doc: com.fasterxml.jackson.databind.JsonNode,
      needle: com.fasterxml.jackson.databind.JsonNode): Boolean = {
    if (doc == needle) return true
    val it = doc.elements()
    while (it.hasNext) if (containedIn(it.next(), needle)) return true
    false
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    try containedIn(
      mapper.readTree(l.asInstanceOf[UTF8String].toString),
      mapper.readTree(r.asInstanceOf[UTF8String].toString))
    catch { case _: Exception => null }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JsonContains =
    copy(left = l, right = r)
}

/** DuckDB date_trunc keeps DATE inputs DATE (Spark's always returns
  * TIMESTAMP); dispatched on the resolved operand type. */
case class DateTruncDispatch(fmt: Expression, child: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions.{Cast, TruncTimestamp}
  override def left: Expression = fmt
  override def right: Expression = child
  // explicit Casts AND timezone ids throughout — a replacement gets no
  // implicit coercion and no ResolveTimeZone pass, so every
  // TimeZoneAwareExpression must be born with its zone set
  /** DuckDB returns DATE for day-or-coarser units on ANY temporal
    * input (probed: date_trunc('day', ts) is a DATE), and the input's
    * timestamp flavor for finer units (fuzzer find). */
  private def coarse: Boolean = fmt match {
    case org.apache.spark.sql.catalyst.expressions.Literal(u: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      Set("year", "quarter", "month", "week", "day").contains(u.toString.toLowerCase)
    case _ => false
  }
  override lazy val replacement: Expression = {
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    def toTs(e: Expression) = Cast(e, TimestampType, tz)
    child.dataType match {
      case _ if coarse => Cast(TruncTimestamp(fmt, toTs(child), tz), DateType, tz)
      case TimestampType => TruncTimestamp(fmt, child, tz)
      case DateType => Cast(TruncTimestamp(fmt, toTs(child), tz), DateType, tz)
      case TimestampNTZType =>
        Cast(TruncTimestamp(fmt, toTs(child), tz), TimestampNTZType, tz)
      case _ => TruncTimestamp(fmt, toTs(child), tz)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DateTruncDispatch =
    copy(fmt = l, child = r)
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

/** String-distance metrics DuckDB ships and Spark lacks: full
  * Damerau-Levenshtein (LONG), Jaro and Jaro-Winkler similarity
  * (DOUBLE). Dispatched on a tag like MathUnary. */
case class StrMetric(fn: String, left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = fn match {
    case "damerau_levenshtein" => LongType
    case _ => DoubleType
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(s"$fn expects (STRING, STRING)")
    }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    fn match {
      case "damerau_levenshtein" => DialectScalars.damerauLevenshtein(x, y)
      case "jaro_similarity" => DialectScalars.jaro(x, y)
      case _ => DialectScalars.jaroWinkler(x, y)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DialectScalars.getClass.getName.stripSuffix("$")
    val m = fn match {
      case "damerau_levenshtein" => "damerauLevenshtein"
      case "jaro_similarity" => "jaro"
      case _ => "jaroWinkler"
    }
    defineCodeGen(ctx, ev, (a, b) => s"$helper.$m($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StrMetric =
    copy(left = l, right = r)
}

/** One-argument string helpers dispatched on a tag: unicode (INT code
  * point, -1 for ''), nfc_normalize, regexp_escape. */
case class StrUnary(fn: String, child: Expression) extends UnaryExpression {
  override def dataType: DataType = if (fn == "unicode") IntegerType else StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$fn expects STRING, got ${other.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    fn match {
      case "unicode" => DialectScalars.unicodeCp(s)
      case "nfc_normalize" => DialectScalars.nfcNormalize(s)
      case _ => DialectScalars.regexpEscape(s)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DialectScalars.getClass.getName.stripSuffix("$")
    val m = fn match {
      case "unicode" => "unicodeCp"
      case "nfc_normalize" => "nfcNormalize"
      case _ => "regexpEscape"
    }
    defineCodeGen(ctx, ev, v => s"$helper.$m($v)")
  }
  override protected def withNewChildInternal(c: Expression): StrUnary = copy(child = c)
}

/** nextafter(a, b) — the next representable double after a toward b. */
case class NextAfter(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure("nextafter expects (DOUBLE, DOUBLE)")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    Math.nextAfter(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.nextAfter($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NextAfter =
    copy(left = l, right = r)
}

/** parse_path(p): path components as a list ('/' root kept, DuckDB). */
case class ParsePath(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"parse_path expects STRING, got ${other.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      DialectScalars.parsePath(v.asInstanceOf[UTF8String]).asInstanceOf[Array[Any]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DialectScalars.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, v =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $helper.parsePath($v))")
  }
  override protected def withNewChildInternal(c: Expression): ParsePath = copy(child = c)
}

/** parse_dirname / parse_dirpath / parse_filename(p[, trimExt]). */
case class ParsePathPart(fn: String, child: Expression, trimExt: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$fn expects STRING, got ${other.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    fn match {
      case "parse_dirname" => DialectScalars.parseDirname(s)
      case "parse_dirpath" => DialectScalars.parseDirpath(s)
      case _ => DialectScalars.parseFilename(s, trimExt)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = DialectScalars.getClass.getName.stripSuffix("$")
    val call: String => String = fn match {
      case "parse_dirname" => v => s"$helper.parseDirname($v)"
      case "parse_dirpath" => v => s"$helper.parseDirpath($v)"
      case _ => v => s"$helper.parseFilename($v, $trimExt)"
    }
    defineCodeGen(ctx, ev, call)
  }
  override protected def withNewChildInternal(c: Expression): ParsePathPart = copy(child = c)
}

/** DuckDB `//` dispatch (fuzzer find): integer operands → integral
  * division; ANY non-integral operand → PLAIN division (probed:
  * 7.5 // 2 = 3.75, -27 // 7 = -3 in DuckDB 1.0 — the operator is
  * only "integer division" for integer inputs). */
case class FloorDivDispatch(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  override lazy val replacement: Expression =
    if (integral(left.dataType) && integral(right.dataType))
      // IntegralDivide is LONG-typed in Spark; the analyzer's coercion
      // doesn't run inside a replacement, so cast explicitly
      IntegralDivide(Cast(left, LongType), Cast(right, LongType))
    else Divide(Cast(left, DoubleType), Cast(right, DoubleType))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloorDivDispatch =
    copy(left = l, right = r)
}

/** DuckDB floor()/ceil() PRESERVE a floating-point input type (DOUBLE
  * → DOUBLE; DECIMAL → DECIMAL(p,0)); Spark's return BIGINT for
  * doubles. The type matters downstream: `floor(2.0) // 7` is PLAIN
  * division in DuckDB (0.2857…) because the operand is DOUBLE
  * (fuzzer find, seed 1). Decimal/integer inputs keep Spark's native
  * typing (already DECIMAL(p-s+1,0) / pass-through). */
case class FloorCeilDuck(child: Expression, isFloor: Boolean)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  override def prettyName: String = if (isFloor) "floor" else "ceil"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric argument, got ${dt.simpleString}")
    }
  override lazy val replacement: Expression = {
    def core(c: Expression): Expression = if (isFloor) Floor(c) else Ceil(c)
    child.dataType match {
      case DoubleType => Cast(core(child), DoubleType)
      // preserve the INPUT float width — DuckDB floor(FLOAT) is FLOAT;
      // Spark's Floor itself only accepts DOUBLE/DECIMAL/LONG, so the
      // FLOAT rides through DOUBLE and back
      case FloatType => Cast(core(Cast(child, DoubleType)), FloatType)
      // DuckDB floor/ceil(DECIMAL(p,s)) → DECIMAL(p,0); Spark's native
      // DECIMAL(p-s+1,0) holds the same values but diverges typeof()
      // and the wire type (fuzzer find; the ceil-of-all-nines value
      // always fits p-s+1 ≤ p digits for s ≥ 1, and s = 0 is identity)
      case dt: DecimalType =>
      val p = dt.precision
        Cast(core(child), DecimalType(p, 0))
      case _ => core(child)
    }
  }
  override protected def withNewChildInternal(c: Expression): FloorCeilDuck =
    copy(child = c)
}

/** DuckDB TRY_CAST(string AS integral) parses the string as a NUMBER
  * and ROUNDS half away from zero ('3.9' → 4, '-2.5' → -3, '3.14' →
  * 3); Spark's try_cast only accepts integer-shaped strings. Non-
  * string inputs keep plain TRY semantics. */
case class TryIntCastDuck(child: Expression, tyLit: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  override def left: Expression = child
  override def right: Expression = tyLit
  private def target: DataType = tyLit match {
    case Literal(s: UTF8String, StringType) => s.toString.toLowerCase match {
      case "bigint" => LongType
      case "int" | "integer" => IntegerType
      case "smallint" => ShortType
      case "tinyint" => ByteType
      case _ => LongType
    }
    case _ => LongType
  }
  override lazy val replacement: Expression = child.dataType match {
    case StringType =>
      Cast(Round(Cast(child, DoubleType, None, EvalMode.TRY), Literal(0)),
        target, None, EvalMode.TRY)
    case _ => Cast(child, target, None, EvalMode.TRY)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TryIntCastDuck =
    copy(child = l, tyLit = r)
}

/** DuckDB list_contains/list_has semantics (fuzzer find): a NULL
  * needle gives NULL, but NULL ELEMENTS never make the result NULL —
  * an absent needle is plain FALSE (Spark's array_contains returns
  * NULL there). The needle coerces to the array element type (DuckDB
  * compares in a common type; Spark errors on e.g. ARRAY<BIGINT> vs
  * DECIMAL). */
case class ListContainsDuck(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  override lazy val replacement: Expression = left.dataType match {
    case ArrayType(et, _) =>
      val (arr, needle) = ListNeedleCoercion(left, right, et)
      If(IsNull(right), Literal.create(null, BooleanType),
        Coalesce(Seq(ArrayContains(arr, needle), Literal(false))))
    case _ => ArrayContains(left, right)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ListContainsDuck =
    copy(left = l, right = r)
}

/** DuckDB compares list elements and the needle in their COMMON wider
  * type. A needle-to-element TRY cast instead NULLs any needle outside
  * the element type's range (fuzzer find: list_position(DECIMAL(4,0)[],
  * -1000) must be 0, not NULL) — so widen BOTH sides when the wider
  * type differs from the element type. */
private[functions] object ListNeedleCoercion {
  import org.apache.spark.sql.catalyst.expressions._
  def apply(arr: Expression, needle: Expression, et: DataType): (Expression, Expression) = {
    val ArrayType(_, cn) = arr.dataType: @unchecked
    if (needle.dataType == et) (arr, needle)
    else org.apache.spark.sql.catalyst.analysis.TypeCoercion
      .findWiderTypeForTwo(et, needle.dataType) match {
      case Some(w) if w == et => (arr, Cast(needle, et))
      case Some(w) => (Cast(arr, ArrayType(w, cn)), Cast(needle, w))
      case None => (arr, Cast(needle, et, None, EvalMode.TRY))
    }
  }
}

/** DuckDB 1-arg round(DECIMAL(p,s)) → DECIMAL(p,0); Spark's native
  * result is DECIMAL(p-s+1,0) — same values, diverged typeof()/wire
  * type (fuzzer find, same family as floor/ceil/trunc). Non-decimal
  * inputs keep Spark's native round. */
case class RoundDuck(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  override def prettyName: String = "round"
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric argument, got ${dt.simpleString}")
    }
  override lazy val replacement: Expression = child.dataType match {
    case dt: DecimalType =>
      val p = dt.precision
      Cast(Round(child, Literal(0)), DecimalType(p, 0))
    case _ => Round(child, Literal(0))
  }
  override protected def withNewChildInternal(c: Expression): RoundDuck =
    copy(child = c)
}

/** DuckDB list_position: needle coerced to the element type; absent →
  * 0 (Spark matches) — only the coercion differs (fuzzer find). */
case class ListPositionDuck(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  override lazy val replacement: Expression = left.dataType match {
    case ArrayType(et, _) =>
      val (arr, needle) = ListNeedleCoercion(left, right, et)
      ArrayPosition(arr, needle)
    case _ => ArrayPosition(left, right)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ListPositionDuck =
    copy(left = l, right = r)
}

/** DuckDB element_at / list subscript semantics, dispatched on the
  * resolved input: arrays — 1-based, negative from the end, 0 and
  * out-of-bounds give NULL (never an error: a scalar cannot fail one
  * row at 100 TB); maps — the matching values as a LIST ([] when the
  * key is absent), DuckDB's map_extract contract. */
case class ElementAtDispatch(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  override lazy val replacement: Expression = left.dataType match {
    case a: ArrayType =>
      val idx = Cast(right, IntegerType)
      If(EqualTo(idx, Literal(0)),
        Literal.create(null, a.elementType),
        ElementAt(left, idx, None, failOnError = false))
    case m: MapType =>
      val key = Cast(right, m.keyType)
      val hit = ArrayContains(MapKeys(left), key)
      If(And(IsNotNull(hit), hit),
        CreateArray(Seq(GetMapValue(left, key))),
        Literal.create(Array.empty[Any],
          ArrayType(m.valueType, containsNull = true)))
    case st: StructType =>
      // DuckDB struct['field'] = field access (the 1-based-subscript
      // rewrite routes struct subscripts here too). The field resolves
      // HERE — a replacement must come out fully resolved.
      right match {
        case Literal(s: UTF8String, StringType)
            if st.fieldNames.exists(_.equalsIgnoreCase(s.toString)) =>
          val idx = st.fieldNames.indexWhere(_.equalsIgnoreCase(s.toString))
          GetStructField(left, idx, Some(st.fieldNames(idx)))
        case _ => ElementAt(left, right) // surfaces a clear analysis error
      }
    case StringType =>
      // DuckDB 'abc'[2] = 1-based single-char ('' at index 0; negative
      // counts from the end — Substring already does)
      val idx = Cast(right, IntegerType)
      If(EqualTo(idx, Literal(0)), Literal(UTF8String.fromString(""), StringType),
        Substring(left, idx, Literal(1)))
    case _ => ElementAt(left, right)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ElementAtDispatch =
    copy(left = l, right = r)
}

/** DuckDB regexp_replace semantics (duckdb/docs regex page): replaces
  * the FIRST match unless the options string contains 'g'; 'i'/'m'/'s'
  * map to the matching Java regex flags, 'c' restores case
  * sensitivity. Spark's native regexp_replace is global-only — a
  * silent 3-arg divergence until the probe battery caught it.
  * Backreferences use DuckDB's \1 spelling, translated to Java's $1.
  * CodegenFallback is fine here: this binds only on the SQL wire path
  * (the Scala query corpus uses the Spark functions API), and the
  * compiled pattern is cached per (pattern, flags). */
case class RegexpReplaceDuck(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  @transient private var cached: (String, Int, java.util.regex.Pattern) = _
  private def pattern(p: String, flags: Int): java.util.regex.Pattern = {
    if (cached == null || cached._1 != p || cached._2 != flags)
      cached = (p, flags, java.util.regex.Pattern.compile(p, flags))
    cached._3
  }
  private def javaRepl(r: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '\\' && i + 1 < r.length && r.charAt(i + 1).isDigit) {
        sb += '$'; sb += r.charAt(i + 1); i += 2
      } else if (c == '\\' && i + 1 < r.length && r.charAt(i + 1) == '\\') {
        // '\\' = one escaped literal backslash → Matcher spelling "\\"
        sb append "\\\\"; i += 2
      } else if (c == '\\' && i + 1 < r.length) {
        sb append "\\\\"; sb += r.charAt(i + 1); i += 2
      } else if (c == '\\') {
        sb append "\\\\"; i += 1 // trailing lone backslash → literal
      } else if (c == '$') { sb append "\\$"; i += 1 }
      else { sb += c; i += 1 }
    }
    sb.toString
  }
  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.take(3).contains(null)) return null
    val subject = vals(0).asInstanceOf[UTF8String].toString
    val pat = vals(1).asInstanceOf[UTF8String].toString
    val repl = javaRepl(vals(2).asInstanceOf[UTF8String].toString)
    val opts =
      if (vals.length > 3 && vals(3) != null) vals(3).asInstanceOf[UTF8String].toString else ""
    var flags = 0
    // options apply left-to-right, last wins ('ic' = case-sensitive,
    // matching DuckDB's option handling where 'c' cancels 'i')
    opts.foreach {
      case 'i' => flags |= java.util.regex.Pattern.CASE_INSENSITIVE
      case 'c' => flags &= ~java.util.regex.Pattern.CASE_INSENSITIVE
      case 'm' => flags |= java.util.regex.Pattern.MULTILINE
      case 's' => flags |= java.util.regex.Pattern.DOTALL
      case _ => ()
    }
    val m = pattern(pat, flags).matcher(subject)
    UTF8String.fromString(
      if (opts.contains('g')) m.replaceAll(repl) else m.replaceFirst(repl))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegexpReplaceDuck =
    copy(children = newChildren)
}
