package graft.server.pg

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Spark DataType ⇄ PostgreSQL wire bridge (SURVEY §1.3 with quirks
  * Q1–Q3 fixed: int4→23 not 21, timestamps declared with their real
  * OIDs, decimals rendered exactly — the reference's float64 round-trip
  * at pg_types.go:96-100 loses precision ≥2^53).
  *
  * Simple-query values travel in text format (format code 0), matching
  * the reference (pg_conn.go:348,379); renderings follow PostgreSQL
  * text conventions: bool t/f, timestamp "2006-01-02 15:04:05.999999"
  * with trailing-zero-trimmed micros, arrays {a,b} with quoting, NULL
  * as length −1 (handled by the wire layer via Option). The extended
  * protocol additionally honors Bind's RESULT format codes (r15b,
  * beyond the reference): [[renderBinary]] encodes the PG binary
  * layouts pgx-class clients request by default.
  */
object PgTypes {
  // OIDs from the PostgreSQL catalog (public protocol constants)
  val OidBool = 16; val OidInt8 = 20; val OidInt2 = 21; val OidInt4 = 23
  val OidText = 25; val OidFloat4 = 700; val OidFloat8 = 701
  val OidNumeric = 1700; val OidDate = 1082; val OidTimestamp = 1114
  val OidTimestamptz = 1184; val OidJson = 114; val OidBytea = 17
  val OidTextArray = 1009; val OidTime = 1083; val OidInterval = 1186

  def oidOf(dt: DataType): Int = dt match {
    case BooleanType => OidBool
    case ByteType | ShortType => OidInt2
    case IntegerType => OidInt4
    case LongType => OidInt8
    case FloatType => OidFloat4
    case DoubleType => OidFloat8
    case _: DecimalType => OidNumeric
    case StringType => OidText
    case DateType => OidDate
    case TimestampNTZType => OidTimestamp
    case TimestampType => OidTimestamptz
    case BinaryType => OidBytea
    case _: TimeType => OidTime
    case _: DayTimeIntervalType | _: YearMonthIntervalType | CalendarIntervalType =>
      OidInterval
    case _: ArrayType => OidTextArray
    case _: MapType | _: StructType => OidJson
    case _ => OidText
  }

  /** PG name for an OID (+typmod) — backs the format_type() UDF psql's
    * \d issues. Numeric typmod packs (precision<<16 | scale) + 4. */
  def nameOf(oid: Int, typmod: Int): String = oid match {
    case OidBool => "boolean"
    case OidInt2 => "smallint"
    case OidInt4 => "integer"
    case OidInt8 => "bigint"
    case OidFloat4 => "real"
    case OidFloat8 => "double precision"
    case OidNumeric =>
      if (typmod >= 4) s"numeric(${(typmod - 4) >> 16},${(typmod - 4) & 0xffff})" else "numeric"
    case OidText => "text"
    case OidDate => "date"
    case OidTimestamp => "timestamp without time zone"
    case OidTimestamptz => "timestamp with time zone"
    case OidJson => "json"
    case OidBytea => "bytea"
    case OidTime => "time without time zone"
    case OidInterval => "interval"
    case OidTextArray => "text[]"
    case _ => "text"
  }

  def typmodOf(dt: DataType): Int = dt match {
    case d: DecimalType => ((d.precision << 16) | d.scale) + 4
    case _ => -1
  }

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  private def renderMicros(nanos: Int): String = {
    val micros = nanos / 1000
    if (micros == 0) ""
    else {
      var s = f".$micros%06d"
      while (s.endsWith("0")) s = s.dropRight(1)
      s
    }
  }

  /** Render one value as PG text. None ⇒ SQL NULL. */
  def render(v: Any): Option[String] = v match {
    case null => None
    case b: Boolean => Some(if (b) "t" else "f")
    case b: java.math.BigDecimal => Some(b.toPlainString)
    case b: scala.math.BigDecimal => Some(b.bigDecimal.toPlainString)
    case d: java.sql.Date => Some(d.toString)
    case d: LocalDate => Some(d.toString)
    case t: java.sql.Timestamp =>
      val ldt = t.toLocalDateTime
      Some(ldt.format(tsFmt) + renderMicros(ldt.getNano))
    case t: LocalDateTime => Some(t.format(tsFmt) + renderMicros(t.getNano))
    case t: Instant =>
      val ldt = LocalDateTime.ofInstant(t, ZoneOffset.UTC)
      Some(ldt.format(tsFmt) + renderMicros(ldt.getNano) + "+00")
    case bytes: Array[Byte] =>
      Some("\\x" + bytes.map(b => f"${b & 0xff}%02x").mkString)
    case t: java.time.LocalTime => // TIME: HH:MM:SS[.ffffff], micros trimmed
      Some(t.format(DateTimeFormatter.ofPattern("HH:mm:ss")) + renderMicros(t.getNano))
    case seq: scala.collection.Seq[_] =>
      Some(seq.map(e => renderArrayElem(e)).mkString("{", ",", "}"))
    // intervals in DuckDB's text style ("1 day 02:00:00", "1 year
    // 2 months", "00:01:30") — Spark hands back three different JVM
    // types depending on the interval sort
    case d: java.time.Duration =>
      // extract whole days (Spark normalizes day-time intervals to one
      // micros count; DuckDB prints the day component separately)
      val us = d.getSeconds * 1000000L + d.getNano / 1000L
      Some(duckInterval(0, (us / 86400000000L).toInt, us % 86400000000L))
    case p: java.time.Period =>
      Some(duckInterval(p.getYears * 12 + p.getMonths, p.getDays, 0L))
    case ci: org.apache.spark.unsafe.types.CalendarInterval =>
      Some(duckInterval(ci.months, ci.days, ci.microseconds))
    // structs and maps in DuckDB's text style ({'a': 1, 'b': 'x'},
    // {1=a, 2=b}) — the reference's clients see DuckDB renderings
    case m: scala.collection.Map[_, _] =>
      Some(m.map { case (k, mv) => s"${plain(k)}=${plain(mv)}" }.mkString("{", ", ", "}"))
    case r: Row =>
      Some(r.schema.fieldNames.zip(r.toSeq)
        .map { case (n, fv) => s"'$n': ${duckVal(fv)}" }.mkString("{", ", ", "}"))
    case other => Some(other.toString)
  }

  /** DuckDB interval text: year/month/day parts when nonzero (singular
    * at ±1), then HH:MM:SS[.ffffff] when the time part is nonzero or
    * nothing else printed. */
  private def duckInterval(months: Int, days: Int, micros: Long): String = {
    val sb = new StringBuilder
    def part(n: Long, name: String): Unit = if (n != 0) {
      if (sb.nonEmpty) sb += ' '
      sb.append(n).append(' ').append(name)
      if (n != 1 && n != -1) sb += 's'
    }
    part(months / 12, "year"); part(months % 12, "month"); part(days, "day")
    if (micros != 0 || sb.isEmpty) {
      if (sb.nonEmpty) sb += ' '
      if (micros < 0) sb += '-'
      var us = math.abs(micros)
      val h = us / 3600000000L; us %= 3600000000L
      val m = us / 60000000L; us %= 60000000L
      val s = us / 1000000L; val frac = us % 1000000L
      sb.append(f"$h%02d:$m%02d:$s%02d")
      if (frac != 0) {
        var fs = f".$frac%06d"
        while (fs.endsWith("0")) fs = fs.dropRight(1)
        sb.append(fs)
      }
    }
    sb.toString
  }

  /** Struct field value, DuckDB style: strings single-quoted (''-escaped),
    * numbers/booleans bare, NULL upper-case, nested collections recurse. */
  private def duckVal(v: Any): String = v match {
    case null => "NULL"
    case n @ (_: Int | _: Long | _: Double | _: Float | _: Short | _: Byte) => n.toString
    case b: Boolean => b.toString
    case d: java.math.BigDecimal => d.toPlainString
    case s: scala.collection.Seq[_] => s.map(duckVal).mkString("[", ", ", "]")
    case r: Row => render(r).get
    case m: scala.collection.Map[_, _] => render(m).get
    case other => "'" + other.toString.replace("'", "''") + "'"
  }

  /** Map key/value, DuckDB style: bare text (no quoting). */
  private def plain(v: Any): String = v match {
    case null => "NULL"
    case r: Row => render(r).get
    case s: scala.collection.Seq[_] => s.map(duckVal).mkString("[", ", ", "]")
    case other => other.toString
  }

  private def renderArrayElem(e: Any): String = render(e) match {
    case None => "NULL"
    case Some(s) =>
      if (s.isEmpty || s.exists(c => c == ',' || c == '{' || c == '}' || c == '"' || c == '\\' || c.isWhitespace))
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      else s
  }

  // -- binary result format (r15b, extended protocol only) ------------------
  // pgx's default query mode requests binary results for every OID it
  // has a codec for; a text body under a binary format code is garbage
  // to the client. Encoders below cover every OID [[oidOf]] declares
  // whose PG binary layout differs from its text bytes; json (114) and
  // the struct/map renderings are text-identical by PG definition.

  private val PgEpochDay = 10957L // 2000-01-01 in unix days
  private val PgEpochMicros = 946684800000000L // 2000-01-01T00:00Z in unix micros

  private def be16(x: Int): Array[Byte] =
    Array[Byte](((x >> 8) & 0xff).toByte, (x & 0xff).toByte)
  private def be32(x: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(x).array
  private def be64(x: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(x).array

  /** PG `numeric` wire format: base-10000 digit groups with a weight
    * exponent, sign flag 0x4000 for negative, and the display scale. */
  private def numericBinary(b0: java.math.BigDecimal): Array[Byte] = {
    val dscale = math.max(0, b0.scale)
    val b = b0.setScale(dscale)
    if (b.signum == 0)
      return be16(0) ++ be16(0) ++ be16(0) ++ be16(dscale)
    val neg = b.signum < 0
    val plain = b.abs.toPlainString
    val (ip0, fp0) = plain.indexOf('.') match {
      case -1 => (plain, "")
      case i => (plain.substring(0, i), plain.substring(i + 1))
    }
    val ip = "0" * ((4 - ip0.length % 4) % 4) + ip0
    val fp = fp0 + "0" * ((4 - fp0.length % 4) % 4)
    var digits = (ip + fp).grouped(4).map(_.toInt).toVector
    var weight = ip.length / 4 - 1
    while (digits.nonEmpty && digits.head == 0) { digits = digits.tail; weight -= 1 }
    while (digits.nonEmpty && digits.last == 0) digits = digits.dropRight(1)
    be16(digits.size) ++ be16(weight) ++ be16(if (neg) 0x4000 else 0) ++
      be16(dscale) ++ digits.toArray.flatMap(be16)
  }

  private def tsMicros(ldt: LocalDateTime): Long =
    ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L - PgEpochMicros

  /** Render one value in PG BINARY wire format (None ⇒ SQL NULL).
    * Unlisted types (struct/map/json text renderings) fall back to
    * their UTF-8 text bytes — identical to PG's binary layout for
    * json, and the declared last resort elsewhere. */
  def renderBinary(v: Any): Option[Array[Byte]] = v match {
    case null => None
    case b: Boolean => Some(Array[Byte](if (b) 1 else 0))
    case b: Byte => Some(be16(b.toInt))
    case s: Short => Some(be16(s.toInt))
    case i: Int => Some(be32(i))
    case l: Long => Some(be64(l))
    case f: Float => Some(be32(java.lang.Float.floatToIntBits(f)))
    case d: Double => Some(be64(java.lang.Double.doubleToLongBits(d)))
    case b: java.math.BigDecimal => Some(numericBinary(b))
    case b: scala.math.BigDecimal => Some(numericBinary(b.bigDecimal))
    case s: String => Some(s.getBytes("UTF-8"))
    case bytes: Array[Byte] => Some(bytes)
    case d: java.sql.Date => Some(be32((d.toLocalDate.toEpochDay - PgEpochDay).toInt))
    case d: LocalDate => Some(be32((d.toEpochDay - PgEpochDay).toInt))
    case t: java.sql.Timestamp => Some(be64(tsMicros(t.toLocalDateTime)))
    case t: LocalDateTime => Some(be64(tsMicros(t)))
    case t: Instant =>
      Some(be64(t.getEpochSecond * 1000000L + t.getNano / 1000L - PgEpochMicros))
    case t: java.time.LocalTime => Some(be64(t.toNanoOfDay / 1000L))
    case seq: scala.collection.Seq[_] =>
      // 1-D text[] (OID 1009 is what oidOf declares for every Spark
      // array): ndim, hasnull, elem oid, dim {len, lbound=1}, then
      // per-element len + the element's TEXT bytes (lengths delimit —
      // no array-literal quoting in binary)
      val out = new java.io.ByteArrayOutputStream()
      out.write(be32(1)); out.write(be32(if (seq.contains(null)) 1 else 0))
      out.write(be32(OidText)); out.write(be32(seq.size)); out.write(be32(1))
      seq.foreach { e =>
        render(e) match {
          case None => out.write(be32(-1))
          case Some(s) =>
            val bs = s.getBytes("UTF-8"); out.write(be32(bs.length)); out.write(bs)
        }
      }
      Some(out.toByteArray)
    case d: java.time.Duration => // interval: micros, days, months
      val us = d.getSeconds * 1000000L + d.getNano / 1000L
      Some(be64(us % 86400000000L) ++ be32((us / 86400000000L).toInt) ++ be32(0))
    case p: java.time.Period =>
      Some(be64(0L) ++ be32(p.getDays) ++ be32(p.getYears * 12 + p.getMonths))
    case ci: org.apache.spark.unsafe.types.CalendarInterval =>
      Some(be64(ci.microseconds) ++ be32(ci.days) ++ be32(ci.months))
    case other => render(other).map(_.getBytes("UTF-8"))
  }

}
