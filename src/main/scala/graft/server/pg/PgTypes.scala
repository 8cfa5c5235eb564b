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
  * Values always travel in text format (format code 0), matching the
  * reference (pg_conn.go:348,379); renderings follow PostgreSQL text
  * conventions: bool t/f, timestamp "2006-01-02 15:04:05.999999" with
  * trailing-zero-trimmed micros, arrays {a,b} with quoting, NULL as
  * length −1 (handled by the wire layer via Option).
  */
object PgTypes {
  // OIDs from the PostgreSQL catalog (public protocol constants)
  val OidBool = 16; val OidInt8 = 20; val OidInt2 = 21; val OidInt4 = 23
  val OidText = 25; val OidFloat4 = 700; val OidFloat8 = 701
  val OidNumeric = 1700; val OidDate = 1082; val OidTimestamp = 1114
  val OidTimestamptz = 1184; val OidJson = 114; val OidBytea = 17
  val OidTextArray = 1009

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
    case seq: scala.collection.Seq[_] =>
      Some(seq.map(e => renderArrayElem(e)).mkString("{", ",", "}"))
    case m: scala.collection.Map[_, _] =>
      Some(m.map { case (k, mv) => s"${jsonStr(k)}: ${jsonVal(mv)}" }.mkString("{", ", ", "}"))
    case r: Row =>
      Some(r.schema.fieldNames.zip(r.toSeq)
        .map { case (n, fv) => s"${jsonStr(n)}: ${jsonVal(fv)}" }.mkString("{", ", ", "}"))
    case other => Some(other.toString)
  }

  private def renderArrayElem(e: Any): String = render(e) match {
    case None => "NULL"
    case Some(s) =>
      if (s.isEmpty || s.exists(c => c == ',' || c == '{' || c == '}' || c == '"' || c == '\\' || c.isWhitespace))
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      else s
  }

  private def jsonStr(s: Any): String =
    "\"" + s.toString.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case n @ (_: Int | _: Long | _: Double | _: Float | _: Short | _: Byte) => n.toString
    case b: Boolean => b.toString
    case d: java.math.BigDecimal => d.toPlainString
    case s: scala.collection.Seq[_] => s.map(jsonVal).mkString("[", ", ", "]")
    case other => jsonStr(other)
  }
}
