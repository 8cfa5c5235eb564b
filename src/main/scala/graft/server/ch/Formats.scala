package graft.server.ch

import java.io.{BufferedReader, OutputStream, StringReader}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** ClickHouse-protocol format codecs (reference ch_format.go:25-243):
  * TabSeparated / CSV (± Names / NamesAndTypes headers) and
  * JSONEachRow, as streaming writers over a row iterator and readers
  * over a request body. Value conventions follow the reference's
  * duckValueToString (duckdb_types.go:85-125): NULL → \N, bool → 1/0,
  * timestamps "yyyy-MM-dd HH:mm:ss", lists {a,b}; decimals exact.
  */
object Formats {

  val names: Set[String] = Set(
    "TabSeparated", "TabSeparatedWithNames", "TabSeparatedWithNamesAndTypes",
    "CSV", "CSVWithNames", "JSONEachRow")

  def chTypeName(dt: DataType): String = dt match {
    case IntegerType => "Int32"
    case LongType => "Int64"
    case ShortType => "Int16"
    case StringType => "String"
    case BooleanType => "UInt8"
    case DoubleType => "Float64"
    case FloatType => "Float32"
    case DateType => "Date"
    case TimestampNTZType | TimestampType => "DateTime"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case _ => "String"
  }

  private val tsFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  def renderValue(v: Any): String = v match {
    case null => "\\N"
    case b: Boolean => if (b) "1" else "0"
    case d: java.math.BigDecimal => d.toPlainString
    case t: java.sql.Timestamp => t.toLocalDateTime.format(tsFmt)
    case t: java.time.LocalDateTime => t.format(tsFmt)
    case t: java.time.Instant =>
      java.time.LocalDateTime.ofInstant(t, java.time.ZoneOffset.UTC).format(tsFmt)
    case s: scala.collection.Seq[_] => s.map(renderValue).mkString("{", ",", "}")
    case other => other.toString
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")

  private def csvField(s: String): String =
    if (s.contains(",") || s.contains("\"") || s.contains("\n")) "\"" + s.replace("\"", "\"\"") + "\"" else s

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case n @ (_: Int | _: Long | _: Short | _: Double | _: Float) => n.toString
    case b: Boolean => b.toString
    case d: java.math.BigDecimal => d.toPlainString
    case s: scala.collection.Seq[_] => s.map(jsonValue).mkString("[", ",", "]")
    case other => jsonStr(renderValue(other))
  }

  /** Streaming writer: header (per format) then one line per row. */
  def write(format: String, schema: StructType, rows: Iterator[Row], out: OutputStream): Long = {
    def line(s: String): Unit = out.write((s + "\n").getBytes(UTF_8))
    val cols = schema.fieldNames
    format match {
      case "TabSeparatedWithNames" => line(cols.map(esc).mkString("\t"))
      case "TabSeparatedWithNamesAndTypes" =>
        line(cols.map(esc).mkString("\t"))
        line(schema.fields.map(f => chTypeName(f.dataType)).mkString("\t"))
      case "CSVWithNames" => line(cols.map(csvField).mkString(","))
      case _ =>
    }
    var n = 0L
    while (rows.hasNext) {
      val r = rows.next()
      format match {
        case "JSONEachRow" =>
          line(cols.indices.map(i => s"${jsonStr(cols(i))}:${jsonValue(r.get(i))}")
            .mkString("{", ",", "}"))
        case "CSV" | "CSVWithNames" =>
          line(cols.indices.map(i =>
            if (r.isNullAt(i)) "\\N" else csvField(renderValue(r.get(i)))).mkString(","))
        case _ => // TabSeparated family
          line(cols.indices.map(i =>
            if (r.isNullAt(i)) "\\N" else esc(renderValue(r.get(i)))).mkString("\t"))
      }
      n += 1
    }
    n
  }

  /** Parse an ingest body into rows of string fields (null = SQL NULL).
    * Header rows are skipped per format. JSONEachRow projects by column
    * name (reference ch_format.go:25-58). */
  def read(format: String, body: String, columns: Seq[String]): Seq[Seq[String]] = {
    val lines = body.split("\n").iterator.filter(_.nonEmpty)
    format match {
      case "JSONEachRow" =>
        lines.map { l =>
          val kv = parseJsonObject(l)
          columns.map(c => kv.getOrElse(c, null))
        }.toSeq
      case f if f.startsWith("CSV") =>
        val it = lines.drop(if (f == "CSVWithNames") 1 else 0)
        it.map(l => graft.server.pg.CsvValues.parseCsv(l).headOption
          .map(_.toSeq).getOrElse(Seq.empty)).toSeq
      case f => // TabSeparated family
        val skip = f match {
          case "TabSeparatedWithNames" => 1
          case "TabSeparatedWithNamesAndTypes" => 2
          case _ => 0
        }
        lines.drop(skip).map(_.split("\t", -1).toSeq.map(v =>
          if (v == "\\N") null else unescapeTsv(v))).toSeq
    }
  }

  /** Single left-to-right unescape — chained .replace() passes decode
    * wire `\\t` (backslash-t) to TAB because the `\\\\` pass runs last
    * (round-2 bug). Inverse of [[esc]]. */
  def unescapeTsv(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb += '\t'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case '\\' => sb += '\\'; i += 2
          case _ => sb += c; i += 1
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Tiny flat JSON object parser (string/number/bool/null values) —
    * enough for JSONEachRow ingest lines; values come back as their
    * text form for the column converters. */
  def parseJsonObject(line: String): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    var i = line.indexOf('{') + 1
    def skipWs(): Unit = while (i < line.length && line.charAt(i).isWhitespace) i += 1
    def parseString(): String = {
      val sb = new StringBuilder
      i += 1 // opening quote
      while (line.charAt(i) != '"') {
        if (line.charAt(i) == '\\') {
          i += 1
          line.charAt(i) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'u' => sb += Integer.parseInt(line.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += line.charAt(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    while (i < line.length) {
      skipWs()
      if (i >= line.length || line.charAt(i) == '}') return m.toMap
      val key = parseString()
      skipWs(); i += 1 // ':'
      skipWs()
      val value: String =
        if (line.charAt(i) == '"') parseString()
        else {
          val start = i
          while (i < line.length && !",}".contains(line.charAt(i))) i += 1
          val raw = line.substring(start, i).trim
          if (raw == "null") null else raw
        }
      m(key) = value
      skipWs()
      if (i < line.length && line.charAt(i) == ',') i += 1
    }
    m.toMap
  }
}
