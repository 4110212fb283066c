package graft.results

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

/**
 * Scalar value rendering at the result-delivery edge — the exact rules the
 * reference applies when pivoting Arrow values to JSON/CSV
 * (reference: src/iceberg_explorer/api/routes/query.py:74-80 JSON,
 * api/routes/export.py:47-61 CSV).
 *
 * Driver-side only: these run over already-paginated result pages, never
 * inside a Spark job — at 100 TB the cluster-side plan stays untouched.
 */
object ValueFormat {

  /** ISO-8601 without zone suffix, micros when present — Python
    * `datetime.isoformat()` (reference: export.py:57-58). Session TZ is
    * UTC, so timestamps render in UTC like DuckDB returns them. */
  private val isoNoFrac = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
  private val isoMicro =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")

  def isoTimestamp(instant: Instant): String = {
    val ldt = LocalDateTime.ofInstant(instant, ZoneOffset.UTC)
    if (ldt.getNano == 0) isoNoFrac.format(ldt) else isoMicro.format(ldt)
  }

  private def toLocalInstant(v: Any): Option[Instant] = v match {
    case ts: java.sql.Timestamp => Some(ts.toInstant)
    case i: Instant => Some(i)
    case ldt: LocalDateTime => Some(ldt.toInstant(ZoneOffset.UTC))
    case _ => None
  }

  def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  /** CSV cell formatting (reference: export.py:47-61): null → "",
    * bool → true/false, datetime → ISO-8601, bytes → hex, else str(). */
  def csvValue(v: Any): String = v match {
    case null => ""
    case b: Boolean => if (b) "true" else "false"
    case bytes: Array[Byte] => hex(bytes)
    case d: java.sql.Date => d.toString
    case ld: LocalDate => ld.toString
    case bd: java.math.BigDecimal => bd.toPlainString
    case bd: BigDecimal => bd.bigDecimal.toPlainString
    case other => toLocalInstant(other) match {
      case Some(i) => isoTimestamp(i)
      case None => other.toString
    }
  }

  /** JSON scalar for the NDJSON stream (reference: query.py:74-80 converts
    * Arrow→Python, then the Pydantic layer serializes: numbers/bools bare,
    * datetimes ISO, binary hex — matching the CSV's human-readable rule). */
  def jsonValue(v: Any): String = v match {
    case null => "null"
    case b: Boolean => if (b) "true" else "false"
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => jsonDouble(n.toDouble)
    case n: Double => jsonDouble(n)
    case bd: java.math.BigDecimal => bd.toPlainString
    case bd: BigDecimal => bd.bigDecimal.toPlainString
    case bytes: Array[Byte] => jsonString(hex(bytes))
    case seq: scala.collection.Seq[_] =>
      seq.map(jsonValue).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, mv) => jsonString(String.valueOf(k)) + ":" + jsonValue(mv) }
        .mkString("{", ",", "}")
    case row: org.apache.spark.sql.Row =>
      row.schema.fieldNames.zip(row.toSeq)
        .map { case (k, fv) => jsonString(k) + ":" + jsonValue(fv) }
        .mkString("{", ",", "}")
    case other => toLocalInstant(other) match {
      case Some(i) => jsonString(isoTimestamp(i))
      case None => jsonString(other.toString)
    }
  }

  private def jsonDouble(d: Double): String =
    if (d.isNaN || d.isInfinite) jsonString(d.toString) else d.toString

  /** JSON string escape: quote, backslash, and all control chars. */
  def jsonString(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  /** CSV field quoting — Python `csv` default dialect (reference uses
    * `csv.writer`, export.py:124-132): quote only when the field contains
    * delimiter/quote/newline; embedded quotes doubled; rows end CRLF. */
  def csvField(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  def csvRow(values: Seq[String]): String =
    values.map(csvField).mkString("", ",", "\r\n")

  /** Export filename sanitization (reference: export.py:214-217). */
  def sanitizeFilename(name: String): String =
    "\"/<>:\\|?*\u0000\n\r".foldLeft(name)((acc, c) =>
      acc.replace(c.toString, "_")).take(200)
}
