package graft.model

import org.apache.spark.sql.DataFrame

/** Columnar result shape + the three CLI/REST output formats (reference:
  * internal/query/views.go:12-16 QueryResult{Columns, Rows, RowCount};
  * cmd/msgvault/cmd/query.go:161-263 json/csv/aligned-table renderers).
  *
  * `collect()` at the API edge is the reference's own contract — results
  * are already paginated/limited by the query layer before they reach a
  * formatter, so the driver never materializes more than a page.
  */
final case class QueryResult(columns: Seq[String], rows: Seq[Seq[Any]]) {
  def rowCount: Int = rows.length

  private def cell(v: Any): String = v match {
    case null => ""
    case s: String => s
    // scala.collection.Seq: nested arrays arrive as mutable.ArraySeq,
    // which the bare (immutable) Seq pattern misses on 2.13
    case a: scala.collection.Seq[_] => a.map(cell).mkString("[", ",", "]")
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case other => other.toString
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case n: Long => n.toString
    case n: Int => n.toString
    // TINYINT/SMALLINT columns collect as Byte/Short — without these
    // cases they fall to the catch-all STRING branch and a numeric
    // column's JSON typing would depend on its integer width
    case n: Short => n.toString
    case n: Byte => n.toString
    case n: Double => if (n.isNaN || n.isInfinite) "null" else n.toString
    case n: Float => jsonValue(n.toDouble)
    case b: Boolean => b.toString
    case n: java.math.BigDecimal => n.toPlainString
    // scala.collection.Seq, NOT bare Seq (= immutable.Seq on 2.13):
    // nested array elements come back as mutable.ArraySeq, which the
    // immutable pattern misses — they would render as "ArraySeq(...)"
    case a: scala.collection.Seq[_] =>
      a.map(jsonValue).mkString("[", ",", "]")
    case other => "\"" + jsonEscape(cell(other)) + "\""
  }

  /** {"columns":[...],"rows":[[...]...],"row_count":N} (query.go json path). */
  def toJson: String = {
    val cols = columns.map(c => "\"" + jsonEscape(c) + "\"").mkString("[", ",", "]")
    val rws = rows.map(_.map(jsonValue).mkString("[", ",", "]")).mkString("[", ",", "]")
    s"""{"columns":$cols,"rows":$rws,"row_count":$rowCount}"""
  }

  /** RFC4180-ish CSV with header (query.go csv path). Quote condition
    * mirrors Go's encoding/csv fieldNeedsQuotes in full (r13, three
    * review rounds): delimiter, quote, CR or LF anywhere; a field whose
    * FIRST rune satisfies Go's unicode.IsSpace (leading-space subjects
    * are common and the reference quotes them — NOTE Java's
    * Character.isWhitespace is NOT that set: it excludes the
    * non-breaking/figure spaces Go includes and includes the 0x1C-0x1F
    * separators Go excludes, hence the three-legged predicate); and the
    * literal field `\.` (Go's Postgres-dump guard).
    */
  def toCsv: String = {
    def goIsSpace(cp: Int): Boolean =
      (Character.isWhitespace(cp) && !(cp >= 0x1C && cp <= 0x1F)) ||
        Character.isSpaceChar(cp) || cp == 0x85
    def esc(s: String): String =
      if (s == "\\." || s.contains(",") || s.contains("\"") ||
        s.contains("\n") || s.contains("\r") ||
        (s.nonEmpty && goIsSpace(s.codePointAt(0))))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    (columns.map(esc) +: rows.map(_.map(v => esc(cell(v)))))
      .map(_.mkString(",")).mkString("\n")
  }

  /** Column-aligned text table (query.go table path, writeTable
    * :206-262 exactly): every column left-padded to width — INCLUDING
    * the last, the reference's %-*s pads trailing spaces too — and the
    * "(N rows)" trailer line (r13 audit restored both).
    */
  def toTable: String = {
    val all = columns.map(c => c: String) +: rows.map(_.map(cell))
    val widths = columns.indices.map(i => all.map(_(i).length).max)
    def fmt(row: Seq[String]): String =
      row.zip(widths).map { case (s, w) => s.padTo(w, ' ') }.mkString("  ")
    val sep = widths.map("-" * _).mkString("  ")
    ((fmt(columns) +: sep +: rows.map(r => fmt(r.map(cell)))) :+
      s"($rowCount rows)").mkString("\n")
  }
}

object QueryResult {
  /** Materialize a (already limited/paginated) DataFrame page. */
  def fromDataFrame(df: DataFrame): QueryResult =
    QueryResult(df.columns.toSeq,
      df.collect().toSeq.map(_.toSeq.map {
        case s: scala.collection.Seq[_] => s.toSeq
        case v => v
      }))
}
