package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Encoding repair — the reference's `repair-encoding` command
  * (cmd/repair_encoding.go) + textutil.EnsureUTF8/SanitizeUTF8
  * (internal/textutil/encoding.go:17-88), re-expressed over BINARY
  * columns: a Spark `String` is already UTF-16, so invalid UTF-8 can
  * only exist in the raw bytes as ingested — repair runs at that
  * boundary.
  *
  * Decode semantics mirrored from EnsureUTF8's actual behavior, not its
  * apparent one: after the strict-UTF-8 check, Go's chain tries
  * charmap.Windows1252 FIRST — and x/text charmap decoders never error
  * (undefined bytes decode to U+FFFD) — so for ANY non-UTF-8 input the
  * chain terminates at Windows-1252; the Asian multi-byte decoders are
  * unreachable without the chardet statistical pre-pass (which this
  * sandbox cannot ship — a deployment can slot a detector in front, same
  * as the reference slots chardet). We implement exactly that terminal
  * behavior with a Go-compatible CP1252 table (the five undefined bytes
  * 0x81/0x8D/0x8F/0x90/0x9D → U+FFFD, where the JVM's own CP1252 charset
  * would map them to C1 controls).
  *
  * Off the hot path by design (SURVEY §2.13: zlib/MIME/encoding UDFs run
  * only on repair/ingest passes, never inside per-query scans).
  */
object TextEncoding {

  /** Windows-1252 high-half table, matching golang.org/x/text
    * charmap.Windows1252: 0x80-0x9F per the CP1252 mapping with the five
    * undefined bytes as U+FFFD; 0xA0-0xFF identical to Latin-1.
    */
  private val cp1252High: Array[Char] = {
    val t = new Array[Char](0x80)
    // 0x80-0x9F explicit row (CP1252)
    val row = Array[Int](
      0x20AC, 0xFFFD, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
      0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0xFFFD, 0x017D, 0xFFFD,
      0xFFFD, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
      0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0xFFFD, 0x017E, 0x0178)
    var j = 0
    while (j < 32) { t(j) = row(j).toChar; j += 1 }
    while (j < 0x80) { t(j) = (0x80 + j).toChar; j += 1 } // 0xA0-0xFF = Latin-1
    t
  }

  private def decodeCp1252(data: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(data.length)
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xFF
      sb.append(if (b < 0x80) b.toChar else cp1252High(b - 0x80))
      i += 1
    }
    sb.toString
  }

  private def validUtf8(data: Array[Byte]): Boolean = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(data)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  /** EnsureUTF8 (encoding.go:21-70): (repaired text, encoding used). */
  def ensureUtf8(data: Array[Byte]): (String, String) = {
    if (data == null) return (null, null)
    if (validUtf8(data))
      (new String(data, java.nio.charset.StandardCharsets.UTF_8), "utf-8")
    else (decodeCp1252(data), "windows-1252")
  }

  /** SanitizeUTF8 (encoding.go:74-88): EACH invalid byte → U+FFFD (Go's
    * per-byte granularity, not the JVM decoder's per-sequence one).
    */
  def sanitizeUtf8(data: Array[Byte]): String = {
    if (data == null) return null
    // walk the raw bytes with a strict UTF-8 state machine, emitting
    // U+FFFD per offending byte — identical to Go's DecodeRuneInString
    // loop (RuneError with size 1)
    val out = new java.lang.StringBuilder(data.length)
    var i = 0
    val n = data.length
    while (i < n) {
      val b0 = data(i) & 0xFF
      val len =
        if (b0 < 0x80) 1
        else if (b0 >= 0xC2 && b0 <= 0xDF) 2
        else if (b0 >= 0xE0 && b0 <= 0xEF) 3
        else if (b0 >= 0xF0 && b0 <= 0xF4) 4
        else 0
      def contOk(k: Int): Boolean =
        i + k < n && (data(i + k) & 0xC0) == 0x80
      val ok = len match {
        case 1 => true
        case 2 => contOk(1)
        case 3 => contOk(1) && contOk(2) &&
          // reject overlong/surrogate forms like Go does
          !(b0 == 0xE0 && (data(i + 1) & 0xFF) < 0xA0) &&
          !(b0 == 0xED && (data(i + 1) & 0xFF) > 0x9F)
        case 4 => contOk(1) && contOk(2) && contOk(3) &&
          !(b0 == 0xF0 && (data(i + 1) & 0xFF) < 0x90) &&
          !(b0 == 0xF4 && (data(i + 1) & 0xFF) > 0x8F)
        case _ => false
      }
      if (!ok) { out.append('�'); i += 1 }
      else {
        out.append(new String(data, i, len,
          java.nio.charset.StandardCharsets.UTF_8))
        i += len
      }
    }
    out.toString
  }

  val ensureUtf8Udf: UserDefinedFunction =
    udf((d: Array[Byte]) => ensureUtf8(d) match {
      case (null, null) => null
      case (t, e) => (t, e)
    })

  val sanitizeUtf8Udf: UserDefinedFunction = udf(sanitizeUtf8 _)

  /** The repair pass over a frame of raw byte fields — the distributed
    * twin of repairMessageFields (repair_encoding.go:190-300): for each
    * (name → binary column), emit `<name>` (repaired text),
    * `<name>_changed` (true when the bytes were not valid UTF-8), plus
    * `reembed_needed` = any EMBEDDER-FEEDING field changed. The
    * reference re-enqueues embeddings when subject/body/html change but
    * NOT for snippet-only repairs (repair_encoding.go:279-287) — pass
    * the feeding set via `embedderFields`.
    */
  def repairEncoding(df: DataFrame, fields: Seq[(String, Column)],
      embedderFields: Set[String]): DataFrame = {
    val withRepairs = fields.foldLeft(df) { case (acc, (name, bytes)) =>
      acc.withColumn(s"__r_$name", ensureUtf8Udf(bytes))
        .withColumn(name, col(s"__r_$name._1"))
        .withColumn(s"${name}_changed",
          coalesce(col(s"__r_$name._2") =!= "utf-8", lit(false)))
        .drop(s"__r_$name")
    }
    val reembed = fields.collect {
      case (name, _) if embedderFields(name) => col(s"${name}_changed")
    }.reduceOption(_ || _).getOrElse(lit(false))
    withRepairs.withColumn("reembed_needed", reembed)
  }
}
