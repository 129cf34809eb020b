package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** EnsureUTF8/SanitizeUTF8 parity (reference internal/textutil/
  * encoding.go) and the repair pass over binary fields.
  */
class TextEncodingSpec extends SparkTestBase {

  private def utf8(s: String) = s.getBytes("UTF-8")

  test("valid UTF-8 passes through untouched") {
    val (t, e) = TextEncoding.ensureUtf8(utf8("héllo wörld ✓"))
    assert(t == "héllo wörld ✓" && e == "utf-8")
  }

  test("Latin-1 bytes repair through the Windows-1252 terminal branch") {
    val bytes = "café résumé".getBytes("ISO-8859-1")
    val (t, e) = TextEncoding.ensureUtf8(bytes)
    assert(t == "café résumé") // cp1252 0xA0-0xFF == Latin-1
    assert(e == "windows-1252")
  }

  test("CP1252 C1 range decodes to the Windows punctuation, not controls") {
    // 0x93/0x94 = curly quotes, 0x85 = ellipsis, 0x80 = euro
    val bytes = Array[Byte](0x93.toByte, 'a', 0x94.toByte, 0x85.toByte,
      0x80.toByte)
    val (t, e) = TextEncoding.ensureUtf8(bytes)
    assert(t == "“a”…€" && e == "windows-1252")
  }

  test("the five undefined CP1252 bytes map to U+FFFD like x/text charmap") {
    val bytes = Array(0x81, 0x8D, 0x8F, 0x90, 0x9D).map(_.toByte)
    val (t, _) = TextEncoding.ensureUtf8(bytes)
    assert(t == "�" * 5,
      s"JVM-CP1252 C1 controls leaked: ${t.map(_.toInt).mkString(",")}")
  }

  test("sanitizeUtf8: one U+FFFD PER invalid byte (Go granularity)") {
    // two stray continuation bytes inside valid text
    val bytes = Array[Byte]('a', 0x80.toByte, 0x81.toByte, 'b')
    assert(TextEncoding.sanitizeUtf8(bytes) == "a��b")
    // truncated 3-byte sequence: E2 82 (missing third) → 2 markers
    val trunc = Array[Byte]('x', 0xE2.toByte, 0x82.toByte)
    assert(TextEncoding.sanitizeUtf8(trunc) == "x��")
    // overlong/surrogate rejections
    val surrogate = Array[Byte](0xED.toByte, 0xA0.toByte, 0x80.toByte)
    assert(TextEncoding.sanitizeUtf8(surrogate) == "���")
    // valid multi-byte passes through
    assert(TextEncoding.sanitizeUtf8(utf8("日本語")) == "日本語")
  }

  test("repairEncoding flags changed fields and reembed per embedder set") {
    import spark.implicits._
    val rows = Seq(
      (1L, utf8("clean subject"), utf8("clean snippet")),
      (2L, "bad sübject".getBytes("ISO-8859-1"), utf8("clean snippet")),
      (3L, utf8("clean subject"), "bad snïppet".getBytes("ISO-8859-1")))
      .toDF("id", "subj_raw", "snip_raw")
    val out = TextEncoding.repairEncoding(rows,
      Seq("subject" -> col("subj_raw"), "snippet" -> col("snip_raw")),
      embedderFields = Set("subject")) // snippet repairs don't re-embed
      .select(col("id"), col("subject"), col("subject_changed"),
        col("snippet"), col("snippet_changed"), col("reembed_needed"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("subject_changed") == false)
    assert(out(1L).getAs[Boolean]("reembed_needed") == false)
    assert(out(2L).getAs[String]("subject") == "bad sübject")
    assert(out(2L).getAs[Boolean]("subject_changed") == true)
    assert(out(2L).getAs[Boolean]("reembed_needed") == true)
    // snippet-only repair: fixed, flagged, but NOT re-embedded
    // (repair_encoding.go:279-287)
    assert(out(3L).getAs[String]("snippet") == "bad snïppet")
    assert(out(3L).getAs[Boolean]("snippet_changed") == true)
    assert(out(3L).getAs[Boolean]("reembed_needed") == false)
  }

  test("archive audit catches exactly the planted corruption") {
    val df = graft.queries.MaintenanceQueries
      .archiveVerify(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // corrupt counts must be exactly the planted residue class — and at
    // least one source must have a non-zero corrupt count at this SF,
    // otherwise the audit test is vacuous
    assert(rows.map(_.getAs[Long]("n_raw_corrupt")).sum > 0)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_raw_ok") + r.getAs[Long]("n_raw_corrupt") ==
        r.getAs[Long]("n_with_raw"))
    }
  }
}
