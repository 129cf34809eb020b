package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Raw-MIME helpers for the dedup content-hash fallback and Message-ID
  * backfill (reference: internal/dedup/dedup.go:673-758 normalizeRawMIME +
  * transportHeaders; internal/query/shared.go:196-207 zlib inflate).
  *
  * These are genuine UDFs — byte-level MIME surgery has no builtin
  * equivalent — but they run only on the dedup/backfill path over messages
  * that HAVE raw MIME, never on the query hot path. At scale the work is
  * embarrassingly parallel (one blob in, one hash out; no state).
  */
object Mime {

  /** zlib-decompress a blob; null in → null out; corrupt in → null out
    * (the reference skips and counts decompression failures,
    * dedup.go:543-560 — null is our skip marker).
    */
  def inflate(data: Array[Byte]): Array[Byte] = {
    if (data == null) return null
    // end() in finally: the corrupt→null exits are EXPECTED per-blob
    // outcomes, and an abandoned Inflater holds native zlib buffers
    // until GC — a corpus with many bad blobs would balloon off-heap
    // memory while the heap looks healthy
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        // needsDictionary: FDICT streams stall at n == 0 with
        // needsInput() == false — without this check the loop spins
        // forever (no exception, so the corrupt→null contract never
        // fires) and the executor task hangs
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw new java.io.EOFException("truncated or dictionary-compressed")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch { case _: Exception => null }
    finally inf.end()
  }

  val inflateUdf: UserDefinedFunction = udf(inflate _)

  /** zlib-compress a blob — the ingest-side twin of [[inflate]] (the
    * reference stores message_raw zlib-compressed, schema.sql
    * compression column); also builds compressed fixtures for the dedup
    * pipeline's oracled queries. Null in → null out.
    */
  def deflate(data: Array[Byte]): Array[Byte] = {
    if (data == null) return null
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
    val d = new java.util.zip.DeflaterOutputStream(out)
    d.write(data); d.close()
    out.toByteArray
  }

  val deflateUdf: UserDefinedFunction = udf(deflate _)

  /** Transport/export headers that vary across otherwise-identical copies
    * (reference dedup.go:674-694, canonical-case keys).
    */
  val transportHeaders: Set[String] = Set(
    "Received", "Delivered-To", "Return-Path", "X-Received",
    "X-Gmail-Labels", "X-Gmail-Received", "X-Google-Smtp-Source",
    "X-Gm-Message-State", "Authentication-Results", "Dkim-Signature",
    "Arc-Seal", "Arc-Message-Signature", "Arc-Authentication-Results",
    "X-Google-Dkim-Signature", "X-Forwarded-To", "X-Forwarded-For",
    "X-Original-To", "X-Apple-Mail-Labels")

  /** Canonical MIME header case: first letter of each '-'-segment upper,
    * rest lower ("dkim-signature" → "Dkim-Signature") — textproto
    * CanonicalMIMEHeaderKey semantics.
    */
  def canonicalHeaderKey(k: String): String =
    k.split("-", -1).map { seg =>
      if (seg.isEmpty) seg
      else seg.head.toUpper + seg.tail.toLowerCase
    }.mkString("-")

  /** Index of the blank-line header/body separator: the earlier of the
    * first CRLFCRLF and the first LFLF when both exist, else whichever
    * exists, else -1 — the one scan every raw-MIME helper in this file
    * shares (r13 review: was four near-identical inline copies).
    */
  private def headerEnd(s: String): Int = {
    val a = s.indexOf("\r\n\r\n"); val b = s.indexOf("\n\n")
    if (a >= 0 && b >= 0) math.min(a, b) else math.max(a, b)
  }

  /** Parse a header section into ordered (canonicalKey, value) pairs,
    * folding RFC822 continuation lines (leading space/tab).
    */
  private def parseHeaders(section: String): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var curKey: String = null
    var curVal = new StringBuilder
    def flush(): Unit = if (curKey != null) {
      out += ((curKey, curVal.toString)); curKey = null; curVal = new StringBuilder
    }
    for (line <- section.split("\r\n|\n", -1)) {
      if (line.nonEmpty && (line.head == ' ' || line.head == '\t')) {
        if (curKey != null) {
          if (curVal.nonEmpty) curVal += ' '
          curVal ++= line.trim
        }
      } else {
        flush()
        val idx = line.indexOf(':')
        if (idx > 0) {
          curKey = canonicalHeaderKey(line.substring(0, idx).trim)
          curVal = new StringBuilder(line.substring(idx + 1).trim)
        }
      }
    }
    flush()
    out.toSeq
  }

  /** Strip transport headers, sort the rest by canonical key (values keep
    * appearance order within a key), rejoin as "Key: value\n"… + "\n" +
    * body — the canonical form the content hash is computed over
    * (reference normalizeRawMIME dedup.go:696-755). Input with no
    * recognizable header/body split is returned unchanged, like the
    * reference.
    */
  def normalizeRawMime(raw: Array[Byte]): Array[Byte] = {
    if (raw == null) return null
    val s = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    val hEnd = headerEnd(s)
    if (hEnd == -1) return raw
    val bodyStart =
      if (s.startsWith("\r\n\r\n", hEnd)) hEnd + 4
      else if (s.startsWith("\n\n", hEnd)) hEnd + 2
      else return raw
    val headers = parseHeaders(s.substring(0, hEnd))
      .filterNot { case (k, _) => transportHeaders.contains(k) }
    val sorted = headers.sortBy(_._1)
    val sb = new StringBuilder
    sorted.foreach { case (k, v) => sb ++= k; sb ++= ": "; sb ++= v; sb += '\n' }
    sb += '\n'
    sb ++= s.substring(bodyStart)
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  val normalizeRawMimeUdf: UserDefinedFunction = udf(normalizeRawMime _)

  /** Extract the RFC822 Message-ID header from raw (inflated) MIME — the
    * backfill that recovers missing `rfc822_message_id` values before the
    * primary dedup pass (reference Scan/BackfillRFC822IDs
    * dedup.go:246-303). Returns null when absent/unparseable.
    */
  def extractMessageId(raw: Array[Byte]): String = {
    if (raw == null) return null
    val s = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    val hEnd = headerEnd(s)
    val section = if (hEnd >= 0) s.substring(0, hEnd) else s
    parseHeaders(section)
      .collectFirst { case ("Message-Id", v) if v.nonEmpty => v }
      .orNull
  }

  val extractMessageIdUdf: UserDefinedFunction = udf(extractMessageId _)

  /** Structural MIME sanity — the audit's stand-in for the reference's
    * `mime.Parse(rawData)` sample check (cmd/verify.go:241-247, enmime):
    * a recognizable header section (at least one "Key: value" line). A
    * blank-line separator is NOT required — RFC 5322 permits header-only
    * messages with no body, and enmime parses them (r13 advisor find:
    * requiring the separator flagged blobs the reference verifies
    * clean). When no separator exists the whole blob is read as the
    * header section. enmime is tolerant beyond even this, so the proxy
    * still errs toward flagging no more than the reference would.
    */
  def looksLikeMime(raw: Array[Byte]): Boolean = raw != null && {
    val s = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    val hEnd = headerEnd(s)
    val section = if (hEnd >= 0) s.substring(0, hEnd) else s
    parseHeaders(section).nonEmpty
  }

  val looksLikeMimeUdf: UserDefinedFunction = udf(looksLikeMime _)

  /** StripHTML (reference mime/parse.go:292-346), the GetBodyText
    * fallback for HTML-only messages: drop script/style/head subtrees,
    * block tags → newline (both opening and closing, so `</p><p>`
    * separates), strip remaining tags, decode entities, CR → LF,
    * NBSP → space, collapse intra-line runs, cap blank runs at one
    * empty line, trim. Entity decoding covers the named set the Go
    * test corpus exercises plus all numeric forms — Go's
    * html.UnescapeString knows the full HTML5 table; extending the map
    * is mechanical if a corpus needs more.
    */
  def stripHtml(rawHtml: String): String = {
    if (rawHtml == null) return null
    var text = "(?is)<script[^>]*>.*?</script>".r.replaceAllIn(rawHtml, "")
    text = "(?is)<style[^>]*>.*?</style>".r.replaceAllIn(text, "")
    text = "(?is)<head[^>]*>.*?</head>".r.replaceAllIn(text, "")
    text = ("(?i)<(/?)(p|div|br|hr|h[1-6]|li|tr|td|th|blockquote|pre|" +
      "table|ul|ol|dl|dt|dd)[^>]*>").r.replaceAllIn(text, "\n")
    text = "<[^>]*>".r.replaceAllIn(text, "")
    val named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
      "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
      "reg" -> "®", "trade" -> "™", "hellip" -> "…",
      "mdash" -> "—", "ndash" -> "–", "rsquo" -> "’",
      "lsquo" -> "‘", "rdquo" -> "”", "ldquo" -> "“")
    text = "&(#[xX]?[0-9a-fA-F]+|[a-zA-Z]+);".r.replaceAllIn(text, m => {
      val e = m.group(1)
      val rep =
        if (e.startsWith("#x") || e.startsWith("#X"))
          try new String(Character.toChars(Integer.parseInt(e.drop(2), 16)))
          catch { case _: Exception => m.matched }
        else if (e.startsWith("#"))
          try new String(Character.toChars(Integer.parseInt(e.drop(1))))
          catch { case _: Exception => m.matched }
        else named.getOrElse(e, m.matched)
      java.util.regex.Matcher.quoteReplacement(rep)
    })
    text = text.replace("\r\n", "\n").replace("\r", "\n")
      .replace("\u00A0", " ")
    text = text.split("\n", -1)
      .map(_.split("\\s+").filter(_.nonEmpty).mkString(" "))
      .mkString("\n")
    while (text.contains("\n\n\n")) text = text.replace("\n\n\n", "\n\n")
    text.trim
  }

  val stripHtmlUdf: UserDefinedFunction = udf(stripHtml _)

  /** Body text from raw (inflated) MIME — the reference's
    * `mime.Parse(raw).GetBodyText()` path (shared.go:209-215), covering
    * the dominant archive shapes: single-part plain text, with
    * quoted-printable and base64 transfer decodings. Multipart messages
    * return the first text/plain part; ⁺r13 parity — an HTML-ONLY
    * message (single-part text/html, or multipart with no text/plain
    * part) returns [[stripHtml]] of the HTML body, the GetBodyText
    * fallback (parse.go:350-358: prefer plain, fall back to stripped
    * HTML); unparseable input returns null. (A full MIME tree walk is
    * out of scope — bodies are materialized at ingest in this engine;
    * see CacheBuilder.buildBodies.)
    */
  def extractBodyText(raw: Array[Byte]): String = {
    if (raw == null) return null
    val s = new String(raw, java.nio.charset.StandardCharsets.ISO_8859_1)
    val hEnd = headerEnd(s)
    if (hEnd < 0) return null
    val headers = parseHeaders(s.substring(0, hEnd)).toMap
    val bodyStart = if (s.startsWith("\r\n\r\n", hEnd)) hEnd + 4
      else hEnd + 2
    var body = s.substring(bodyStart)
    val ctypeRaw = headers.getOrElse("Content-Type", "text/plain")
    val ctype = ctypeRaw.toLowerCase
    if (ctype.startsWith("multipart/")) {
      // boundary is case-sensitive — extract from the original header
      val boundary = """(?i)boundary="?([^";\s]+)"?""".r
        .findFirstMatchIn(ctypeRaw).map(_.group(1)).getOrElse(return null)
      val parts = body.split(java.util.regex.Pattern.quote("--" + boundary))
      // prefer text/plain; fall back to a stripped text/html part — the
      // GetBodyText preference order (parse.go:350-358)
      val textPart = parts.find(_.toLowerCase.contains("text/plain"))
        .orElse(parts.find(_.toLowerCase.contains("text/html")))
        .getOrElse(return null)
      return extractBodyText(
        textPart.dropWhile(c => c == '\r' || c == '\n')
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    }
    val decoded =
      headers.getOrElse("Content-Transfer-Encoding", "").toLowerCase.trim match {
      case "base64" =>
        try new String(java.util.Base64.getMimeDecoder.decode(body.trim),
          java.nio.charset.StandardCharsets.UTF_8)
        catch { case _: Exception => null }
      case "quoted-printable" =>
        val unfolded = body.replace("=\r\n", "").replace("=\n", "")
        val out = new java.io.ByteArrayOutputStream()
        var i = 0
        while (i < unfolded.length) {
          val c = unfolded.charAt(i)
          if (c == '=' && i + 3 <= unfolded.length) {
            try {
              out.write(Integer.parseInt(unfolded.substring(i + 1, i + 3), 16))
              i += 3
            } catch { case _: Exception => out.write(c.toInt); i += 1 }
          } else { out.write(c.toInt); i += 1 }
        }
        new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      case _ => body
    }
    if (ctype.startsWith("text/html")) stripHtml(decoded) else decoded
  }

  val extractBodyTextUdf: UserDefinedFunction = udf(extractBodyText _)

  /** Embedding preprocessing (reference vector/embed/preprocess.go:15-80,
    * exact regexes): REMOVE — not cut at — reply preambles ("On …
    * wrote:" plus the quoted lines that follow) and standalone quoted
    * lines anywhere in the text (r13 audit: the pre-r13 version cut the
    * body at the first marker, silently dropping the author's own text
    * AFTER a quoted block, and invented "From:"/"Original Message"
    * markers the reference does not have); strip the signature tail
    * from the "\n--\s*\n" delimiter; trim; prepend "Subject: " when
    * non-empty; truncate to maxChars code points (runes, not bytes —
    * preprocess.go:71-79), with maxChars <= 0 disabling truncation like
    * the reference. Both strip flags default ON
    * (vector/config.go:50-66).
    */
  def preprocessForEmbedding(subject: String, body: String, maxChars: Int,
      stripQuotes: Boolean = true, stripSignatures: Boolean = true): String = {
    var s = if (body == null) "" else body
    if (stripQuotes) {
      s = "(?m)^On [^\n]+wrote:\\s*\n(?:>+[ \t]?.*\n?)+".r.replaceAllIn(s, "")
      s = "(?m)^>+[ \t]?.*\n?".r.replaceAllIn(s, "")
    }
    if (stripSignatures)
      s = "\n--\\s*\n[\\s\\S]*\\z".r.replaceAllIn(s, "")
    s = s.trim
    val combined =
      (if (subject != null && subject.nonEmpty) s"Subject: $subject\n\n"
       else "") + s
    if (maxChars <= 0) return combined
    if (combined.codePointCount(0, combined.length) <= maxChars) combined
    else combined.substring(0, combined.offsetByCodePoints(0, maxChars))
  }

  val preprocessForEmbeddingUdf: UserDefinedFunction =
    udf((subj: String, body: String) => preprocessForEmbedding(subj, body, 8000))
}
