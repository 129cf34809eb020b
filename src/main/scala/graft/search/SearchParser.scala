package graft.search

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import scala.collection.mutable.ArrayBuffer

/** Gmail-style search query, the parse result (reference:
  * internal/search/parser.go:12-27). Multiple terms AND across dimensions;
  * values within one address dimension OR together (sqlite.go:1466-1469).
  */
final case class SearchQuery(
    textTerms: Seq[String] = Nil,
    fromAddrs: Seq[String] = Nil,
    toAddrs: Seq[String] = Nil,
    ccAddrs: Seq[String] = Nil,
    bccAddrs: Seq[String] = Nil,
    subjectTerms: Seq[String] = Nil,
    labels: Seq[String] = Nil,
    hasAttachment: Option[Boolean] = None,
    beforeDate: Option[LocalDateTime] = None,
    afterDate: Option[LocalDateTime] = None,
    largerThan: Option[Long] = None,
    smallerThan: Option[Long] = None,
    // true when a before/after boundary came from a RELATIVE term
    // (older_than:/newer_than:) — those resolve against now() at parse
    // time, so equal raw strings parse differently across calls; cache
    // layers use this to route the query to a non-accumulating slot
    usedNow: Boolean = false) {
  def isEmpty: Boolean = this == SearchQuery()
  def hasOperators: Boolean = this != SearchQuery(textTerms = textTerms)
}

/** Parser for the Gmail-like query language (reference:
  * internal/search/parser.go). Pure string code — zero Spark dependency;
  * the compiled predicate lives in [[graft.engine.FilterCompiler]].
  *
  * Operators: from: to: cc: bcc: subject: label:/l: has:attachment
  * before:/after: (YYYY-MM-DD and 3 more formats) older_than:/newer_than:
  * (7d/2w/1m/1y) larger:/smaller: (5M/100K/1G) + bare and "quoted" terms.
  */
object SearchParser {

  def parse(q: String): SearchQuery = parse(q, LocalDateTime.now(ZoneOffset.UTC))

  def parse(queryStr: String, now: LocalDateTime): SearchQuery = {
    var q = SearchQuery()
    for (token <- tokenize(queryStr)) {
      if (isQuotedPhrase(token)) {
        q = q.copy(textTerms = q.textTerms :+ unquote(token))
      } else {
        val idx = token.indexOf(':')
        if (idx >= 0) {
          val op = token.substring(0, idx).toLowerCase
          val value = unquote(token.substring(idx + 1))
          q = applyOp(q, op, value, now).getOrElse(
            q.copy(textTerms = q.textTerms :+ token))
        } else q = q.copy(textTerms = q.textTerms :+ token)
      }
    }
    q
  }

  private def applyOp(q: SearchQuery, op: String, v: String,
      now: LocalDateTime): Option[SearchQuery] = op match {
    // empty values ("from:", tokenized alone when the user typed a space
    // after the colon) are IGNORED like label: already does — an empty
    // address filter would compile to `email = ''` and silently empty
    // the whole result set
    case "from" if v.trim.nonEmpty =>
      Some(q.copy(fromAddrs = q.fromAddrs :+ normalizeAddr(v)))
    case "to" if v.trim.nonEmpty =>
      Some(q.copy(toAddrs = q.toAddrs :+ normalizeAddr(v)))
    case "cc" if v.trim.nonEmpty =>
      Some(q.copy(ccAddrs = q.ccAddrs :+ normalizeAddr(v)))
    case "bcc" if v.trim.nonEmpty =>
      Some(q.copy(bccAddrs = q.bccAddrs :+ normalizeAddr(v)))
    case "subject" if v.trim.nonEmpty =>
      Some(q.copy(subjectTerms = q.subjectTerms :+ v))
    case "from" | "to" | "cc" | "bcc" | "subject" => Some(q)
    case "label" | "l" =>
      val t = v.trim
      Some(if (t.nonEmpty) q.copy(labels = q.labels :+ t) else q)
    case "has" =>
      val low = v.toLowerCase
      Some(if (low == "attachment" || low == "attachments")
        q.copy(hasAttachment = Some(true)) else q)
    case "before" => Some(parseDate(v).fold(q)(t => q.copy(beforeDate = Some(t))))
    case "after" => Some(parseDate(v).fold(q)(t => q.copy(afterDate = Some(t))))
    case "older_than" =>
      Some(parseRelativeDate(v, now).fold(q)(t =>
        q.copy(beforeDate = Some(t), usedNow = true)))
    case "newer_than" =>
      Some(parseRelativeDate(v, now).fold(q)(t =>
        q.copy(afterDate = Some(t), usedNow = true)))
    case "larger" => Some(parseSize(v).fold(q)(n => q.copy(largerThan = Some(n))))
    case "smaller" => Some(parseSize(v).fold(q)(n => q.copy(smallerThan = Some(n))))
    case _ => None // unknown operator → whole token becomes a text term
  }

  /** Bare domains get an "@" prefix so engines treat them as domain
    * patterns; dotted local parts are left alone via the TLD heuristic
    * (reference parser.go:53-110).
    */
  def normalizeAddr(value: String): String = {
    val v = value.toLowerCase
    if (!v.contains("@") && looksLikeDomain(v)) "@" + v else v
  }

  private[search] def looksLikeDomain(v: String): Boolean = {
    val dot = v.lastIndexOf('.')
    if (dot <= 0 || dot == v.length - 1) false
    else isKnownTLD(v.substring(dot + 1))
  }

  // Common gTLDs (3+ chars); any 2-letter alphabetic suffix counts as ccTLD.
  private val knownGTLDs: Set[String] = Set(
    "com", "org", "net", "edu", "gov", "mil", "int",
    "info", "biz", "name", "mobi",
    "top", "xyz", "app", "dev", "shop", "online", "site", "store",
    "tech", "cloud", "blog", "space", "click", "vip", "cfd",
    "agency", "business", "center", "company", "digital", "email",
    "media", "network", "services", "solutions", "studio", "team",
    "work", "world", "zone",
    "design", "events", "expert", "finance", "health", "host",
    "legal", "live", "marketing", "news", "support", "trade", "web",
    "asia")

  private def isKnownTLD(s: String): Boolean =
    if (s.length == 2) s.forall(c => c >= 'a' && c <= 'z')
    else knownGTLDs.contains(s)

  // strips a MATCHING pair of double or single quotes — the tokenizer
  // accepts both quote characters for op:"value" / op:'value'
  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == s.last && (s.head == '"' || s.head == '\''))
      s.substring(1, s.length - 1)
    else s

  private def isQuotedPhrase(t: String): Boolean =
    t.length > 2 && t.head == '"' && t.last == '"'

  /** Tokenizer preserving quoted phrases and op:"value" pairs
    * (reference parser.go:250-312). Unterminated quotes emit what was
    * collected as a plain token rather than dropping input.
    */
  private[search] def tokenize(queryStr: String): Seq[String] = {
    val tokens = ArrayBuffer.empty[String]
    val current = new StringBuilder
    var inQuotes = false
    var quoteChar = '\u0000'
    var afterColon = false
    var opQuoted = false

    for (ch <- queryStr) {
      // NOTE deliberate reference parity (parser.go:260-266): ANY
      // apostrophe opens a quote section, even mid-word — "don't" splits
      // to [don, t] and "from:o'brien" yields from:o + brien, exactly as
      // the reference tokenizes them (pinned by SearchParserSpec). A
      // token-start-only rule would read more naturally but would break
      // output parity with the reference on apostrophe queries.
      if ((ch == '"' || ch == '\'') && !inQuotes) {
        inQuotes = true; quoteChar = ch
        opQuoted = afterColon
        if (!afterColon && current.nonEmpty) {
          tokens += current.toString; current.clear()
        }
        if (afterColon) current += ch
        afterColon = false
      } else if (ch == quoteChar && inQuotes) {
        inQuotes = false
        if (opQuoted) {
          current += ch
          tokens += current.toString; current.clear()
        } else if (current.nonEmpty) {
          tokens += "\"" + current.toString + "\""
          current.clear()
        }
        quoteChar = '\u0000'; opQuoted = false
      } else if (ch == ' ' && !inQuotes) {
        if (current.nonEmpty) { tokens += current.toString; current.clear() }
        afterColon = false
      } else {
        current += ch
        afterColon = ch == ':'
      }
    }
    if (current.nonEmpty) tokens += current.toString
    tokens.toSeq
  }

  // STRICT resolver ('u' = proleptic year, required by STRICT): Go's
  // time.Parse ERRORS on impossible calendar dates (Feb 29 of a
  // non-leap year, April 31) and the operator then drops the filter —
  // Java's default SMART resolver would silently coerce them to the
  // month's last day instead (r13 audit). Each format also carries a
  // SHAPE guard (r13 review find): Go's layout elements are
  // fixed-width (exactly 4 year digits, exactly 2 month/day digits),
  // while Java's `uuuu` happily parses a 5+-digit year — without the
  // guard "12345-01-02" would apply an impossible-future filter where
  // the reference drops the filter entirely.
  private val dateFormats = Seq(
    "uuuu-MM-dd" -> """^\d{4}-\d{2}-\d{2}$""".r,
    "uuuu/MM/dd" -> """^\d{4}/\d{2}/\d{2}$""".r,
    "MM/dd/uuuu" -> """^\d{2}/\d{2}/\d{4}$""".r,
    "dd/MM/uuuu" -> """^\d{2}/\d{2}/\d{4}$""".r)
    .map { case (p, re) =>
      (DateTimeFormatter.ofPattern(p)
        .withResolverStyle(java.time.format.ResolverStyle.STRICT), re)
    }

  private[search] def parseDate(value: String): Option[LocalDateTime] = {
    val v = value.trim
    dateFormats.view.flatMap { case (f, shape) =>
      if (shape.findFirstIn(v).isEmpty) None
      else
        try Some(LocalDate.parse(v, f).atStartOfDay)
        catch { case _: Exception => None }
    }.headOption
  }

  private val relRe = """^(\d+)([dwmy])$""".r

  private[search] def parseRelativeDate(value: String,
      now: LocalDateTime): Option[LocalDateTime] =
    value.trim.toLowerCase match {
      case relRe(n, unit) =>
        // absurd counts (>19 digits → NumberFormatException; huge years →
        // DateTimeException past LocalDateTime's ±999999999 range) must be
        // SWALLOWED like every other malformed operator value — the
        // reference consumes the token once the op name matches, whether
        // or not the value parses (parser.go's switch drops it; pinned by
        // SearchParserSpec) — not crash the whole query parse
        try {
          val amount = n.toLong
          unit match {
            case "d" => Some(now.minusDays(amount))
            // multiplyExact: a near-Long.MaxValue count would WRAP to a
            // small/negative day delta and become a silently wrong
            // filter instead of landing in the catch below
            case "w" => Some(now.minusDays(Math.multiplyExact(amount, 7L)))
            case "m" => Some(now.minusMonths(amount))
            case "y" => Some(now.minusYears(amount))
            case _ => None
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }

  private val sizeSuffixes: Seq[(String, Long)] = Seq(
    // longer suffixes first so "KB" matches before "B"-less plain numbers
    "KB" -> 1024L, "MB" -> (1024L * 1024), "GB" -> (1024L * 1024 * 1024),
    "K" -> 1024L, "M" -> (1024L * 1024), "G" -> (1024L * 1024 * 1024))

  private[search] def parseSize(value: String): Option[Long] = {
    val v = value.trim.toUpperCase
    sizeSuffixes.collectFirst {
      case (suf, mult) if v.endsWith(suf) =>
        v.dropRight(suf.length).toDoubleOption.map(n => (n * mult).toLong)
    }.getOrElse(v.toLongOption)
  }
}
