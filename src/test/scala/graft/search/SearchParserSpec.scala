package graft.search

import java.time.LocalDateTime
import org.scalatest.funsuite.AnyFunSuite

class SearchParserSpec extends AnyFunSuite {
  private val now = LocalDateTime.of(2026, 8, 1, 12, 0, 0)

  test("bare words become text terms") {
    assert(SearchParser.parse("hello world").textTerms == Seq("hello", "world"))
  }

  test("quoted phrase preserved as one term") {
    val q = SearchParser.parse("\"hello world\" extra")
    assert(q.textTerms == Seq("hello world", "extra"))
  }

  test("from/to/cc/bcc are lowercased and collected") {
    val q = SearchParser.parse("from:Alice@Example.com to:bob@x.org cc:c@x.org bcc:d@x.org")
    assert(q.fromAddrs == Seq("alice@example.com"))
    assert(q.toAddrs == Seq("bob@x.org"))
    assert(q.ccAddrs == Seq("c@x.org"))
    assert(q.bccAddrs == Seq("d@x.org"))
  }

  test("bare domain gets @ prefix via TLD heuristic; dotted local part does not") {
    assert(SearchParser.parse("from:example.com").fromAddrs == Seq("@example.com"))
    assert(SearchParser.parse("from:example.co").fromAddrs == Seq("@example.co"))
    assert(SearchParser.parse("from:john.doe").fromAddrs == Seq("john.doe"))
    assert(SearchParser.parse("from:brand.pizza").fromAddrs == Seq("brand.pizza"))
  }

  test("subject: with quoted value keeps spaces") {
    val q = SearchParser.parse("subject:\"project update\" from:a@x.com")
    assert(q.subjectTerms == Seq("project update"))
    assert(q.fromAddrs == Seq("a@x.com"))
  }

  test("absurd relative-date counts degrade gracefully, never crash the parse") {
    // >19 digits → NumberFormatException; huge years → DateTimeException
    // past LocalDateTime's range; both must leave the token a text term
    // unparseable date values are IGNORED (the before:/after: policy) —
    // the point here is the parse completes instead of throwing
    val q1 = SearchParser.parse("older_than:99999999999999999999d hello")
    assert(q1.beforeDate.isEmpty)
    assert(q1.textTerms == Seq("hello"))
    val q2 = SearchParser.parse("newer_than:99999999999y")
    assert(q2.afterDate.isEmpty)
  }

  test("empty operator values are ignored, not compiled to match-nothing filters") {
    // "from: alice@x.com" tokenizes "from:" alone — the empty value must
    // not become an '' address filter that empties the whole result set
    val q = SearchParser.parse("from: alice@x.com")
    assert(q.fromAddrs.isEmpty)
    assert(q.textTerms.contains("alice@x.com"))
    assert(SearchParser.parse("subject: to: cc: bcc:").subjectTerms.isEmpty)
  }

  test("label: and l: collect; blank labels dropped") {
    val q = SearchParser.parse("label:Work l:urgent label: ")
    assert(q.labels == Seq("Work", "urgent"))
  }

  test("has:attachment and has:attachments set the flag; others ignored") {
    assert(SearchParser.parse("has:attachment").hasAttachment.contains(true))
    assert(SearchParser.parse("has:attachments").hasAttachment.contains(true))
    assert(SearchParser.parse("has:photo").hasAttachment.isEmpty)
  }

  test("before/after parse multiple date formats") {
    val q = SearchParser.parse("after:2024-01-15 before:2024/12/31", now)
    assert(q.afterDate.contains(LocalDateTime.of(2024, 1, 15, 0, 0)))
    assert(q.beforeDate.contains(LocalDateTime.of(2024, 12, 31, 0, 0)))
    // ambiguous slashed dates read MM/dd first (Go format order,
    // parser.go:316-321); unambiguous ones fall through to dd/MM
    assert(SearchParser.parse("after:04/12/2024", now).afterDate
      .contains(LocalDateTime.of(2024, 4, 12, 0, 0)))
    assert(SearchParser.parse("after:25/12/2024", now).afterDate
      .contains(LocalDateTime.of(2024, 12, 25, 0, 0)))
    // impossible calendar dates DROP the filter like Go's time.Parse
    // error path — they must not coerce to the month's last day
    // (Java's SMART resolver would; we pin STRICT)
    assert(SearchParser.parse("before:2025-02-29", now).beforeDate.isEmpty)
    assert(SearchParser.parse("before:31/04/2026", now).beforeDate.isEmpty)
    assert(SearchParser.parse("before:2024-02-29", now).beforeDate
      .contains(LocalDateTime.of(2024, 2, 29, 0, 0))) // real leap day parses
  }

  test("older_than/newer_than relative dates") {
    val q = SearchParser.parse("newer_than:7d older_than:1y", now)
    assert(q.afterDate.contains(now.minusDays(7)))
    assert(q.beforeDate.contains(now.minusYears(1)))
  }

  test("larger/smaller sizes with K/M/G suffixes and plain bytes") {
    val q = SearchParser.parse("larger:5M smaller:100K")
    assert(q.largerThan.contains(5L * 1024 * 1024))
    assert(q.smallerThan.contains(100L * 1024))
    assert(SearchParser.parse("larger:1024").largerThan.contains(1024L))
    assert(SearchParser.parse("larger:1.5G").largerThan.contains((1.5 * 1024 * 1024 * 1024).toLong))
  }

  test("unknown operator token becomes a text term") {
    val q = SearchParser.parse("foo:bar baz")
    assert(q.textTerms == Seq("foo:bar", "baz"))
  }

  test("invalid values are ignored, not errors") {
    val q = SearchParser.parse("before:not-a-date larger:huge", now)
    assert(q.beforeDate.isEmpty && q.largerThan.isEmpty)
  }

  test("unterminated quote emits collected text instead of dropping it") {
    val q = SearchParser.parse("\"unfinished phrase")
    assert(q.textTerms == Seq("unfinished phrase"))
  }

  test("apostrophes tokenize exactly as the reference does (parity pin)") {
    // parser.go:260-266 opens a quote section on ANY apostrophe, even
    // mid-word — these outputs look odd but are REFERENCE-EXACT, and the
    // parser's contract is verbatim parity, not naturalness. If this
    // test ever needs to change, the reference changed first.
    assert(SearchParser.parse("don't stop").textTerms == Seq("don", "t stop"))
    val q = SearchParser.parse("from:o'brien@x.com hello")
    assert(q.fromAddrs == Seq("o"))
    assert(q.textTerms == Seq("brien@x.com hello"))
    // unterminated quote INSIDE an op value keeps the dangling quote in
    // the value, same as the reference's unquote (only strips a matched
    // pair)
    assert(SearchParser.parse("from:\"john doe").fromAddrs == Seq("\"john doe"))
  }

  test("isEmpty / hasOperators") {
    assert(SearchParser.parse("").isEmpty)
    assert(!SearchParser.parse("word").hasOperators)
    assert(SearchParser.parse("from:a@b.com").hasOperators)
  }
}
