package graft.engine

import graft.SparkTestBase
import graft.model._

/** Adversarial-value tests mirroring the reference's injection suite
  * (internal/query/sqlite_injection_test.go:1-141, ILIKE escape edge cases
  * duckdb_test.go:1893-2040). The Spark engine never builds SQL text from
  * filter values — every value becomes a bound `Column` literal — so these
  * assert the structural guarantee: hostile values behave as literals,
  * wildcards are not wildcards, and nothing errors.
  */
class InjectionSpec extends SparkTestBase {
  import Fixtures._

  private lazy val v = Fixtures.vault(spark,
    messages = Seq(
      msg(1, "100% real offer", "2024-01-01 10:00:00"),
      msg(2, "underscore_subject", "2024-01-02 10:00:00"),
      msg(3, "back\\slash", "2024-01-03 10:00:00"),
      msg(4, "Robert'); DROP TABLE messages;--", "2024-01-04 10:00:00"),
      msg(5, "plain", "2024-01-05 10:00:00")),
    recipients = (1 to 5).map(i => MrRow(i.toLong, 1L, "from", None)),
    participants = Seq(
      PRow(1, Some("a'or'1'='1@x.com"), Some("x%y_z"), None, Some("x.com"))))

  private lazy val engine = new MsgEngine(v)

  test("SQL-shaped search terms match literally, mutate nothing") {
    val hits = engine.searchFast("\"DROP TABLE\"").collect()
    assert(hits.map(_.getAs[Long]("id")).toSeq == Seq(4))
    assert(v.messages.count() == 5) // still here
  }

  test("LIKE metacharacters are literal in search terms") {
    // '%' must match only the literal percent subject, not everything
    assert(engine.searchFast("100%").collect().map(_.getAs[Long]("id")).toSeq == Seq(1))
    // '_' literal, not single-char wildcard
    assert(engine.searchFast("underscore_subject").collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(2))
    // backslash survives as content
    assert(engine.searchFast("back\\slash").collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(3))
  }

  test("hostile sender filter value is a literal equality") {
    val out = engine.filters.compile(
      MessageFilter(sender = "a'or'1'='1@x.com")).collect()
    assert(out.length == 5) // participant 1 is the from of all 5
    val none = engine.filters.compile(
      MessageFilter(sender = "' OR 1=1 --")).collect()
    assert(none.isEmpty)
  }

  test("hostile label and quoted operator values parse and match nothing") {
    assert(engine.searchFast("label:'; DELETE FROM labels;--").collect().isEmpty)
    assert(engine.searchFast("from:\"x' OR 'a'='a\"").collect().isEmpty)
    assert(v.labels.count() == 0)
  }

  test("display-name wildcards in sender-name filter stay literal") {
    val hit = engine.filters.compile(MessageFilter(senderName = "x%y_z"))
    assert(hit.count() == 5)
    assert(engine.filters.compile(MessageFilter(senderName = "x%y%z")).count() == 0)
  }

  // ==========================================================================
  // Table-driven ILIKE-escape sweep — the full adversarial surface of
  // reference duckdb_test.go:1984-2260, behavioral form. The reference
  // asserts the generated SQL carries escaped args ("100\%\_off" etc.);
  // the Spark engine builds Column predicates, so the equivalent
  // guarantee is observable: each term matches ONLY its literal subject,
  // never the decoy that a live %/_/regex metacharacter would also catch.
  // ==========================================================================

  private lazy val wild = Fixtures.vault(spark,
    messages = Seq(
      // TestBuildWhereClause_EscapedArgs (duckdb_test.go:1984-2001)
      msg(10, "grab 100%_off today", "2024-02-01 10:00:00"),
      msg(11, "grab 100ZZZ_off today", "2024-02-02 10:00:00"), // %-decoy
      msg(12, "grab 100%Xoff today", "2024-02-03 10:00:00"), // _-decoy
      // TestBuildWhereClause_ILIKEEscape table (duckdb_test.go:2003-2040)
      msg(13, "say hello there", "2024-02-04 10:00:00"),
      msg(14, "number 123 here", "2024-02-05 10:00:00"),
      msg(15, "give _test a run", "2024-02-06 10:00:00"),
      msg(16, "give Xtest a run", "2024-02-07 10:00:00"), // _-decoy
      msg(17, "+15551234567 called", "2024-02-08 10:00:00"),
      msg(18, "mail @gmail.com now", "2024-02-09 10:00:00"),
      msg(19, "#bug filed", "2024-02-10 10:00:00"),
      msg(20, "sale 100%off ends", "2024-02-11 10:00:00"),
      msg(21, "sale 100ZZZoff ends", "2024-02-12 10:00:00"), // %-decoy
      // TestBuildSearchConditions_EscapedWildcards subject: case
      // (duckdb_test.go:2172-2177: "50%_discount")
      msg(22, "get 50%_discount now", "2024-02-13 10:00:00"),
      msg(23, "get 50ZZZ_discount now", "2024-02-14 10:00:00"), // %-decoy
      // UsesILIKENotRegex (duckdb_test.go:2212-2255): regex metachars in
      // terms are content, not patterns — "a.b" must not match "aXb"
      msg(24, "pattern a.b literal", "2024-02-15 10:00:00"),
      msg(25, "pattern aXb literal", "2024-02-16 10:00:00")),
    recipients =
      // from: p1 for 10-19, from: p2 (wildcard-email decoy pair) for 20-25;
      // to: p3 on 10, to: p4 (decoy) on 11
      (10 to 19).map(i => MrRow(i.toLong, 1L, "from", None)) ++
        (20 to 25).map(i => MrRow(i.toLong, 2L, "from", None)) ++
        Seq(MrRow(10L, 3L, "to", None), MrRow(11L, 4L, "to", None)),
    participants = Seq(
      // TestBuildSearchConditions_EscapedWildcards from: case
      // (duckdb_test.go:2156-2163: "test_user%")
      PRow(1, Some("test_user%@x.com"), None, None, Some("x.com")),
      PRow(2, Some("testXuserY@x.com"), None, None, Some("x.com")),
      // to: case (duckdb_test.go:2164-2171: "bob_smith%")
      PRow(3, Some("bob_smith%@y.com"), None, None, Some("y.com")),
      PRow(4, Some("bobXsmithY@y.com"), None, None, Some("y.com"))))

  private lazy val wildEngine = new MsgEngine(wild)

  private def hits(q: String): Seq[Long] =
    wildEngine.searchFast(q).collect().map(_.getAs[Long]("id")).toSeq.sorted

  test("text-term sweep: every duckdb_test ILIKE case matches literally") {
    // (term, the ONLY ids it may match) — one row per reference case
    val cases: Seq[(String, Seq[Long])] = Seq(
      "100%_off" -> Seq(10), // EscapedArgs: both metachars escaped
      "hello" -> Seq(13), // word_char_letter
      "123" -> Seq(14, 17), // word_char_digit (17: "123" ⊂ "15551234567" — substring semantics)
      "_test" -> Seq(15), // word_char_underscore (16 is the decoy)
      "+15551234567" -> Seq(17), // non_word_plus
      "#bug" -> Seq(19), // non_word_hash
      "100%off" -> Seq(20), // wildcard_percent (21 is the decoy)
      "\"50%_discount\"" -> Seq(22)) // subject text, quoted phrase
    cases.foreach { case (term, want) =>
      assert(hits(term) == want,
        s"term '$term': expected exactly $want, got ${hits(term)}")
    }
    // non_word_at: "@gmail.com" parses as a domain-ish bare term; subject
    // text containing it must be findable via the quoted form
    assert(hits("\"@gmail.com\"") == Seq(18))
  }

  test("subject: operator escapes wildcards (duckdb_test.go:2172-2177)") {
    assert(hits("subject:\"50%_discount\"") == Seq(22))
    assert(hits("subject:\"100%_off\"") == Seq(10))
  }

  test("from:/to: operators escape wildcards (duckdb_test.go:2156-2171)") {
    // from:test_user%@x.com — literal % in the address; the decoy
    // testXuserY@x.com must NOT match
    assert(hits("from:test_user%@x.com") == (10L to 19L))
    assert(hits("to:bob_smith%@y.com") == Seq(10))
    // and the decoys are reachable only by their own literal address
    assert(hits("from:testXuserY@x.com") == (20L to 25L))
    assert(hits("to:bobXsmithY@y.com") == Seq(11))
  }

  test("search is substring-match, not regex (duckdb_test.go:2212-2255)") {
    // '.' is literal: "a.b" must match only the a.b subject, not aXb
    assert(hits("a.b") == Seq(24))
    // regex-only constructs match nothing rather than erroring
    assert(hits("\"(?i)hello\"").isEmpty)
    assert(hits("\"a.*b\"").isEmpty)
  }

  // ==========================================================================
  // The reference's injection corpus (sqlite_injection_test.go:1-141),
  // table-driven. Enum cases: Go's ViewType(999) etc. must error rather
  // than fall through to a default SQL branch; in Scala the sealed
  // hierarchies make out-of-range values unrepresentable to compiled
  // callers, and the string boundary (fromName) rejects unknown names
  // with the reference's wording. Filter-value cases: every payload is a
  // bound Column literal, so it matches nothing and mutates nothing.
  // ==========================================================================

  test("invalid enum names are rejected, never defaulted (sqlite_injection_test.go:11-88)") {
    // one row per reference test: (parse result, required error fragment)
    val cases: Seq[(Either[String, Any], String)] = Seq(
      (ViewType.fromName("999"), "unsupported view type"),
      (ViewType.fromName("Senders; DROP TABLE messages"), "unsupported view type"),
      (SortField.fromName("999"), "unsupported sort field"),
      (SortField.fromName("count); --"), "unsupported sort field"),
      (MessageSortField.fromName("999"), "unsupported message sort field"),
      (TimeGranularity.fromName("999"), "unsupported time granularity"),
      (TimeGranularity.fromName("century"), "unsupported time granularity"))
    cases.foreach { case (res, frag) =>
      assert(res.isLeft && res.left.exists(_.contains(frag)),
        s"expected Left(...$frag...), got $res")
    }
    // and the legitimate names still parse (no over-rejection)
    assert(ViewType.fromName("senders") == Right(ViewType.Senders))
    assert(SortField.fromName("attachment_size") == Right(SortField.AttachmentSize))
    assert(MessageSortField.fromName("Date") == Right(MessageSortField.Date))
    assert(TimeGranularity.fromName("month") == Right(TimeGranularity.Month))
  }

  test("injection payload sweep: sender/label filters are literals (sqlite_injection_test.go:93-141)") {
    // the reference's exact payload list
    val payloads = Seq(
      "'; DROP TABLE messages; --",
      "alice@example.com' OR '1'='1",
      "alice@example.com\" OR \"1\"=\"1",
      "alice@example.com; DELETE FROM messages WHERE '1'='1",
      "alice@example.com UNION SELECT * FROM messages--")
    payloads.foreach { p =>
      // Sender filter: literal equality — must return 0 rows, not all
      assert(engine.filters.compile(MessageFilter(sender = p)).count() == 0,
        s"sender payload must match nothing: $p")
      // Label filter: same guarantee through the label join
      assert(engine.filters.compile(MessageFilter(label = p)).count() == 0,
        s"label payload must match nothing: $p")
    }
    // the archive is intact after every attempt (reference asserts the
    // seed row count survives)
    assert(v.messages.count() == 5)
  }

  test("aggregate search filters (duckdb_test.go:2042-2140 behavioral twins)") {
    import Fixtures._
    // alice: msgs 1-3 (Hello World / Re: Hello / Follow up), att on 2
    // bob: msgs 4-5 (Question / Final), att on 4
    // labels: INBOX on 1-5, Work on 1+4, IMPORTANT on 2
    val v2 = Fixtures.vault(spark,
      messages = Seq(
        msg(1, "Hello World", "2024-01-01 10:00:00"),
        msg(2, "Re: Hello", "2024-01-02 10:00:00", hasAtt = true, attCount = 1),
        msg(3, "Follow up", "2024-01-03 10:00:00"),
        msg(4, "Question", "2024-01-04 10:00:00", hasAtt = true, attCount = 1),
        msg(5, "Final", "2024-01-05 10:00:00")),
      recipients = (1 to 3).map(i => MrRow(i.toLong, 1L, "from", None)) ++
        (4 to 5).map(i => MrRow(i.toLong, 2L, "from", None)),
      participants = Seq(
        PRow(1, Some("alice@example.com"), Some("Alice"), None, Some("example.com")),
        PRow(2, Some("bob@company.org"), Some("Bob"), None, Some("company.org"))),
      labels = Seq(LblRow(1, "INBOX"), LblRow(2, "Work"), LblRow(3, "IMPORTANT")),
      messageLabels = (1 to 5).map(i => MlRow(i.toLong, 1L)) ++
        Seq(MlRow(1L, 2L), MlRow(4L, 2L), MlRow(2L, 3L)))
    val e2 = new MsgEngine(v2)
    def senders(q: String): Set[String] =
      e2.aggregate(ViewType.Senders,
        AggregateOptions(searchQuery = q)).collect()
        .map(_.getAs[String]("key")).toSet
    // text search: only alice has "Hello" subjects
    assert(senders("Hello") == Set("alice@example.com"))
    // has:attachment: msg2 (alice) + msg4 (bob)
    assert(senders("has:attachment") ==
      Set("alice@example.com", "bob@company.org"))
    // label:work (case-insensitive): msg1 (alice) + msg4 (bob)
    assert(senders("label:work") ==
      Set("alice@example.com", "bob@company.org"))
    // TestAggregateByLabel_WithLabelSearch: the Labels view under
    // label:work shows ONLY the matching label, not every label carried
    // by the matching messages
    val labelKeys = e2.aggregate(ViewType.Labels,
      AggregateOptions(searchQuery = "label:work")).collect()
      .map(_.getAs[String]("key")).toSet
    assert(labelKeys == Set("Work"))
  }
}
