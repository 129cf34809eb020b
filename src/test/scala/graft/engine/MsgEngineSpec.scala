package graft.engine

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.Row

/** Behavior tests against the fixture star — the analogue of the
  * reference's DuckDBEngine tests (internal/query/duckdb_test.go).
  */
class MsgEngineSpec extends SparkTestBase {
  import Fixtures._

  // participants: 1 alice@a.com (Alice), 2 bob@b.org (no name),
  // 3 phone-only (+447700900123, name Carol), 4 dave@a.com
  private lazy val v = Fixtures.vault(spark,
    messages = Seq(
      msg(1, "Quarterly report", "2024-01-10 10:00:00", size = 1000, hasAtt = true, attCount = 1),
      msg(2, "Re: Quarterly report", "2024-02-11 10:00:00", size = 2000),
      msg(3, "lunch?", "2024-02-12 10:00:00", size = 300),
      msg(4, "old spam", "2023-05-01 10:00:00", size = 50,
        deletedAt = Some("2024-01-01 00:00:00")), // dedup loser: always hidden
      msg(5, "deleted on server", "2024-03-01 10:00:00", size = 70,
        deletedFromSourceAt = Some("2024-04-01 00:00:00")),
      msg(6, "chat msg", "2024-03-02 10:00:00", size = 10,
        senderId = Some(3), msgType = Some("imessage"), convId = 2)),
    recipients = Seq(
      MrRow(1, 1, "from", None), MrRow(1, 2, "to", None),
      MrRow(2, 2, "from", Some("Bob Display")), MrRow(2, 1, "to", None),
      MrRow(3, 1, "from", None), MrRow(3, 4, "to", None), MrRow(3, 2, "cc", None),
      MrRow(4, 1, "from", None),
      MrRow(5, 4, "from", None)),
    participants = Seq(
      PRow(1, Some("alice@a.com"), Some("Alice"), None, Some("a.com")),
      PRow(2, Some("bob@b.org"), None, None, Some("b.org")),
      PRow(3, None, Some("Carol"), Some("+447700900123"), None),
      PRow(4, Some("dave@a.com"), Some("Dave"), None, Some("a.com"))),
    labels = Seq(LblRow(1, "INBOX"), LblRow(2, "Work")),
    messageLabels = Seq(MlRow(1, 1), MlRow(1, 2), MlRow(2, 1), MlRow(3, 1)),
    attachments = Seq(AttRow(1, 1, "report.pdf", "application/pdf", 5000, "h1")),
    conversations = Seq(
      ConvRow(1, "conv-1", None, None),
      ConvRow(2, "conv-2", Some("Family chat"), Some("group"))))

  private lazy val engine = new MsgEngine(v)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq

  test("aggregate senders: counts, sizes, attachment rollup, total_unique") {
    val out = rows(engine.aggregate(ViewType.Senders))
    // live messages: 1,2,3,5,6; msg6 has no from-recipient row
    // alice: msgs 1,3 → count 2, size 1300, att 5000/1
    val byKey = out.map(r => r.getString(0) -> r).toMap
    assert(byKey.keySet == Set("alice@a.com", "bob@b.org", "dave@a.com"))
    val alice = byKey("alice@a.com")
    assert(alice.getLong(1) == 2 && alice.getLong(2) == 1300)
    assert(alice.getLong(3) == 5000 && alice.getLong(4) == 1)
    assert(out.forall(_.getLong(5) == 3)) // total_unique
    // deleted_at loser (msg 4) never appears
    assert(byKey("alice@a.com").getLong(1) == 2)
  }

  test("hideDeletedFromSource removes server-deleted messages") {
    val out = rows(engine.aggregate(ViewType.Senders,
      AggregateOptions(hideDeletedFromSource = true)))
    assert(!out.map(_.getString(0)).contains("dave@a.com"))
  }

  test("aggregate sender names falls back display_name → phone → email") {
    // participantNameExpr uses the participant's OWN name chain (reference
    // getViewDef ViewSenderNames): bob has no display_name → email fallback.
    // The per-message mr.display_name override applies only to message
    // enrichment (recipientNameExpr), not aggregates.
    val keys = rows(engine.aggregate(ViewType.SenderNames)).map(_.getString(0)).toSet
    assert(keys == Set("Alice", "bob@b.org", "Dave"))
  }

  test("aggregate domains groups by from-participant domain") {
    val byKey = rows(engine.aggregate(ViewType.Domains))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("a.com" -> 3, "b.org" -> 1))
  }

  test("aggregate labels") {
    val byKey = rows(engine.aggregate(ViewType.Labels))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("INBOX" -> 3, "Work" -> 1))
  }

  test("aggregate time buckets by month") {
    val byKey = rows(engine.aggregate(ViewType.Time))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("2024-01" -> 1, "2024-02" -> 2, "2024-03" -> 2))
  }

  test("aggregate search matches key columns only where getViewDef declares them") {
    // "work" appears in no subject/snippet/sender — only in the label name;
    // the Labels view declares keyColumns (duckdb.go:760-766), so the Work
    // bucket survives (duckdb_test.go:600-620)
    val lbl = rows(engine.aggregate(ViewType.Labels,
      AggregateOptions(searchQuery = "work")))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lbl == Map("Work" -> 1))
    // the Time view declares NO keyColumns (duckdb.go:767-770): a term
    // equal to the bucket string matches nothing — the r10 impl wrongly
    // matched the bucket here
    val tm = rows(engine.aggregate(ViewType.Time,
      AggregateOptions(searchQuery = "2024-02")))
      .map(_.getString(0)).toSet
    assert(tm == Set.empty[String])
    // ordinary subject search still works post-join
    val senders = rows(engine.aggregate(ViewType.Senders,
      AggregateOptions(searchQuery = "quarterly")))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(senders == Map("alice@a.com" -> 1, "bob@b.org" -> 1))
    // Recipients declares email+display_name (duckdb.go:737-742): a term
    // matching only a RECIPIENT's display name admits the row (the from-
    // participant EXISTS branch alone cannot — it sees senders only)
    val v2 = Fixtures.vault(spark,
      messages = Seq(msg(1, "plain", "2024-01-01 10:00:00")),
      recipients = Seq(MrRow(1, 1, "from", None), MrRow(1, 2, "to", None)),
      participants = Seq(
        PRow(1, Some("s@x.com"), Some("Sender"), None, Some("x.com")),
        PRow(2, Some("r@y.org"), Some("Zelda"), Some("+15550001"), Some("y.org"))))
    val e2 = new MsgEngine(v2)
    def keysOf(view: ViewType, q: String): Set[String] =
      rows(e2.aggregate(view, AggregateOptions(searchQuery = q)))
        .map(_.getString(0)).toSet
    assert(keysOf(ViewType.Recipients, "zelda") == Set("r@y.org"))
    // ...but NOT the recipient's phone (Recipients omits phone_number —
    // only the *Names views carry it, duckdb.go:727-733,744-750)
    assert(keysOf(ViewType.Recipients, "15550001") == Set.empty[String])
    assert(keysOf(ViewType.RecipientNames, "15550001") == Set("Zelda"))
  }

  test("subAggregate: drill into one sender across time") {
    val byKey = rows(engine.subAggregate(ViewType.Time,
      MessageFilter(sender = "alice@a.com")))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey == Map("2024-01" -> 1, "2024-02" -> 1))
  }

  test("subAggregate merges opts-side scalar conditions onto the filter") {
    // reference SubAggregate duckdb.go:1034-1056: hideDeletedFromSource
    // ORs into the filter; after/attachments-only AND on top
    def keys(opts: AggregateOptions) =
      rows(engine.subAggregate(ViewType.Senders, MessageFilter(), opts))
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keys(AggregateOptions()) ==
      Map("alice@a.com" -> 2, "bob@b.org" -> 1, "dave@a.com" -> 1))
    assert(keys(AggregateOptions(hideDeletedFromSource = true)) ==
      Map("alice@a.com" -> 2, "bob@b.org" -> 1),
      "opts.hideDeletedFromSource must hide the source-deleted row")
    assert(keys(AggregateOptions(withAttachmentsOnly = true)) ==
      Map("alice@a.com" -> 1))
    assert(keys(AggregateOptions(
      after = Some(Fixtures.ts("2024-02-01 00:00:00")))) ==
      Map("alice@a.com" -> 1, "bob@b.org" -> 1, "dave@a.com" -> 1))
  }

  test("after/before bounds are second-truncated (reference Format binding)") {
    // every reference engine binds After/Before as
    // Format("2006-01-02 15:04:05") — whole seconds (duckdb.go:563-567,
    // sqlite.go:200-204) — so a sub-second `after` must admit rows from
    // the start of its second, and a sub-second `before` must exclude
    // from the start of its second. Pure helper + compile-path checks.
    import java.sql.Timestamp
    val t = Timestamp.valueOf("2024-02-01 00:00:00")
    val sub = new Timestamp(t.getTime + 500) // 00:00:00.500
    assert(FilterCompiler.secTrunc(sub) == t)
    assert(FilterCompiler.secTrunc(t) == t)
    // fixture row 3 sits exactly at a sent_at that a full-precision
    // bound would exclude but the truncated bound admits
    val exact = rows(engine.filters.compile(
      MessageFilter(after = Some(sub)))).map(_.getAs[Long]("id")).toSet
    val whole = rows(engine.filters.compile(
      MessageFilter(after = Some(t)))).map(_.getAs[Long]("id")).toSet
    assert(exact == whole, "sub-second after must behave as its second")
  }

  test("sender filter matches chat sender via sender_id (dual path)") {
    val out = rows(engine.filters.compile(MessageFilter(sender = "+447700900123")))
    assert(out.map(_.getAs[Long]("id")) == Seq(6))
  }

  test("empty-bucket drilldown: messages with no sender") {
    val out = rows(engine.filters.compile(
      MessageFilter(emptyValueTargets = Set(ViewType.Senders))))
    assert(out.map(_.getAs[Long]("id")).isEmpty) // msg6 has sender_id → not empty
  }

  test("label filter is case-insensitive exact") {
    val out = rows(engine.filters.compile(MessageFilter(label = "inbox")))
    assert(out.map(_.getAs[Long]("id")).sorted == Seq(1L, 2, 3))
  }

  test("time period filter infers granularity from period shape") {
    assert(rows(engine.filters.compile(MessageFilter(
      timeRange = TimeRange("2024")))).length == 5)
    assert(rows(engine.filters.compile(MessageFilter(
      timeRange = TimeRange("2024-02")))).length == 2)
    assert(rows(engine.filters.compile(MessageFilter(
      timeRange = TimeRange("2024-02-12")))).length == 1)
  }

  test("listMessages: page + sender resolution + labels, deterministic order") {
    val out = rows(engine.listMessages(MessageFilter(
      pagination = Pagination(limit = 3))))
    assert(out.map(_.getAs[Long]("id")) == Seq(6, 5, 3)) // sent_at DESC, id DESC
    val m6 = out.head
    assert(m6.getAs[String]("from_email") == "") // phone-only sender
    assert(m6.getAs[String]("from_name") == "Carol")
    assert(m6.getAs[String]("from_phone") == "+447700900123")
    assert(m6.getAs[String]("conversation_title") == "Family chat")
    val m3 = out(2)
    assert(m3.getAs[scala.collection.Seq[String]]("labels").toSeq == Seq("INBOX"))
  }

  test("fused enrichment side-aggregate: null-skip semantics per mixed group") {
    // The from-party columns and the label array aggregate ONE unioned
    // stream (round 10). These mixtures pin the null-skip contract:
    // a labels-only message must not let label rows (null ordering)
    // win the from-party min_by; a from-only message must get [] labels
    // (collect_list null skip), and a message with neither junction row
    // must coalesce cleanly after the left join.
    import Fixtures._
    val vv = vault(spark,
      messages = Seq(
        msg(1, "both", "2024-01-01 10:00:00", senderId = None),
        msg(2, "labels only", "2024-01-02 10:00:00", senderId = None),
        msg(3, "from only", "2024-01-03 10:00:00", senderId = None),
        msg(4, "neither", "2024-01-04 10:00:00", senderId = Some(7))),
      recipients = Seq(
        MrRow(1, 7, "from", None), MrRow(3, 8, "from", None),
        // two from-recipients on one message: min_by picks pid 7
        MrRow(1, 8, "from", None)),
      participants = Seq(
        PRow(7, Some("seven@x.com"), Some("Seven"), None, Some("x.com")),
        PRow(8, Some("eight@x.com"), Some("Eight"), None, Some("x.com"))),
      labels = Seq(LblRow(1, "INBOX"), LblRow(2, "work")),
      messageLabels = Seq(MlRow(1, 2), MlRow(2, 1), MlRow(2, 2)))
    val out = rows(new MsgEngine(vv).listMessages(MessageFilter()))
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("from_email"),
          r.getAs[scala.collection.Seq[String]]("labels").toSeq))).toMap
    assert(out(1L) == (("seven@x.com", Seq("work"))), "both junctions")
    assert(out(2L) == (("", Seq("INBOX", "work"))),
      "label rows must never win the from-party columns")
    assert(out(3L) == (("eight@x.com", Nil)),
      "from rows must never land in the label array")
    assert(out(4L) == (("seven@x.com", Nil)),
      "no junction rows: direct sender_id fallback + empty labels")
  }

  test("searchFast: text term matches subject case-insensitively AND across terms") {
    val out = rows(engine.searchFast("quarterly report"))
    assert(out.map(_.getAs[Long]("id")).sorted == Seq(1L, 2))
  }

  test("searchFast: from: + subject: operators combine") {
    val out = rows(engine.searchFast("from:alice@a.com subject:lunch"))
    assert(out.map(_.getAs[Long]("id")) == Seq(3))
  }

  test("searchFast: domain pattern from:@a.com") {
    val out = rows(engine.searchFast("from:@a.com"))
    assert(out.map(_.getAs[Long]("id")).sorted == Seq(1L, 3, 5))
  }

  test("searchFast is an email surface — chat messages never match") {
    // msg6 subject "chat msg" is imessage; reference SearchFast appends
    // emailOnlyFilterMsg (duckdb.go:2310) — chats go through textSearch
    assert(rows(engine.searchFast("chat")).isEmpty)
    assert(engine.searchFastCount("chat") == 0)
  }

  test("searchFast: text term matches the sender's phone and direct-sender fallback") {
    // reference fast-path terms match COALESCE(ms.from_*, ds.from_*)
    // email/name/phone (duckdb.go:2375-2388)
    val v2 = Fixtures.vault(spark,
      messages = Seq(
        msg(1, "no subject hit", "2024-01-01 10:00:00"),
        // email message with NO from-recipient row, only a direct sender
        msg(2, "also no hit", "2024-01-02 10:00:00", senderId = Some(2))),
      recipients = Seq(MrRow(1, 1, "from", None)),
      participants = Seq(
        PRow(1, None, Some("Carol"), Some("+447700900123"), None),
        PRow(2, Some("dan@d.net"), Some("Dan Direct"), None, Some("d.net"))))
    val e2 = new MsgEngine(v2)
    // phone substring via the from-recipient path
    assert(e2.searchFast("447700").collect().map(_.getAs[Long]("id")).toSeq == Seq(1))
    // display-name, case-insensitive
    assert(e2.searchFast("carol").collect().map(_.getAs[Long]("id")).toSeq == Seq(1))
    // direct-sender (sender_id) fallback when no from-recipient row exists
    assert(e2.searchFast("dan direct").collect().map(_.getAs[Long]("id")).toSeq == Seq(2))
  }

  test("aggregate search text terms match email/name only — no phone, no direct sender") {
    // the reference's aggregate search EXISTS matches only the
    // from-recipient's email_address/display_name (duckdb.go:448-462),
    // unlike the fast path's COALESCE(ms.*, ds.*) email/name/phone
    val v2 = Fixtures.vault(spark,
      messages = Seq(
        msg(1, "no subject hit", "2024-01-01 10:00:00"),
        msg(2, "also no hit", "2024-02-02 10:00:00", senderId = Some(2))),
      recipients = Seq(MrRow(1, 1, "from", None)),
      participants = Seq(
        PRow(1, None, Some("Carol"), Some("+447700900123"), None),
        PRow(2, Some("dan@d.net"), Some("Dan Direct"), None, Some("d.net"))))
    val e2 = new MsgEngine(v2)
    def timeKeys(q: String): Set[String] =
      rows(e2.aggregate(ViewType.Time, AggregateOptions(searchQuery = q)))
        .map(_.getString(0)).toSet
    // display-name still matches (shared email/name predicate)
    assert(timeKeys("carol") == Set("2024-01"))
    // phone substring does NOT match on the aggregate path
    assert(timeKeys("447700") == Set.empty[String])
    // direct-sender (sender_id) fallback absent on the aggregate path
    assert(timeKeys("dan direct") == Set.empty[String])
  }

  test("searchFast: multiple label: terms AND — message must carry all labels") {
    // msg1 has INBOX+Work; msgs 2,3 INBOX only (sqlite.go:1466-1469:
    // "Labels use per-term EXISTS subqueries with AND semantics")
    assert(rows(engine.searchFast("label:inbox label:work"))
      .map(_.getAs[Long]("id")) == Seq(1))
    // single label still matches all carriers
    assert(rows(engine.searchFast("label:inbox"))
      .map(_.getAs[Long]("id")).sorted == Seq(1L, 2L, 3L))
  }

  test("searchFast: label: is a case-insensitive substring match") {
    // both engines wrap the escaped term in %...% (duckdb.go:2436-2444)
    assert(rows(engine.searchFast("label:ork")).map(_.getAs[Long]("id")) == Seq(1))
  }

  test("searchFast: to: spans to/cc/bcc but cc:/bcc: match only their own type") {
    // bob is a `to` recipient on msg1 and a `cc` recipient on msg3
    assert(rows(engine.searchFast("to:bob@b.org"))
      .map(_.getAs[Long]("id")).sorted == Seq(1L, 3L)) // duckdb.go:2413 IN-list
    assert(rows(engine.searchFast("cc:bob@b.org"))
      .map(_.getAs[Long]("id")) == Seq(3)) // sqlite.go:1243-1256 type-exact
    assert(rows(engine.searchFast("bcc:bob@b.org")).isEmpty)
  }

  test("searchFast: has:attachment and larger:") {
    assert(rows(engine.searchFast("has:attachment")).map(_.getAs[Long]("id")) == Seq(1))
    assert(rows(engine.searchFast("larger:1K")).map(_.getAs[Long]("id")).sorted == Seq(2L))
  }

  test("single-quoted operator values unquote like double-quoted ones") {
    // alice is the from of 1, 3, 4 — but 4 is a deleted dedup loser
    assert(rows(engine.searchFast("from:'alice@a.com'"))
      .map(_.getAs[Long]("id")).sorted == Seq(1L, 3))
  }

  test("searchFastWithStats: count/page/stats reuse one materialization") {
    val s = engine.searchFastWithStats("quarterly")
    assert(s.totalCount == 2)
    val p = s.page(1, 0).collect()
    assert(p.map(_.getAs[Long]("id")).toSeq == Seq(2))
    // pages come back enriched — same MessageSummary shape as searchFast
    assert(p.head.getAs[String]("from_email") == "bob@b.org")
    val st = s.stats.collect()(0)
    assert(st.getAs[Long]("message_count") == 2)
    assert(st.getAs[Long]("total_size") == 3000)
    // computeSearchStats parity (duckdb.go:2144-2190): account count and
    // distinct label names over the match set (msgs 1,2 → INBOX + Work)
    assert(st.getAs[Long]("distinct_sources") == 1)
    assert(st.getAs[Long]("label_count") == 2)
    // keyset page over the same match set: cursor after page 1 yields the
    // same row offset paging would
    val first = p.head
    val p2 = s.pageAfter(Some((first.getAs[java.sql.Timestamp]("sent_at"),
      first.getAs[Long]("id"))), limit = 1).collect()
    assert(p2.map(_.getAs[Long]("id")).toSeq ==
      s.page(1, 1).collect().map(_.getAs[Long]("id")).toSeq)
    engine.invalidateSearchCache()
  }

  test("totalStats counts the email surface only") {
    // live messages 1,2,3,5 — chat msg 6 belongs to textStats
    // (reference GetTotalStats duckdb.go:1109 emailOnlyFilterMsg)
    val st = engine.totalStats().collect()(0)
    assert(st.getAs[Long]("message_count") == 4)
    assert(st.getAs[Long]("attachment_count") == 1)
    assert(st.getAs[Long]("distinct_sources") == 1)
    // distinct label NAMES among matching messages (duckdb.go:1164-1177):
    // INBOX (msgs 1,2,3) + Work (msg 1)
    assert(st.getAs[Long]("label_count") == 2)
  }

  test("totalStats with StatsOptions: search scopes totals; groupBy swaps term semantics") {
    // search "quarterly" hits msgs 1,2 subjects → stats reflect only those
    val st = engine.totalStats(StatsOptions(searchQuery = "quarterly")).collect()(0)
    assert(st.getAs[Long]("message_count") == 2)
    assert(st.getAs[Long]("label_count") == 2) // INBOX + Work (msg 1)
    // Labels view: the term matches label NAMES instead (duckdb.go:612-619)
    // — "work" appears in no subject/sender but is a label of msg 1
    val lv = engine.totalStats(StatsOptions(searchQuery = "work",
      groupBy = Some(ViewType.Labels))).collect()(0)
    assert(lv.getAs[Long]("message_count") == 1)
    // same term under the default branch matches nothing
    val dv = engine.totalStats(StatsOptions(searchQuery = "work")).collect()(0)
    assert(dv.getAs[Long]("message_count") == 0)
    assert(dv.getAs[Long]("label_count") == 0)
    // Recipients view: terms match to/cc/bcc participant email/name
    // (duckdb.go:604-611) — bob is a recipient of msgs 1 and 3
    val rv = engine.totalStats(StatsOptions(searchQuery = "bob",
      groupBy = Some(ViewType.Recipients))).collect()(0)
    assert(rv.getAs[Long]("message_count") == 2)
  }

  test("conversationStats: texts mode only, deterministic last snippet") {
    val out = rows(engine.conversationStats())
    assert(out.length == 1)
    assert(out.head.getAs[Long]("conversation_id") == 2)
    assert(out.head.getAs[String]("title") == "Family chat")
  }

  test("messageSummariesByIds drops hidden ids silently (both delete kinds)") {
    // reference sqlite.go:715-748: LiveMessagesWhere("m", true) — a
    // dedup loser (4) AND a source-deleted row (5) must be absent, in
    // the requested order for the rest ("treat absent rows as deleted,
    // skip" — engine.go:34-42)
    val out = engine.messageSummariesByIds(Seq(4L, 3L, 5L, 1L)).collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(3L, 1L))
  }

  test("messageSummariesByIds preserves the requested ranking") {
    val out = engine.messageSummariesByIds(Seq(3L, 1L, 6L)).collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(3L, 1L, 6L))
    assert(out(1).getAs[String]("from_email") == "alice@a.com")
    // summary shape parity (models.go:26,37): the Gmail thread id rides
    // the conversation join; the source-deletion stamp passes through
    assert(out(1).getAs[String]("source_conversation_id") == "conv-1")
    assert(out(1).getAs[java.sql.Timestamp]("deleted_from_source_at") == null)
    assert(engine.messageSummariesByIds(Nil).collect().isEmpty)
  }

  test("messageSummariesByIds: a duplicated id yields one row PER occurrence") {
    // the reference reassembly loop (sqlite.go:793-799) walks the
    // ORIGINAL ids and appends per occurrence — two slots for a repeated
    // id — while the page/enrich side must hydrate it only once (no
    // quadratic fan-out through the double rank join: 2 rows, not 4)
    val out = engine.messageSummariesByIds(Seq(3L, 3L, 1L)).collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(3L, 3L, 1L))
    // label hydration is LAST-WINS on a duplicated id (fidelity audit
    // r13, shared.go:62-68: idToIndex[msg.ID] = i over the occurrence
    // list, so labels append only to the final slot): msg 3 carries
    // INBOX, which must surface on the rank-1 slot ONLY
    assert(out.map(_.getAs[scala.collection.Seq[String]]("labels").toSeq)
      .toSeq == Seq(Seq(), Seq("INBOX"), Seq("INBOX", "Work")))
  }

  test("findSimilarMessages: live-at-search-time candidates, un-filtered seed, clamped page") {
    // the composed MCP surface (mcp/handlers.go:398-485 over the
    // sqlitevec backend). 2-d embeddings make every ranking hand-checkable
    // against cosine; ids 4 (dedup loser) and 5 (source-deleted) get the
    // BEST scores so a visibility miss would be loud.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val vectors = Seq(
      (1L, Seq(1f, 0f)), // live; the seed for most legs
      (2L, Seq(0.9f, 0.1f)), // live, cos≈0.994
      (3L, Seq(0.5f, 0.5f)), // live, cos≈0.707
      (4L, Seq(1f, 0f)), // dedup-deleted, cos=1: MUST be dropped at search
      (5L, Seq(0.99f, 0.01f)), // source-deleted, cos≈1: dropped too
      (6L, Seq(0f, 1f)) // live chat, cos=0
    ).toDF("message_id", "embedding")
      .select(col("message_id"), col("embedding").cast("array<float>"))

    // deleted ids outrank everything yet never occupy page slots —
    // liveness applies at SEARCH time (sqlitevec/backend.go:655-710:
    // over-fetch + drop until k LIVE hits), so the page stays full
    val page = engine.findSimilarMessages(vectors, seedId = 1L, limit = 2)
      .collect()
    assert(page.map(_.getAs[Long]("id")).toSeq == Seq(2L, 3L))

    // a soft-deleted SEED still queries: its embedding outlives the
    // message (sqlitevec/backend.go:300-305) — and cannot surface itself
    val fromDeleted = engine.findSimilarMessages(vectors, seedId = 4L,
      limit = 3).collect()
    assert(fromDeleted.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))

    // the structured filter constrains CANDIDATES only (vector.Filter,
    // backend.go:69-81 applied in resolveFilter); a seed that itself
    // fails the bound still seeds the query
    val bounded = engine.findSimilarMessages(vectors, seedId = 2L,
      limit = 5, structured = Some(col("sent_at") < Fixtures.ts("2024-02-01 00:00:00")))
      .collect()
    assert(bounded.map(_.getAs[Long]("id")).toSeq == Seq(1L))

    // maxPage clamps after the limit cap (MaxPageSizeHybridClamp,
    // handlers.go:411-413); negative limit → 0 → empty page (limitArg
    // handlers.go:822-834); a vectorless seed → empty page, not a crash
    assert(engine.findSimilarMessages(vectors, seedId = 1L, limit = 5,
      maxPage = 1).collect().map(_.getAs[Long]("id")).toSeq == Seq(2L))
    assert(engine.findSimilarMessages(vectors, seedId = 1L, limit = -3)
      .collect().isEmpty)
    assert(engine.findSimilarMessages(vectors, seedId = 99L, limit = 5)
      .collect().isEmpty)

    // the pure limit contract, every branch (similarMessagesLimit)
    assert(MsgEngine.similarMessagesLimit(-1, 0) == 0)
    assert(MsgEngine.similarMessagesLimit(0, 0) == 0)
    assert(MsgEngine.similarMessagesLimit(20, 0) == 20)
    assert(MsgEngine.similarMessagesLimit(5000, 0) == 1000)
    assert(MsgEngine.similarMessagesLimit(15, 12) == 12)
    assert(MsgEngine.similarMessagesLimit(15, 0) == 15)
    assert(MsgEngine.similarMessagesLimit(5000, 2000) == 1000)
  }

  test("empty-Senders bucket includes a message whose sender has NO address attributes") {
    // participant 9 exists but has neither email nor phone: message 1 is
    // in NO sender bucket (both dual paths key on email/phone), so the
    // empty-bucket drilldown must include it — bucket counts plus the
    // empty bucket must sum to the total
    val v2 = Fixtures.vault(spark,
      messages = Seq(
        msg(1, "attributeless sender", "2024-01-10 10:00:00", senderId = Some(9)),
        msg(2, "normal", "2024-01-11 10:00:00")),
      recipients = Seq(MrRow(2, 1, "from", None)),
      participants = Seq(
        PRow(1, Some("alice@a.com"), Some("Alice"), None, Some("a.com")),
        PRow(9, None, Some("Ghost"), None, None)))
    val eng2 = new MsgEngine(v2)
    val out = eng2.filters.compile(
      MessageFilter(emptyValueTargets = Set(ViewType.Senders)))
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(out == Seq(1L))
  }

  test("typed surface: Dataset[AggregateRow]/[MessageSummary]/TotalStats") {
    val agg = engine.aggregateTyped(ViewType.Senders).collect()
    assert(agg.map(_.key).toSet == Set("alice@a.com", "bob@b.org", "dave@a.com"))
    assert(agg.find(_.key == "alice@a.com").get.count == 2)
    val page = engine.listMessagesTyped(
      MessageFilter(pagination = Pagination(limit = 2))).collect()
    assert(page.map(_.id).toSeq == Seq(6L, 5L))
    assert(page.head.from_name == "Carol")
    val st = engine.totalStatsTyped()
    assert(st.message_count == 4 && st.attachment_count == 1)
    assert(st.label_count == 2)
  }

  test("raw SQL surface: v_messages + v_senders registered") {
    v.registerViews()
    val vm = spark.sql(
      "SELECT from_email, labels FROM v_messages WHERE id = 1").collect()(0)
    assert(vm.getString(0) == "alice@a.com")
    assert(vm.getString(1) == """["INBOX","Work"]""")
    val vs = spark.sql(
      "SELECT message_count FROM v_senders WHERE from_email = 'alice@a.com'")
      .collect()(0)
    assert(vs.getLong(0) >= 2)
  }

  test("messageDetailBySourceId resolves the live message; misses are empty") {
    val hit = rows(engine.messageDetailBySourceId("src-2"))
    assert(hit.length == 1 && hit.head.getAs[String]("subject") == "Re: Quarterly report")
    // deleted_at loser (msg 4, src-4) is invisible to the lookup — the
    // DOCUMENTED divergence from shared.go:255-297 (reference point
    // lookups see everything; the store contract hides dedup losers) —
    // see the messageDetailBySourceId scaladoc
    assert(rows(engine.messageDetailBySourceId("src-4")).isEmpty)
    assert(rows(engine.messageDetailBySourceId("no-such-id")).isEmpty)
  }

  test("attachmentInfo point lookup returns the metadata row") {
    val a = rows(engine.attachmentInfo(1))
    assert(a.length == 1)
    assert(a.head.getAs[String]("filename") == "report.pdf")
    assert(a.head.getAs[Long]("size") == 5000L)
    assert(rows(engine.attachmentInfo(99)).isEmpty)
  }

  test("messageRaw inflates the sidecar blob; absent id is None") {
    import spark.implicits._
    val payload = "Message-ID: <m1@x>\r\n\r\nhello body".getBytes("UTF-8")
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val raw = Seq((1L, deflated), (4L, deflated), (5L, deflated))
      .toDF("message_id", "raw_data")
    assert(engine.messageRaw(raw, 1L).map(new String(_, "UTF-8"))
      .contains("Message-ID: <m1@x>\r\n\r\nhello body"))
    assert(engine.messageRaw(raw, 2L).isEmpty)
    // raw reads hide BOTH deletion kinds unconditionally (shared.go:217-254):
    // msg 4 is a dedup loser, msg 5 is source-deleted — data exists, reads None
    assert(engine.messageRaw(raw, 4L).isEmpty)
    assert(engine.messageRaw(raw, 5L).isEmpty)
  }

  test("messageDetail with bodies: body columns, html passthrough, raw-MIME fallback") {
    import spark.implicits._
    // msg1 has a stored body; msg2 has an EMPTY body row and a raw blob —
    // the reference falls back to raw-MIME extraction when body_text AND
    // body_html are both empty (shared.go:326-330)
    val bodies = Seq(
      (1L, "stored body", "<p>stored body</p>"),
      (2L, "", "")).toDF("message_id", "body_text", "body_html")
    val payload = "Subject: x\r\n\r\nextracted from raw".getBytes("UTF-8")
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val raw = Seq((2L, deflated)).toDF("message_id", "raw_data")
    val d1 = engine.messageDetail(1L, bodies, Some(raw)).collect()(0)
    assert(d1.getAs[String]("body_text") == "stored body")
    assert(d1.getAs[String]("body_html") == "<p>stored body</p>")
    val d2 = engine.messageDetail(2L, bodies, Some(raw)).collect()(0)
    assert(d2.getAs[String]("body_text") == "extracted from raw")
    assert(d2.getAs[String]("body_html") == "")
    // no body row and no raw → empty strings (reference zero values)
    val d3 = engine.messageDetail(3L, bodies, None).collect()(0)
    assert(d3.getAs[String]("body_text") == "")
    assert(d3.getAs[String]("body_html") == "")
  }

  test("messageDetail null shaping: attachment coalesces + source_conversation_id (shared.go:163-166, 257-268)") {
    import spark.implicits._
    // an attachment row with every nullable field NULL must surface as
    // ''/0 inside the attachments array, exactly like fetchAttachments-
    // Shared's per-column COALESCE — and the detail row carries the
    // conversation's source_conversation_id ('' when unlinked)
    val att = Seq((10L, Option.empty[String], Option.empty[String],
      Option.empty[Long], Option.empty[String]))
      .toDF("id", "filename", "mime_type", "size", "content_hash")
      .withColumn("message_id", org.apache.spark.sql.functions.lit(1L))
    val vv = MsgVault.fromFrames(spark,
      Seq(msg(1, "m", "2024-01-01 10:00:00", convId = 1)).toDF(),
      Seq(MrRow(1, 1, "from", None)).toDF(),
      Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))).toDF(),
      Seq.empty[LblRow].toDF("id", "name"),
      Seq.empty[MlRow].toDF(),
      att,
      Seq(ConvRow(1, "ext-chat-7", None, None)).toDF(),
      Seq(SrcRow(1, "acct@example.com", Some("gmail"))).toDF())
    val d = new MsgEngine(vv).messageDetail(1L).collect()(0)
    assert(d.getAs[String]("source_conversation_id") == "ext-chat-7")
    val a = d.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("attachments").head
    assert(a.getAs[String]("filename") == "")
    assert(a.getAs[String]("mime_type") == "")
    assert(a.getAs[Long]("size") == 0L)
    assert(a.getAs[String]("content_hash") == "")
    // a message in NO conversation row still details, with '' source id
    val vv2 = MsgVault.fromFrames(spark,
      Seq(msg(1, "m", "2024-01-01 10:00:00", convId = 99)).toDF(),
      Seq(MrRow(1, 1, "from", None)).toDF(),
      Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))).toDF(),
      Seq.empty[LblRow].toDF("id", "name"), Seq.empty[MlRow].toDF(),
      Seq.empty[AttRow].toDF(),
      Seq(ConvRow(1, "ext-chat-7", None, None)).toDF(),
      Seq(SrcRow(1, "acct@example.com", Some("gmail"))).toDF())
    val d2 = new MsgEngine(vv2).messageDetail(1L).collect()(0)
    assert(d2.getAs[String]("source_conversation_id") == "")
  }

  test("messageDetail list-shape contract: absent side lists are NULL, not []") {
    import spark.implicits._
    // a message with labels but NO recipients/attachments: the fused
    // side aggregate produces a row for it (the label stream), so the
    // party/attachment lists must still come back NULL — the pre-fusion
    // pivot yielded NULL for a list with no rows, and callers'
    // coalesce-to-[] sits on that contract
    val vv = MsgVault.fromFrames(spark,
      Seq(msg(1, "labels only", "2024-01-01 10:00:00")).toDF(),
      Seq.empty[MrRow].toDF(),
      Seq.empty[PRow].toDF(),
      Seq((1L, "INBOX")).toDF("id", "name"),
      Seq(MlRow(1, 1)).toDF(),
      Seq.empty[AttRow].toDF(),
      Seq.empty[ConvRow].toDF(),
      Seq(SrcRow(1, "a@x.com", Some("gmail"))).toDF())
    val d = new MsgEngine(vv).messageDetail(1L).collect()(0)
    assert(d.getAs[scala.collection.Seq[String]]("labels").toSeq == Seq("INBOX"))
    Seq("from", "to", "cc", "bcc", "attachments").foreach { c =>
      assert(d.isNullAt(d.fieldIndex(c)), s"$c must be NULL when absent")
    }
    // …but a message with ≥1 recipient row of ANY type reads [] (not
    // NULL) for the other recipient types — the pivot's cell shape
    // (shared fixture msg 5: one from row, no labels, no attachments)
    val d2 = engine.messageDetail(5L).collect()(0)
    assert(!d2.isNullAt(d2.fieldIndex("from")))
    Seq("to", "cc", "bcc").foreach { c =>
      assert(!d2.isNullAt(d2.fieldIndex(c)), s"$c must be [] with a from row")
      assert(d2.getAs[scala.collection.Seq[_]](c).isEmpty)
    }
    // attachments/labels subtrees aggregate their own rows: msg 5 has
    // neither → NULL, never []
    assert(d2.isNullAt(d2.fieldIndex("attachments")))
    assert(d2.isNullAt(d2.fieldIndex("labels")))
  }

  test("listAccounts: '' display-name fallback, identifier order (sqlite.go:853-858)") {
    val accts = rows(engine.listAccounts())
    assert(accts.length == 1)
    assert(accts.head.getAs[String]("identifier") == "acct@example.com")
    // the reference coalesces a NULL display_name to '' — NOT to the
    // identifier (that fallback is the participant-name chain's rule)
    assert(accts.head.getAs[String]("display_name") == "")
    assert(accts.head.getAs[String]("source_type") == "gmail")
    // ordered by identifier, not id
    val vv = Fixtures.vault(spark,
      messages = Seq(msg(1, "m", "2024-01-01 10:00:00")),
      recipients = Seq(MrRow(1, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))),
      sources = Seq(SrcRow(1, "zz@x.com", Some("gmail")),
        SrcRow(2, "aa@x.com", Some("imap"))))
    assert(new MsgEngine(vv).listAccounts().collect()
      .map(_.getAs[String]("identifier")).toSeq == Seq("aa@x.com", "zz@x.com"))
  }

  test("searchFastCount is the unpaged total for a paged search") {
    val total = engine.searchFastCount("quarterly")
    assert(total == 2) // msgs 1 and 2; paging does not affect it
    val paged = rows(engine.searchFast("quarterly",
      MessageFilter(pagination = Pagination(limit = 1))))
    assert(paged.length == 1 && total > paged.length)
  }

  test("searchByDomains: Search/SearchFast visibility, any case, paging clamp (sqlite.go:1149-1194)") {
    // a.com touches msgs 1 (from alice), 2 (to alice), 3 (from alice, to
    // dave), 4 (deleted — hidden), 5 (src-deleted — hidden too: the
    // reference comments this MCP-facing surface must match Search/
    // SearchFast visibility, i.e. LiveMessagesWhere("m", true))
    val out = rows(engine.searchByDomains(Seq("A.COM"))) // case-insensitive
    assert(out.map(_.getAs[Long]("id")) == Seq(3L, 2L, 1L)) // sent_at DESC
    assert(out.head.getAs[String]("from_email") == "alice@a.com") // enriched
    // honored limit + offset (executeSearchQuery contract)
    assert(rows(engine.searchByDomains(Seq("a.com"), limit = 2))
      .map(_.getAs[Long]("id")) == Seq(3L, 2L))
    assert(rows(engine.searchByDomains(Seq("a.com"), limit = 2, offset = 2))
      .map(_.getAs[Long]("id")) == Seq(1L))
    // >1000 clamps to 1000 (sqlite.go:1184-1189). Pinned on the pure
    // helper: the page materializes before enrichment, so the clamp is
    // not recoverable from the final plan. limit<=0 passes through —
    // pageThenEnrich's defaultLimit=100 is the single owner of the
    // reference default (exercised by the no-limit call above).
    assert(MsgEngine.domainSearchLimit(5000) == 1000)
    assert(MsgEngine.domainSearchLimit(1000) == 1000)
    assert(MsgEngine.domainSearchLimit(0) == 0)
    assert(MsgEngine.domainSearchLimit(-1) == -1)
    assert(MsgEngine.domainSearchLimit(7) == 7)
  }

  test("search cache: page hits reuse the match set; a new search misses") {
    // reference duckdb_test.go:3258-3345 — paging the same search must
    // not re-materialize; a different query must not serve stale matches
    val a1 = engine.searchFastWithStats("quarterly")
    val a2 = engine.searchFastWithStats("quarterly") // page 2 of same search
    assert(a1.matches eq a2.matches) // cache hit: same persisted plan
    val b = engine.searchFastWithStats("lunch")
    assert(!(b.matches eq a1.matches)) // new search: own materialization
    assert(b.totalCount == 1 && a1.totalCount == 2)
  }

  test("relative-date searches use ONE volatile slot, never thrashing the LRU") {
    // newer_than: resolves now() at parse time — each call's key is
    // unique, so routing through the LRU would persist a dead frame per
    // poll and evict hot entries; the volatile slot replaces its
    // predecessor (unpersisted) and leaves the LRU untouched
    import org.apache.spark.storage.StorageLevel
    val hot = engine.searchFastWithStats("quarterly") // LRU entry
    val r1 = engine.searchFastWithStats("newer_than:100000d")
    // boundary far in the past: all live EMAIL msgs (1,2,3,5 — the chat
    // msg 6 is outside the email search surface)
    assert(r1.totalCount == 4)
    val r2 = engine.searchFastWithStats("newer_than:99999d")
    assert(r1.matches.storageLevel == StorageLevel.NONE,
      "the superseded volatile frame must be unpersisted on replacement")
    assert(r2.matches.storageLevel != StorageLevel.NONE)
    // the hot LRU entry survived the relative-date traffic
    assert(engine.searchFastWithStats("quarterly").matches eq hot.matches)
    engine.invalidateSearchCache()
    assert(r2.matches.storageLevel == StorageLevel.NONE,
      "invalidate must release the volatile slot too")
  }

  test("search cache keys are unambiguous when values contain the separator") {
    // reference duckdb_test.go:3174-3255 searchCacheKeyFor: content must
    // not be able to shift the query/filter boundary. Keys are minted
    // from the PARSED query (relative dates resolve at parse time — a
    // raw-string key would serve stale newer_than results), so the spec
    // parses too.
    import graft.search.SearchParser.{parse => P}
    val f = MessageFilter()
    val keys = Seq(
      engine.searchCacheKeyFor(P("a"), f),
      engine.searchCacheKeyFor(P("a|"), f),
      engine.searchCacheKeyFor(P("a|MessageFilter("), f),
      engine.searchCacheKeyFor(P("b"), f),
      engine.searchCacheKeyFor(P("a"), f.copy(sender = "a|")),
      // the case-class-toString trap: these two render identically via
      // toString's bare comma-join, and MUST still key differently
      engine.searchCacheKeyFor(P("a"), f.copy(sender = "x,")),
      engine.searchCacheKeyFor(P("a"), f.copy(sender = "x", senderName = ",")))
    assert(keys.distinct.length == keys.length)
    // identical inputs produce the same key
    assert(engine.searchCacheKeyFor(P("a"), f)
      == engine.searchCacheKeyFor(P("a"), f))
    // relative dates key on the RESOLVED boundary: the same raw string
    // parsed a day apart must NOT share a cache entry
    val d1 = java.time.LocalDateTime.of(2026, 1, 1, 12, 0)
    assert(engine.searchCacheKeyFor(
        graft.search.SearchParser.parse("newer_than:7d", d1), f)
      != engine.searchCacheKeyFor(
        graft.search.SearchParser.parse("newer_than:7d", d1.plusDays(2)), f))
    // == filters with Set fields key identically regardless of build order
    assert(engine.searchCacheKeyFor(P("a"),
      f.copy(emptyValueTargets = Set(ViewType.Senders, ViewType.Labels)))
      == engine.searchCacheKeyFor(P("a"),
        f.copy(emptyValueTargets = Set(ViewType.Labels, ViewType.Senders))))
    // timestamps encode by exact epoch (toString is local-tz rendered and
    // non-injective across a DST fall-back) — distinct instants MUST key
    // distinctly, equal instants identically
    val t1 = new java.sql.Timestamp(1762061400000L) // 2025-11-02 05:30 UTC
    val t2 = new java.sql.Timestamp(1762065000000L) // 2025-11-02 06:30 UTC
    assert(engine.searchCacheKeyFor(P("a"), f.copy(after = Some(t1)))
      != engine.searchCacheKeyFor(P("a"), f.copy(after = Some(t2))))
    assert(engine.searchCacheKeyFor(P("a"), f.copy(after = Some(t1)))
      == engine.searchCacheKeyFor(P("a"),
        f.copy(after = Some(new java.sql.Timestamp(t1.getTime)))))
    // == Seqs key identically whatever their implementation, and sorting
    // normalizes away (the cached artifact is the unordered match set)
    assert(engine.searchCacheKeyFor(P("a"), f.copy(sourceIds = Some(List(1L, 2L))))
      == engine.searchCacheKeyFor(P("a"), f.copy(sourceIds = Some(Vector(1L, 2L)))))
    assert(engine.searchCacheKeyFor(P("a"), f.copy(sorting = MessageSorting(
      MessageSortField.Subject, SortDirection.Asc)))
      == engine.searchCacheKeyFor(P("a"), f))
    // tri-state stays distinct: None ≠ Some(Nil) ≠ Some(ids)
    assert(Seq(
      engine.searchCacheKeyFor(P("a"), f),
      engine.searchCacheKeyFor(P("a"), f.copy(sourceIds = Some(Nil))),
      engine.searchCacheKeyFor(P("a"), f.copy(sourceIds = Some(Seq(1L)))))
      .distinct.length == 3)
  }

  test("aggregate with multi-recipient search never double-counts a message") {
    // reference sqlite_aggregate_test.go:696-716: to: terms OR within the
    // dimension, and a message matching several terms counts ONCE (the
    // semi-join filter shape can't inflate the fact side the way the
    // reference's old JOIN-based filters did). msg3 (from alice) carries
    // to:dave AND cc:bob — both terms hit it; msg1 carries to:bob.
    val out = rows(engine.aggregate(ViewType.Senders,
      AggregateOptions(searchQuery = "to:dave@a.com to:bob@b.org")))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("alice@a.com" -> 2L)) // msgs 1 and 3, not 3
  }

  test("empty-string recipient display_name falls back to participant name") {
    // reference duckdb_test.go:852-877: import-imessage writes "" (not
    // NULL) into mr.display_name; enrichment must not let it mask the
    // participant's vCard-backfilled name.
    val v2 = Fixtures.vault(spark,
      messages = Seq(msg(1, "SMS", "2024-01-15 10:00:00")),
      recipients = Seq(MrRow(1, 1, "from", Some(""))),
      participants = Seq(
        PRow(1, None, Some("Alice Backfilled"), Some("+15551234567"), None)))
    val out = new MsgEngine(v2).listMessages(MessageFilter()).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("from_name") == "Alice Backfilled")
  }
}
