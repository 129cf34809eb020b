package graft.engine

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.functions._

/** Texts-mode surface (reference duckdb_text.go): conversation list,
  * chat timeline, text search, text stats, and the TextFilter compiler's
  * contact/source-type scoping.
  */
class TextModeSpec extends SparkTestBase {
  import Fixtures._
  import spark.implicits._

  // two chats + one email thread; chat senders via sender_id (dual path:
  // msg 23 has NO sender_id — contact resolves via the from-recipient)
  private lazy val v = Fixtures.vault(spark,
    messages = Seq(
      msg(11, "", "2024-01-01 10:00:00", convId = 1, senderId = Some(1),
        msgType = Some("imessage"), snippet = "hey there", sourceId = 1),
      msg(12, "", "2024-01-02 10:00:00", convId = 1, senderId = Some(2),
        msgType = Some("imessage"), snippet = "hello back", sourceId = 1),
      msg(13, "", "2024-01-03 10:00:00", convId = 1, senderId = Some(1),
        msgType = Some("imessage"), snippet = "latest in chat 1", sourceId = 1),
      msg(21, "", "2024-02-01 10:00:00", convId = 2, senderId = Some(2),
        msgType = Some("whatsapp"), snippet = "wa first", sourceId = 2),
      msg(23, "", "2024-02-05 10:00:00", convId = 2, senderId = None,
        msgType = Some("whatsapp"), snippet = "wa latest", sourceId = 2),
      msg(31, "an email", "2024-03-01 10:00:00", convId = 3,
        msgType = Some("email"), snippet = "email snippet", sourceId = 1)),
    recipients = Seq(
      MrRow(11, 1, "from", None), MrRow(12, 2, "from", None),
      MrRow(13, 1, "from", None), MrRow(21, 2, "from", None),
      MrRow(23, 1, "from", None), // msg 23's contact via fallback
      MrRow(31, 1, "from", None)),
    participants = Seq(
      PRow(1, Some("a@x.com"), Some("Alice"), Some("+15550001"), Some("x.com")),
      PRow(2, Some("b@y.org"), Some("Bob"), None, Some("y.org"))),
    conversations = Seq(
      ConvRow(1, "conv-1", Some("Chat One"), Some("direct")),
      ConvRow(2, "conv-2", None, Some("group")),
      ConvRow(3, "conv-3", None, None)),
    sources = Seq(
      SrcRow(1, "acct@x.com", Some("imessage")),
      SrcRow(2, "wa@x.com", Some("whatsapp"))))

  private lazy val engine = new MsgEngine(v)

  test("listConversations: rollup, deterministic preview, title/source enrichment") {
    val out = engine.listConversations().collect()
    // email conversation 3 excluded by the chat-type filter
    assert(out.map(_.getAs[Long]("conversation_id")).toSeq == Seq(2L, 1L)) // last_message desc
    val c1 = out.find(_.getAs[Long]("conversation_id") == 1L).get
    assert(c1.getAs[String]("title") == "Chat One")
    assert(c1.getAs[Long]("message_count") == 3)
    assert(c1.getAs[Long]("participant_count") == 2)
    assert(c1.getAs[String]("last_preview") == "latest in chat 1")
    assert(c1.getAs[String]("source_type") == "imessage")
    // count sort flips the order (3 msgs vs 2)
    val byCount = engine.listConversations(TextFilter(
      sortField = TextSortField.Count)).collect()
    assert(byCount.map(_.getAs[Long]("conversation_id")).toSeq == Seq(1L, 2L))
  }

  test("TextFilter contact scoping resolves the dual-path sender") {
    // Alice by phone: direct sender of 11,13 AND fallback contact of 23
    val byPhone = engine.listConversations(TextFilter(contactPhone = "+15550001"))
      .collect().map(r => r.getAs[Long]("conversation_id") ->
        r.getAs[Long]("message_count")).toMap
    assert(byPhone == Map(1L -> 2L, 2L -> 1L))
    // Bob by name
    val byName = engine.listConversations(TextFilter(contactName = "Bob"))
      .collect().map(r => r.getAs[Long]("conversation_id") ->
        r.getAs[Long]("message_count")).toMap
    assert(byName == Map(1L -> 1L, 2L -> 1L))
    // source_type scoping
    val wa = engine.listConversations(TextFilter(sourceType = "whatsapp"))
      .collect().map(_.getAs[Long]("conversation_id")).toSeq
    assert(wa == Seq(2L))
  }

  test("NULL sent_at sorts LAST on both directions (DuckDB default_null_order)") {
    // fidelity audit r13: the reference's bare ORDER BY last_message_at
    // (duckdb_text.go:108-122) runs under DuckDB's NULLS_LAST default on
    // BOTH directions, where Spark's bare asc is nulls-FIRST. A chat
    // conversation whose every message has NULL sent_at must list last
    // under Asc+LastMessage (and under the default Desc), not first.
    val v2 = Fixtures.vault(spark,
      messages = Seq(
        msg(41, "", "2024-01-01 10:00:00", convId = 1, senderId = Some(1),
          msgType = Some("imessage"), snippet = "dated"),
        msg(42, "", "2024-01-02 10:00:00", convId = 2, senderId = Some(1),
          msgType = Some("imessage"), snippet = "dated too")
          .copy(sent_at = null),
        msg(43, "", "2024-01-03 10:00:00", convId = 1, senderId = Some(1),
          msgType = Some("imessage"), snippet = "later")),
      recipients = Seq(MrRow(41, 1, "from", None), MrRow(42, 1, "from", None),
        MrRow(43, 1, "from", None)),
      participants = Seq(
        PRow(1, Some("a@x.com"), Some("Alice"), None, Some("x.com"))),
      conversations = Seq(
        ConvRow(1, "conv-1", Some("Dated"), Some("direct")),
        ConvRow(2, "conv-2", Some("Undated"), Some("direct"))))
    val e2 = new MsgEngine(v2)
    val asc = e2.listConversations(TextFilter(
      sortDirection = SortDirection.Asc)).collect()
    assert(asc.map(_.getAs[Long]("conversation_id")).toSeq == Seq(1L, 2L))
    val desc = e2.listConversations().collect()
    assert(desc.map(_.getAs[Long]("conversation_id")).toSeq == Seq(1L, 2L))
    // same rule on the timeline sort (duckdb_text.go:315-320): the
    // undated message of a mixed conversation rides last under ASC
    val v3 = Fixtures.vault(spark,
      messages = Seq(
        msg(51, "", "2024-01-05 10:00:00", convId = 1, senderId = Some(1),
          msgType = Some("imessage"), snippet = "dated"),
        msg(52, "", "2024-01-01 10:00:00", convId = 1, senderId = Some(1),
          msgType = Some("imessage"), snippet = "undated")
          .copy(sent_at = null)),
      recipients = Seq(MrRow(51, 1, "from", None), MrRow(52, 1, "from", None)),
      participants = Seq(
        PRow(1, Some("a@x.com"), Some("Alice"), None, Some("x.com"))),
      conversations = Seq(ConvRow(1, "conv-1", Some("Mixed"), Some("direct"))))
    val tl = new MsgEngine(v3).listConversationMessages(1L,
      TextFilter(sortDirection = SortDirection.Asc)).collect()
    assert(tl.map(_.getAs[Long]("id")).toSeq == Seq(51L, 52L))
  }

  test("listConversationMessages: ascending timeline, paged, enriched") {
    val timeline = engine.listConversationMessages(1L,
      TextFilter(sortDirection = SortDirection.Asc)).collect()
    assert(timeline.map(_.getAs[Long]("id")).toSeq == Seq(11L, 12L, 13L))
    assert(timeline.head.getAs[String]("from_email") == "a@x.com")
    assert(timeline.head.getAs[String]("conversation_title") == "Chat One")
    val page2 = engine.listConversationMessages(1L, TextFilter(
      sortDirection = SortDirection.Asc,
      pagination = Pagination(limit = 2, offset = 2))).collect()
    assert(page2.map(_.getAs[Long]("id")).toSeq == Seq(13L))
  }

  test("listConversationMessages with bodies joins full body text page-scoped") {
    // timelines carry the full body (reference duckdb_text.go:298-306,
    // MessageSummary.BodyText models.go:40); missing body rows → ""
    val bodies = Seq((11L, "full body eleven"), (13L, "full body thirteen"))
      .toDF("message_id", "body_text")
    val timeline = engine.listConversationMessages(1L,
      TextFilter(sortDirection = SortDirection.Asc), bodies).collect()
    assert(timeline.map(_.getAs[Long]("id")).toSeq == Seq(11L, 12L, 13L))
    assert(timeline.map(_.getAs[String]("body_text")).toSeq ==
      Seq("full body eleven", "", "full body thirteen"))
    assert(timeline.head.getAs[String]("from_email") == "a@x.com")
  }

  test("textSearch hits chat bodies only; empty query returns nothing") {
    val out = java.nio.file.Files.createTempDirectory("graft_tb").toString
    CacheBuilder.buildBodies(spark, Seq(
      (11L, "pizza tonight?"), (23L, "pizza tomorrow"),
      (31L, "pizza in an email")).toDF("message_id", "body_text"), out)
    val bodies = spark.read.parquet(s"$out/message_bodies")
    val hits = engine.textSearch("pizza", bodies).collect()
    // email 31 excluded by the chat-type filter; sent_at desc
    assert(hits.map(_.getAs[Long]("id")).toSeq == Seq(23L, 11L))
    assert(engine.textSearch("", bodies).collect().isEmpty)
    // whitespace-only and operator-only queries parse to ZERO text terms:
    // nothing matches (the reference nils on "" and FTS5 errors on " ")
    assert(engine.textSearch("   ", bodies).collect().isEmpty)
  }

  test("textSearch hides BOTH delete kinds (sqlite_text.go:455 LiveMessagesWhere m,true)") {
    import spark.implicits._
    val vv = Fixtures.vault(spark,
      messages = Seq(
        msg(71, "", "2024-01-01 10:00:00", convId = 1, senderId = Some(1),
          msgType = Some("sms"), snippet = "live"),
        msg(72, "", "2024-01-02 10:00:00", convId = 1, senderId = Some(1),
          msgType = Some("sms"), snippet = "dedup loser",
          deletedAt = Some("2024-02-01 00:00:00")),
        msg(73, "", "2024-01-03 10:00:00", convId = 1, senderId = Some(1),
          msgType = Some("sms"), snippet = "server deleted",
          deletedFromSourceAt = Some("2024-02-01 00:00:00"))),
      recipients = Seq(MrRow(71, 1, "from", None), MrRow(72, 1, "from", None),
        MrRow(73, 1, "from", None)),
      participants = Seq(
        PRow(1, Some("a@x.com"), Some("Alice"), None, Some("x.com"))))
    val bodies = Seq((71L, "pizza live"), (72L, "pizza hidden"),
      (73L, "pizza gone")).toDF("message_id", "body_text")
      .withColumn("tokens", org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.col("body_text"), " "))
      .select(col("message_id"), col("tokens"))
    val hits = new MsgEngine(vv).textSearch("pizza", bodies).collect()
    assert(hits.map(_.getAs[Long]("id")).toSeq == Seq(71L),
      "deleted and source-deleted chats must never surface in text search")
  }

  // ==========================================================================
  // Case-per-reference-test parity for the conversation-list edge cases
  // (textimport/integration_test.go:155-380; duckdb_text.go:108-158;
  // text_models.go:94-96).
  // ==========================================================================

  // edge-case archive: ties, null snippet/title, phantom participant,
  // the FULL TextMessageTypes set, an unknown source, a labeled chat
  private lazy val edge = Fixtures.vault(spark,
    messages = Seq(
      // conv 4: preview tie-breaker — 42 and 43 share sent_at; the
      // higher id must win (integration_test.go:155-183, 290-294;
      // FIRST(snippet ORDER BY sent_at DESC, id DESC) duckdb_text.go:139)
      msg(41, "", "2024-04-01 10:00:00", convId = 4, senderId = Some(1),
        msgType = Some("sms"), snippet = "first", sourceId = 1),
      msg(42, "", "2024-04-02 10:00:00", convId = 4, senderId = Some(2),
        msgType = Some("sms"), snippet = "early id", sourceId = 1),
      msg(43, "", "2024-04-02 10:00:00", convId = 4, senderId = Some(1),
        msgType = Some("sms"), snippet = "late id", sourceId = 1),
      // conv 5: latest snippet NULL → last_preview '' (duckdb_text.go:152);
      // null sender collapses to the phantom 0 participant
      // (COALESCE(sender_id, 0), duckdb_text.go:136) → participant 2
      msg(51, "", "2024-05-01 10:00:00", convId = 5, senderId = Some(1),
        msgType = Some("google_voice_text"), snippet = "gv text", sourceId = 9),
      msg(52, "", "2024-05-02 10:00:00", convId = 5, senderId = None,
        msgType = Some("google_voice_text"), snippet = null, sourceId = 9),
      // conv 6: non-text type — excluded wholesale (text_models.go:94-96)
      msg(61, "", "2024-06-01 10:00:00", convId = 6, senderId = Some(1),
        msgType = Some("telegram"), snippet = "not a text type", sourceId = 1)),
    recipients = Seq(
      MrRow(41, 1, "from", None), MrRow(42, 2, "from", None),
      MrRow(43, 1, "from", None), MrRow(51, 1, "from", None),
      MrRow(52, 1, "from", None), MrRow(61, 1, "from", None)),
    participants = Seq(
      PRow(1, Some("a@x.com"), Some("Alice"), Some("+15551234567"), Some("x.com")),
      PRow(2, Some("b@y.org"), Some("Bob"), None, Some("y.org"))),
    conversations = Seq(
      ConvRow(4, "conv-4", None, Some("group")), // null title → ""
      ConvRow(5, "conv-5", Some("GV Chat"), Some("direct")),
      ConvRow(6, "conv-6", Some("Telegram"), None)),
    sources = Seq(SrcRow(1, "sms@x.com", Some("sms"))), // 9 missing → ""
    labels = Seq(LblRow(1, "Important")),
    messageLabels = Seq(MlRow(41L, 1L)))

  private lazy val edgeEngine = new MsgEngine(edge)

  test("preview tie-break: same sent_at, higher id wins (integration_test.go:290-294)") {
    val c4 = edgeEngine.listConversations().collect()
      .find(_.getAs[Long]("conversation_id") == 4L).get
    assert(c4.getAs[String]("last_preview") == "late id")
    assert(c4.getAs[Long]("message_count") == 3)
  }

  test("null title / missing source / null latest snippet render as '' (duckdb_text.go:147-152)") {
    val rows = edgeEngine.listConversations().collect()
      .map(r => r.getAs[Long]("conversation_id") -> r).toMap
    assert(rows(4L).getAs[String]("title") == "") // COALESCE(conv.title,'')
    val c5 = rows(5L)
    assert(c5.getAs[String]("last_preview") == "") // latest snippet is NULL
    assert(c5.getAs[String]("source_type") == "") // source 9 has no row
    // phantom participant: {sender 1, NULL→0} = 2 distinct
    assert(c5.getAs[Long]("participant_count") == 2)
  }

  test("the full TextMessageTypes set is in; other types are out (text_models.go:94-96)") {
    val e1 = new MsgEngine(v)
    // sms + google_voice_text conversations appear (edge archive)...
    val ids = edgeEngine.listConversations().collect()
      .map(_.getAs[Long]("conversation_id")).toSet
    assert(ids == Set(4L, 5L), s"telegram conv must be excluded, got $ids")
    // ...and the base archive's imessage/whatsapp already pass; email
    // stays out in both (conv 3 in the base fixture)
    assert(!e1.listConversations().collect()
      .map(_.getAs[Long]("conversation_id")).contains(3L))
  }

  test("name sort and conversation pagination (duckdb_text.go:108-127)") {
    val byName = edgeEngine.listConversations(TextFilter(
      sortField = TextSortField.Name, sortDirection = SortDirection.Asc))
      .collect().map(_.getAs[String]("title")).toSeq
    assert(byName == Seq("", "GV Chat")) // '' sorts first ascending
    val page = edgeEngine.listConversations(TextFilter(
      pagination = Pagination(limit = 1, offset = 1))).collect()
    assert(page.length == 1) // limit honored after offset
  }

  test("textStats counts labels on chats and scopes by source (integration_test.go:355-379)") {
    val all = edgeEngine.textStats().head()
    assert(all.getAs[Long]("message_count") == 5) // telegram excluded
    assert(all.getAs[Long]("label_count") == 1) // Important on msg 41
    val s1 = edgeEngine.textStats(sourceId = Some(1L)).head()
    assert(s1.getAs[Long]("message_count") == 3) // conv 4 only
  }

  test("contact aggregate counts fallback-resolved messages (integration_test.go:309-330)") {
    // Alice: direct sender of 41,43,51 AND fallback contact of 52 (null
    // sender) — 4 total. TextViewContacts keys by ADDRESS, phone-first
    // (the reference integration test asserts the PHONE key, exactly
    // this shape); the display-name chain is the ContactNames view.
    val rows = edgeEngine.aggregateTextContacts().collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("count")).toMap
    assert(rows("+15551234567") == 4L, s"got $rows")
    assert(rows("b@y.org") == 1L) // Bob: no phone → email fallback
    val names = edgeEngine.aggregateTextContactNames().collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("count")).toMap
    assert(names("Alice") == 4L && names("Bob") == 1L, s"got $names")
  }

  test("textStats: chat-only totals with snippet search") {
    val all = engine.textStats().head()
    assert(all.getAs[Long]("message_count") == 5)
    assert(all.getAs[Long]("distinct_sources") == 2)
    // GetTextStats also reports distinct label names (duckdb_text.go:503-517)
    assert(all.getAs[Long]("label_count") == 0) // no labels on chats here
    val wa = engine.textStats(searchQuery = "wa ").head()
    assert(wa.getAs[Long]("message_count") == 2) // "wa first", "wa latest"
  }

  test("textAggregate search: non-label views do NOT match the grouping key") {
    // textAggViewDef (duckdb_text.go:191-243) sets keyColumns ONLY on the
    // Labels branch — a term that matches nothing but the Sources key
    // ('whatsapp' appears in no subject/snippet/participant) must match
    // NOTHING; the subject/snippet branch still admits rows
    assert(engine.aggregateTextSources(
      AggregateOptions(searchQuery = "whatsapp")).collect().isEmpty)
    val bySnip = engine.aggregateTextSources(
      AggregateOptions(searchQuery = "wa ")).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("count")).toMap
    assert(bySnip == Map("whatsapp" -> 2L), s"got $bySnip")
  }
}
