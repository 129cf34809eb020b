package graft.engine

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.Row

/** Empty-bucket drilldown semantics against the reference's dedicated
  * empty-buckets star (reference: internal/query/duckdb_test.go:1478-1525
  * buildEmptyBucketsTestData, and the MatchEmpty* / MultipleEmptyTargets /
  * DomainExcludesEmpty / GetGmailIDsByFilter edge-case tests at
  * duckdb_test.go:1529-1890, 2847-2909).
  *
  * Star: msg1/msg2 normal; msg3 "No Sender" (label INBOX, recipient bob);
  * msg4 "No Recipients" (from alice, label INBOX); msg5 "No Labels"
  * (from alice, to bob); msg6 "Empty Domain" (from a participant whose
  * domain is the empty string, label INBOX).
  */
class EmptyBucketsSpec extends SparkTestBase {
  import Fixtures._

  // participants: 1 alice (example.com), 2 bob (company.org),
  // 3 "nodomain" with EMPTY domain (duckdb_test.go:1488)
  private lazy val v = Fixtures.vault(spark,
    messages = Seq(
      msg(1, "Normal 1", "2024-01-15 10:00:00", size = 1000),
      msg(2, "Normal 2", "2024-01-16 10:00:00", size = 2000),
      msg(3, "No Sender", "2024-01-17 10:00:00", size = 1500),
      msg(4, "No Recipients", "2024-01-18 10:00:00", size = 3000),
      msg(5, "No Labels", "2024-01-19 10:00:00", size = 500),
      msg(6, "Empty Domain", "2024-01-20 10:00:00", size = 600)),
    recipients = Seq(
      MrRow(1, 1, "from", Some("Alice")), MrRow(1, 2, "to", Some("Bob")),
      MrRow(2, 2, "from", Some("Bob")), MrRow(2, 1, "to", Some("Alice")),
      MrRow(3, 2, "to", Some("Bob")), // no sender
      MrRow(4, 1, "from", Some("Alice")), // no recipients
      MrRow(5, 1, "from", Some("Alice")), MrRow(5, 2, "to", Some("Bob")), // no labels
      MrRow(6, 3, "from", Some("No Domain")), MrRow(6, 2, "to", Some("Bob"))),
    participants = Seq(
      PRow(1, Some("alice@example.com"), Some("Alice"), None, Some("example.com")),
      PRow(2, Some("bob@company.org"), Some("Bob"), None, Some("company.org")),
      PRow(3, Some("nodomain"), Some("No Domain"), None, Some(""))),
    labels = Seq(LblRow(1, "INBOX"), LblRow(2, "Work")),
    // msg5 intentionally has none (duckdb_test.go:1514-1519)
    messageLabels = Seq(MlRow(1, 1), MlRow(2, 2), MlRow(3, 1), MlRow(4, 1), MlRow(6, 1)))

  private lazy val engine = new MsgEngine(v)

  private def subjects(filter: MessageFilter): Set[String] =
    engine.listMessages(filter).collect().map(_.getAs[String]("subject")).toSet

  private def aggKeys(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("empty-domain bucket: no-from messages AND empty-string-domain senders") {
    // duckdb_test.go:1585-1616 — msg3 (no from row) and msg6 (from with
    // domain = '') are both in no domain bucket
    assert(subjects(MessageFilter(emptyValueTargets = Set(ViewType.Domains)))
      == Set("No Sender", "Empty Domain"))
  }

  test("empty-label bucket finds the unlabeled message") {
    // duckdb_test.go:1620-1645
    assert(subjects(MessageFilter(emptyValueTargets = Set(ViewType.Labels)))
      == Set("No Labels"))
  }

  test("empty-recipient bucket finds the recipientless message") {
    // duckdb_test.go:1557-1582
    assert(subjects(MessageFilter(emptyValueTargets = Set(ViewType.Recipients)))
      == Set("No Recipients"))
  }

  test("recipient buckets + empty bucket sum to the total with email-less recipients") {
    // a message whose ONLY 'to' participant has no email is in NO
    // recipient bucket (the view's email-not-null guard drops it), so it
    // must land in the EMPTY bucket — a bare recipient-row anti-join
    // would exclude it from both, breaking buckets + empty == total
    val v2 = Fixtures.vault(spark,
      messages = Seq(
        msg(1, "Emailed", "2024-01-15 10:00:00"),
        msg(2, "Phone Only", "2024-01-16 10:00:00")),
      recipients = Seq(
        MrRow(1, 1, "from", Some("Alice")), MrRow(1, 2, "to", Some("Bob")),
        MrRow(2, 1, "from", Some("Alice")), MrRow(2, 3, "to", Some("Tex"))),
      participants = Seq(
        PRow(1, Some("alice@example.com"), Some("Alice"), None, Some("example.com")),
        PRow(2, Some("bob@company.org"), Some("Bob"), None, Some("company.org")),
        PRow(3, None, Some("Tex"), Some("+15550001111"), None)))
    val e2 = new MsgEngine(v2)
    val bucketed = e2.aggregate(ViewType.Recipients).collect()
      .map(_.getAs[Long]("count")).sum
    val emptied = e2.listMessages(MessageFilter(
      emptyValueTargets = Set(ViewType.Recipients))).collect()
      .map(_.getAs[String]("subject"))
    assert(bucketed == 1L)
    assert(emptied.toSet == Set("Phone Only"),
      "the phone-only-recipient message belongs to the empty bucket")
  }

  test("empty-value target combines with a value filter (AND)") {
    // duckdb_test.go:1648-1674 — sender=alice AND empty labels → msg5 only
    assert(subjects(MessageFilter(sender = "alice@example.com",
      emptyValueTargets = Set(ViewType.Labels))) == Set("No Labels"))
  }

  test("multiple empty targets are all applied (AND), not last-writer-wins") {
    // duckdb_test.go:1677-1729 — the reference regression test for the bug
    // where only one empty dimension survived. No message has BOTH no
    // sender and no labels, nor BOTH no recipients and no labels.
    assert(subjects(MessageFilter(
      emptyValueTargets = Set(ViewType.Senders, ViewType.Labels))).isEmpty)
    assert(subjects(MessageFilter(
      emptyValueTargets = Set(ViewType.Recipients, ViewType.Labels))).isEmpty)
  }

  test("subAggregate under empty-bucket filters keeps every constraint") {
    // duckdb_test.go:1732-1800 — three drilldown scenarios
    // 1. empty sender → labels: msg3 carries INBOX only
    assert(aggKeys(engine.subAggregate(ViewType.Labels,
      MessageFilter(emptyValueTargets = Set(ViewType.Senders))))
      == Map("INBOX" -> 1L))
    // 2. empty sender + empty labels → domains: nothing satisfies both
    assert(aggKeys(engine.subAggregate(ViewType.Domains,
      MessageFilter(emptyValueTargets = Set(ViewType.Senders, ViewType.Labels)))).isEmpty)
    // 3. empty recipients → senders: msg4 is from alice
    assert(aggKeys(engine.subAggregate(ViewType.Senders,
      MessageFilter(emptyValueTargets = Set(ViewType.Recipients))))
      == Map("alice@example.com" -> 1L))
  }

  test("domains aggregate and subAggregate exclude the empty-string domain") {
    // duckdb_test.go:2847-2909 — '' never appears as a ViewDomains key even
    // though msg6's from-participant carries it
    val top = aggKeys(engine.aggregate(ViewType.Domains))
    assert(top == Map("example.com" -> 3L, "company.org" -> 1L))
    val sub = aggKeys(engine.subAggregate(ViewType.Domains, MessageFilter()))
    assert(!sub.keySet.contains("") && sub == top)
  }

  test("gmailIdsByFilter: non-existent values yield empty, not errors") {
    // duckdb_test.go:1822-1847
    for (f <- Seq(
        MessageFilter(sender = "nobody@nowhere.com"),
        MessageFilter(recipient = "nobody@nowhere.com"),
        MessageFilter(domain = "nowhere.com"),
        MessageFilter(label = "NONEXISTENT")))
      assert(engine.gmailIdsByFilter(f).count() == 0L)
  }

  test("gmailIdsByFilter: empty filter returns every live gmail message") {
    // duckdb_test.go:1850-1862
    val ids = engine.gmailIdsByFilter(MessageFilter())
      .collect().map(_.getString(0)).toSet
    assert(ids == Set("src-1", "src-2", "src-3", "src-4", "src-5", "src-6"))
  }

  test("gmailIdsByFilter: recency order, limit honored (sqlite.go:1121-1135)") {
    // with a limit the ordering is SEMANTIC — it picks which messages
    // stage for deletion: the two most recent (sent_at desc), not the
    // lexicographically-first source ids
    val top = engine.gmailIdsByFilter(
      MessageFilter(pagination = Pagination(limit = 2)))
      .collect().map(_.getString(0)).toSeq
    assert(top == Seq("src-6", "src-5"), s"got $top")
  }

  test("gmailIdsByFilter: combined filters that match nothing yield empty") {
    // duckdb_test.go:1865-1890 — bob sent msg2 (label Work); bob+INBOX→∅
    // here: bob's only message carries Work, so bob+INBOX matches nothing
    assert(engine.gmailIdsByFilter(
      MessageFilter(sender = "bob@company.org", label = "INBOX")).count() == 0L)
  }
}
