package graft.operators

import graft.SparkTestBase
import graft.engine.Fixtures
import graft.functions.Mime
import org.apache.spark.sql.functions._

/** Archive dedup pipeline behaviors (reference internal/dedup/dedup.go +
  * dedup_test.go/normalize_test.go semantics).
  */
class MessageDedupSpec extends SparkTestBase {
  import Fixtures._
  import spark.implicits._

  private def zlib(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(out)
    d.write(s.getBytes("ISO-8859-1")); d.close()
    out.toByteArray
  }

  private val mimeA =
    "Received: from relay1\r\nFrom: a@x.com\r\nSubject: hello\r\nMessage-ID: <dup@x>\r\n\r\nbody text"
  private val mimeA2 = // same message via another relay: transport headers differ
    "Received: from relay2\r\nDkim-Signature: v=1\r\nFrom: a@x.com\r\nSubject: hello\r\nMessage-ID: <dup@x>\r\n\r\nbody text"
  private val mimeB =
    "From: b@y.org\r\nSubject: other\r\nMessage-ID: <uniq@y>\r\n\r\ndifferent body"

  test("normalizeRawMime strips transport headers and sorts the rest") {
    val n1 = new String(Mime.normalizeRawMime(mimeA.getBytes("ISO-8859-1")), "ISO-8859-1")
    val n2 = new String(Mime.normalizeRawMime(mimeA2.getBytes("ISO-8859-1")), "ISO-8859-1")
    assert(n1 == n2) // transport-header differences vanish
    assert(n1 == "From: a@x.com\nMessage-Id: <dup@x>\nSubject: hello\n\nbody text")
  }

  test("inflate round-trips zlib and nulls out corrupt input") {
    assert(new String(Mime.inflate(zlib("hello")), "ISO-8859-1") == "hello")
    assert(Mime.inflate(Array[Byte](1, 2, 3)) == null)
    assert(Mime.inflate(null) == null)
  }

  test("inflate returns null on a preset-dictionary (FDICT) stream, no hang") {
    // an FDICT stream stalls Inflater.inflate at 0 bytes with
    // needsDictionary() — without the loop guard this spun forever
    val d = new java.util.zip.Deflater()
    d.setDictionary("shared-dict".getBytes("ISO-8859-1"))
    d.setInput("payload".getBytes("ISO-8859-1")); d.finish()
    val buf = new Array[Byte](256)
    val n = d.deflate(buf); d.end()
    assert(Mime.inflate(buf.take(n)) == null)
  }

  test("deflate is inflate's inverse (and matches an external zlib stream)") {
    val payload = "raw mime é bytes"
    assert(new String(Mime.inflate(Mime.deflate(
      payload.getBytes("ISO-8859-1"))), "ISO-8859-1") == payload)
    // external DeflaterOutputStream blob inflates the same way
    assert(new String(Mime.inflate(zlib(payload)), "ISO-8859-1") == payload)
    assert(Mime.deflate(null) == null)
  }

  test("extractMessageId finds the header incl. folded/missing cases") {
    assert(Mime.extractMessageId(mimeA.getBytes("ISO-8859-1")) == "<dup@x>")
    assert(Mime.extractMessageId("From: x\r\n\r\nbody".getBytes("ISO-8859-1")) == null)
    val folded = "Message-ID:\r\n <folded@x>\r\n\r\nb".getBytes("ISO-8859-1")
    assert(Mime.extractMessageId(folded) == "<folded@x>")
  }

  private def dedupVault = {
    // 1+2 share a Message-ID (same source); 3 unique; 4 has null Message-ID
    val messages = Seq(
      msg(1, "dup", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<dup@x>")),
      msg(2, "dup", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<dup@x>")),
      msg(3, "uniq", "2024-02-01 10:00:00").copy(rfc822_message_id = Some("<uniq@y>")),
      msg(4, "dup-no-mid", "2024-01-01 10:00:00").copy(rfc822_message_id = None))
    Fixtures.vault(spark, messages,
      recipients = (1 to 4).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))),
      labels = Seq(LblRow(1, "INBOX"), LblRow(2, "WORK")),
      messageLabels = Seq(MlRow(1, 1), MlRow(2, 1), MlRow(2, 2)))
  }

  test("message-id pass groups within scope; more labels wins") {
    val scanned = MessageDedup.scan(dedupVault,
      MessageDedup.Config(sourceIds = Seq(1L)))
    val rows = scanned.collect()
    assert(rows.map(_.getAs[Long]("id")).toSet == Set(1L, 2L))
    // msg 2 carries 2 labels vs msg 1's single label → survivor
    assert(rows.forall(_.getAs[Long]("winner_id") == 2L))
    val l = MessageDedup.losers(scanned).collect()
    assert(l.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("sent copy outranks label count and source preference") {
    val messages = Seq(
      msg(1, "dup", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<dup@x>")),
      msg(2, "dup", "2024-01-01 10:00:00", sourceId = 2)
        .copy(rfc822_message_id = Some("<dup@x>"), is_from_me = true))
    val v = Fixtures.vault(spark, messages,
      recipients = Seq(MrRow(1, 1, "from", None), MrRow(2, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))),
      labels = Seq(LblRow(1, "INBOX")),
      messageLabels = Seq(MlRow(1, 1)), // msg 1 has more labels…
      sources = Seq(SrcRow(1, "one", Some("gmail")), SrcRow(2, "two", Some("mbox"))))
    // …and better source type, but msg 2 is the sent copy → msg 2 survives
    val scanned = MessageDedup.scan(v,
      MessageDedup.Config(sourceIds = Seq(1L, 2L)))
    assert(scanned.collect().forall(_.getAs[Long]("winner_id") == 2L))
  }

  test("archived_at class-anchor rule: the exact id-ASC fold of isBetter") {
    // dedup.go:815-818 compares archived_at only when BOTH sides are
    // non-zero; with the store's ORDER BY m.id fold that reduces to:
    // NULL-archived lowest-id class member survives, else min
    // archived_at (r13 audit). Three same-class members (same source
    // type, no raw, no labels, no sent copies):
    //   id 1 arch=05:00, id 2 arch=NULL, id 3 arch=01:00
    // exact rule → id 3 (min non-null arch; the null at id 2 never
    // displaces a dated best and never disables the comparison);
    // the old any-null-disables approximation would have picked id 1.
    def m(id: Long, arch: Option[String]) =
      msg(id, "dup", "2024-01-01 10:00:00")
        .copy(rfc822_message_id = Some("<arch@x>"),
          archived_at = arch.map(Fixtures.ts))
    val v = Fixtures.vault(spark,
      Seq(m(1, Some("2024-02-01 05:00:00")), m(2, None),
        m(3, Some("2024-02-01 01:00:00"))),
      recipients = (1 to 3).map(i => MrRow(i.toLong, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))))
    val scanned = MessageDedup.scan(v, MessageDedup.Config(sourceIds = Seq(1L)))
    assert(scanned.collect().forall(_.getAs[Long]("winner_id") == 3L))

    // NULL-archived ANCHOR: id 1 arch=NULL survives although id 2
    // carries the earliest date — a dated later member can never beat
    // the undated anchor (both-non-zero guard fails, higher id loses)
    val v2 = Fixtures.vault(spark,
      Seq(m(1, None), m(2, Some("2024-02-01 01:00:00")), m(3, None)),
      recipients = (1 to 3).map(i => MrRow(i.toLong, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))))
    val scanned2 = MessageDedup.scan(v2, MessageDedup.Config(sourceIds = Seq(1L)))
    assert(scanned2.collect().forall(_.getAs[Long]("winner_id") == 1L))

    // the rule is scoped to the prefix CLASS: a null-archived member
    // that loses on label count does not anchor the class — the dated
    // pair still compares archived_at (min arch wins, not min id)
    val v3 = Fixtures.vault(spark,
      Seq(m(1, None), m(2, Some("2024-02-01 05:00:00")),
        m(3, Some("2024-02-01 01:00:00"))),
      recipients = (1 to 3).map(i => MrRow(i.toLong, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))),
      labels = Seq(LblRow(1, "A")),
      // ids 2 and 3 carry a label; the null-arch id 1 has none → it is
      // in a LOWER class; ids 2,3's class anchor (id 2) is dated
      messageLabels = Seq(MlRow(2, 1), MlRow(3, 1)))
    val scanned3 = MessageDedup.scan(v3, MessageDedup.Config(sourceIds = Seq(1L)))
    assert(scanned3.collect().forall(_.getAs[Long]("winner_id") == 3L))
  }

  test("identity match marks sent copies per-source only") {
    val messages = Seq(
      msg(1, "dup", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<dup@x>")),
      msg(2, "dup", "2024-01-01 10:00:00", sourceId = 2)
        .copy(rfc822_message_id = Some("<dup@x>")))
    val v = Fixtures.vault(spark, messages,
      recipients = Seq(MrRow(1, 1, "from", None), MrRow(2, 1, "from", None)),
      participants = Seq(PRow(1, Some("me@x.com"), None, None, Some("x.com"))),
      sources = Seq(SrcRow(1, "one", Some("gmail")), SrcRow(2, "two", Some("gmail"))))
    // identity registered for source 2 only → msg 2 is the sent copy
    val ids = Seq((2L, "me@x.com")).toDF("source_id", "email")
    val scanned = MessageDedup.scan(v,
      MessageDedup.Config(sourceIds = Seq(1L, 2L)), identities = Some(ids))
    assert(scanned.collect().forall(_.getAs[Long]("winner_id") == 2L))
  }

  test("content-hash fallback groups transport-header-variant copies; backfill recovers Message-ID") {
    // 5+6: same normalized content, no rfc822_message_id column value, one
    // zlib-compressed; 7: unique content
    val messages = Seq(
      msg(5, "hello", "2024-01-01 10:00:00").copy(rfc822_message_id = None),
      msg(6, "hello", "2024-01-01 10:00:00").copy(rfc822_message_id = None),
      msg(7, "other", "2024-01-02 10:00:00").copy(rfc822_message_id = None))
    val v = Fixtures.vault(spark, messages,
      recipients = Seq(MrRow(5, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))))
    val raw = Seq(
      (5L, mimeA.getBytes("ISO-8859-1"), ""),
      (6L, zlib(mimeA2), "zlib"),
      (7L, mimeB.getBytes("ISO-8859-1"), ""))
      .toDF("message_id", "raw_data", "compression")

    val scanned = MessageDedup.scan(v,
      MessageDedup.Config(sourceIds = Seq(1L), contentHashFallback = true),
      raw = Some(raw))
    val byType = scanned.collect().groupBy(_.getAs[String]("key_type"))
    // the backfill recovers <dup@x> for BOTH 5 and 6 → they group in pass 1
    assert(byType("message-id").map(_.getAs[Long]("id")).toSet == Set(5L, 6L))
    assert(byType("message-id").forall(_.getAs[Long]("winner_id") == 5L))
    assert(!byType.contains("normalized-hash"))
  }

  test("backfill fills EMPTY-STRING Message-IDs, not just NULLs") {
    // 8 carries mid = "" (not NULL): it is in the `needing` set, and the
    // extracted <dup@x> must actually be USED — a bare coalesce would
    // keep the "" and the pair would never group in pass 1
    val messages = Seq(
      msg(8, "hello", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("")),
      msg(9, "hello", "2024-01-01 10:00:00").copy(rfc822_message_id = None))
    val v = Fixtures.vault(spark, messages,
      recipients = Seq(MrRow(8, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))))
    val raw = Seq(
      (8L, mimeA.getBytes("ISO-8859-1"), ""),
      (9L, zlib(mimeA2), "zlib"))
      .toDF("message_id", "raw_data", "compression")
    val scanned = MessageDedup.scan(v,
      MessageDedup.Config(sourceIds = Seq(1L), contentHashFallback = true),
      raw = Some(raw)).collect()
    assert(scanned.map(_.getAs[Long]("id")).toSet == Set(8L, 9L))
    assert(scanned.forall(_.getAs[String]("key_type") == "message-id"))
  }

  test("content-hash fallback without extractable Message-ID") {
    val noMid = "From: a@x.com\r\nSubject: s\r\n\r\nsame body"
    val noMid2 = "Received: r\r\nFrom: a@x.com\r\nSubject: s\r\n\r\nsame body"
    val messages = Seq(
      msg(5, "s", "2024-01-01 10:00:00").copy(rfc822_message_id = None),
      msg(6, "s", "2024-01-01 10:00:00").copy(rfc822_message_id = None))
    val v = Fixtures.vault(spark, messages,
      recipients = Seq(MrRow(5, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))))
    val raw = Seq(
      (5L, noMid.getBytes("ISO-8859-1"), ""),
      (6L, noMid2.getBytes("ISO-8859-1"), ""))
      .toDF("message_id", "raw_data", "compression")
    val scanned = MessageDedup.scan(v,
      MessageDedup.Config(sourceIds = Seq(1L), contentHashFallback = true),
      raw = Some(raw))
    val rows = scanned.collect()
    assert(rows.map(_.getAs[String]("key_type")).toSet == Set("normalized-hash"))
    assert(rows.map(_.getAs[Long]("id")).toSet == Set(5L, 6L))
    assert(rows.forall(_.getAs[Long]("winner_id") == 5L))
  }

  test("pass-2 orphan links to a pass-1 survivor, which is forced to win") {
    // 1+2 share a Message-ID (1 survives); orphan 3 has no Message-ID in
    // the column AND none extractable, but content identical to 1 modulo
    // transport headers → reference semantics: pass 2 groups {1, 3} and
    // the pass-1 survivor must win even if ordering would pick 3
    val noMid1 = "From: a@x.com\r\nSubject: s\r\n\r\nsame body"
    val noMid1b = "Received: relay\r\nFrom: a@x.com\r\nSubject: s\r\n\r\nsame body"
    val messages = Seq(
      msg(1, "s", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<dup@x>")),
      msg(2, "s", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<dup@x>")),
      msg(3, "s", "2024-01-01 10:00:00").copy(rfc822_message_id = None))
    val v = Fixtures.vault(spark, messages,
      recipients = Seq(MrRow(1, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))),
      labels = Seq(LblRow(1, "INBOX")),
      messageLabels = Seq(MlRow(3, 1))) // orphan has MORE labels than survivor
    val raw = Seq(
      (1L, noMid1.getBytes("ISO-8859-1"), ""),
      (3L, noMid1b.getBytes("ISO-8859-1"), ""))
      .toDF("message_id", "raw_data", "compression")
    val scanned = MessageDedup.scan(v,
      MessageDedup.Config(sourceIds = Seq(1L), contentHashFallback = true),
      raw = Some(raw))
    val byType = scanned.collect().groupBy(_.getAs[String]("key_type"))
    assert(byType("message-id").forall(_.getAs[Long]("winner_id") == 1L))
    val hashGroup = byType("normalized-hash")
    assert(hashGroup.map(_.getAs[Long]("id")).toSet == Set(1L, 3L))
    // label-count ordering would pick 3; the survivor-forcing rule keeps 1
    assert(hashGroup.forall(_.getAs[Long]("winner_id") == 1L))
    // net losers: 2 (pass 1) and 3 (pass 2)
    assert(MessageDedup.losers(scanned).collect()
      .map(_.getAs[Long]("loser_id")).toSet == Set(2L, 3L))
  }

  test("pass-2 group holding two pass-1 survivors is skipped") {
    // two distinct Message-ID groups whose survivors share content —
    // merging them would undo pass-1 decisions (reference skips)
    val body = "From: a@x.com\r\nSubject: s\r\n\r\nshared content"
    val body2 = "Received: r\r\nFrom: a@x.com\r\nSubject: s\r\n\r\nshared content"
    val messages = Seq(
      msg(1, "s", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<a@x>")),
      msg(2, "s", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<a@x>")),
      msg(3, "s", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<b@x>")),
      msg(4, "s", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<b@x>")))
    val v = Fixtures.vault(spark, messages,
      recipients = Seq(MrRow(1, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))))
    val raw = Seq(
      (1L, body.getBytes("ISO-8859-1"), ""),
      (3L, body2.getBytes("ISO-8859-1"), ""))
      .toDF("message_id", "raw_data", "compression")
    val scanned = MessageDedup.scan(v,
      MessageDedup.Config(sourceIds = Seq(1L), contentHashFallback = true),
      raw = Some(raw))
    // pass 1 prunes 2 and 4; the {1, 3} content group must NOT merge
    assert(!scanned.collect().exists(_.getAs[String]("key_type") == "normalized-hash"))
    assert(MessageDedup.losers(scanned).collect()
      .map(_.getAs[Long]("loser_id")).toSet == Set(2L, 4L))
  }

  test("source-deleted copies never join dedup groups") {
    val messages = Seq(
      msg(1, "dup", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<dup@x>")),
      msg(2, "dup", "2024-01-01 10:00:00",
        deletedFromSourceAt = Some("2024-02-01 00:00:00"))
        .copy(rfc822_message_id = Some("<dup@x>")))
    val v = Fixtures.vault(spark, messages,
      recipients = Seq(MrRow(1, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))))
    assert(MessageDedup.scan(v,
      MessageDedup.Config(sourceIds = Seq(1L))).collect().isEmpty)
  }

  test("label transfers: loser labels not already on winner") {
    val scanned = MessageDedup.scan(dedupVault,
      MessageDedup.Config(sourceIds = Seq(1L)))
    // winner=2 (has labels 1,2); loser=1 has label 1 → nothing to transfer
    assert(MessageDedup.labelTransfers(dedupVault, scanned).count() == 0)

    // flip: make msg 1 the only sent copy → winner=1 (has only label 1);
    // loser 2 contributes label 2
    val v2 = {
      val messages = Seq(
        msg(1, "dup", "2024-01-01 10:00:00")
          .copy(rfc822_message_id = Some("<dup@x>"), is_from_me = true),
        msg(2, "dup", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<dup@x>")))
      Fixtures.vault(spark, messages,
        recipients = Seq(MrRow(1, 1, "from", None)),
        participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))),
        labels = Seq(LblRow(1, "INBOX"), LblRow(2, "WORK")),
        messageLabels = Seq(MlRow(1, 1), MlRow(2, 1), MlRow(2, 2)))
    }
    val s2 = MessageDedup.scan(v2, MessageDedup.Config(sourceIds = Seq(1L)))
    val t = MessageDedup.labelTransfers(v2, s2).collect()
    assert(t.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("remote deletion: same-source gmail losers only") {
    val messages = Seq(
      msg(1, "dup", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<dup@x>")),
      msg(2, "dup", "2024-01-01 10:00:00").copy(rfc822_message_id = Some("<dup@x>")),
      msg(3, "dup2", "2024-01-01 10:00:00", sourceId = 2)
        .copy(rfc822_message_id = Some("<dup2@x>")),
      msg(4, "dup2", "2024-01-01 10:00:00", sourceId = 3)
        .copy(rfc822_message_id = Some("<dup2@x>")))
    val v = Fixtures.vault(spark, messages,
      recipients = Seq(MrRow(1, 1, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), None, None, Some("x.com"))),
      sources = Seq(SrcRow(1, "one", Some("gmail")), SrcRow(2, "two", Some("gmail")),
        SrcRow(3, "three", Some("mbox"))))
    val scanned = MessageDedup.scan(v,
      MessageDedup.Config(sourceIds = Seq(1L, 2L, 3L)))
    val remote = MessageDedup.remoteDeletionCandidates(v, scanned).collect()
    // group <dup@x>: both in gmail source 1 → loser 2 stageable.
    // group <dup2@x>: winner in source 2 (gmail), loser in source 3 (mbox,
    // different source + non-remote type) → NOT stageable.
    assert(remote.map(_.getAs[Long]("loser_id")).toSeq == Seq(2L))
  }
}
