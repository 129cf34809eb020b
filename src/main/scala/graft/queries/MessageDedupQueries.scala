package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.MsgVault
import graft.functions.Mime
import graft.operators.MessageDedup
import graft.sources.Tables

/** DuckDB-oracled entries for the archive dedup pipeline (SURVEY §2.11;
  * reference internal/dedup/dedup.go) — the operator family that was
  * previously spec-only because it runs on the message star, not the
  * driver tables. Bridge: derive a DETERMINISTIC synthetic message star
  * from `documents` (pure column arithmetic on doc_id — no randomness, so
  * DuckDB can reconstruct the identical star), run the real operator, and
  * have the oracle replay construction + survivor selection in SQL.
  *
  * Star shape (d = doc_id, one message per document, d % 97 == 0 deleted):
  *   - Message-ID groups of three — members 4k, 4k+2 carry
  *     `rfc822_message_id = "m" + k` in the column; member 4k+1 has a NULL
  *     column but a raw MIME blob whose `Message-Id:` header says "m" + k,
  *     exercising the backfill pass (dedup.go:246-303). Half the blobs are
  *     zlib-compressed (d % 8 == 1), exercising the inflate path.
  *   - Content-hash pairs — members 8k+3 and 8k+7 have no Message-ID
  *     anywhere but identical MIME after transport-header stripping
  *     (bodies "body-c" + k; their `Received:` headers differ per message,
  *     so a hash over the UN-normalized bytes would never match),
  *     exercising the normalized-hash fallback (dedup.go:505-600).
  *   - Survivor signals vary per member: source 0/1/2 → gmail/imap/mbox
  *     (source-type preference), labels SENT/A/B/C on d % 5/3/7/2 == 0
  *     (sent-copy rank + label count), is_from_me on d % 10 == 0,
  *     has_raw from blob presence, archived_at NULL on d % 13 == 0 (the
  *     only-when-all-present comparison rule), id as the final tie-break.
  *
  * Scale shape: construction is a projection; the operator itself is two
  * key-shuffles (Message-ID, content hash) + windows — no driver state.
  * The inflate/extract/normalize UDFs touch only rows that HAVE raw MIME,
  * after the pass-1 losers are anti-joined away (MessageDedup.scan).
  */
object MessageDedupQueries {

  private val epochUs = StarFixture.epochUs

  /** The synthetic star + raw-MIME frame, derived from `documents`. */
  private[queries] def star(s: SparkSession, dir: String): (MsgVault, DataFrame) = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id").cast("long").as("d"), col("text"))
    val d = col("d")

    val ds = d.cast("string")
    val midStr = concat(lit("m"), expr("d div 4").cast("string"))
    // members 4k and 4k+2 of a Message-ID group share a source (same
    // mailbox twice), member 4k+1 sits in a different one — so the
    // remote-deletion same-source rule has real positives (winner and
    // loser in one gmail mailbox) AND real negatives (cross-source dups
    // must never stage a remote delete)
    val sourceId = when(d % 4 === 1, (expr("d div 4") + 1) % 3)
      .otherwise(expr("d div 4") % 3)
    val messages = docs.select(
      d.as("id"),
      sourceId.as("source_id"),
      lit(1L).as("conversation_id"),
      concat(lit("src-"), ds).as("source_message_id"),
      when(d % 4 === 0 || d % 4 === 2, midStr).as("rfc822_message_id"),
      lit("email").as("message_type"),
      concat(lit("subj-"), ds).as("subject"),
      lit("").as("snippet"),
      timestamp_micros(lit(epochUs) + d * 1000000L).as("sent_at"),
      lit(100L).as("size_estimate"),
      lit(false).as("has_attachments"),
      lit(0).as("attachment_count"),
      when(d % 97 === 0, timestamp_micros(lit(epochUs))).as("deleted_at"),
      lit(null).cast("timestamp").as("deleted_from_source_at"),
      (d % 10 === 0).as("is_from_me"),
      when(d % 13 =!= 0,
        timestamp_micros(lit(epochUs) + (d % 17) * 1000000L)).as("archived_at"))

    // raw MIME: backfill blobs (4k+1, Message-Id header), content-pair
    // blobs (4k+3, identical normalized form within each 8k pair), and
    // extra unique blobs on d % 6 == 0 so has_raw varies inside
    // Message-ID groups too. Transport `Received:` headers differ per
    // message and MUST be stripped for the content pairs to collide.
    val pairKey = expr("d div 8").cast("string")
    val rawTxt =
      when(d % 4 === 1, concat(
        lit("Received: tr-"), ds,
        lit("\nMessage-Id: "), midStr,
        lit("\nSubject: doc-"), ds, lit("\n\n"), col("text")))
      .when(d % 4 === 3, concat(
        lit("Received: tr-"), ds,
        lit("\nSubject: c"), pairKey,
        lit("\n\nbody-c"), pairKey))
      .when(d % 6 === 0, concat(
        lit("Received: tr-"), ds,
        lit("\nSubject: u-"), ds, lit("\n\n"), col("text")))
    val raw = docs.select(d.as("message_id"), rawTxt.as("__txt"))
      .filter(col("__txt").isNotNull)
      .withColumn("compression",
        when(col("message_id") % 8 === 1 || col("message_id") % 8 === 3,
          lit("zlib")).otherwise(lit(null).cast("string")))
      .select(col("message_id"),
        when(col("compression") === "zlib",
          Mime.deflateUdf(col("__txt").cast("binary")))
          .otherwise(col("__txt").cast("binary")).as("raw_data"),
        col("compression"))

    import s.implicits._
    val labels = Seq(
      (1L, "SENT", Option("SENT")), (2L, "A", Option.empty[String]),
      (3L, "B", Option.empty[String]), (4L, "C", Option.empty[String]))
      .toDF("id", "name", "source_label_id")
    val messageLabels = StarFixture.messageLabels(docs, d)
    val sources = Seq(
      (0L, "a@example.com", "gmail"), (1L, "b@example.com", "imap"),
      (2L, "c@example.com", "mbox")).toDF("id", "identifier", "source_type")

    val none = docs.filter(lit(false))
    val recipients = none.select(d.as("message_id"), d.as("participant_id"),
      lit("from").as("recipient_type"), lit(null).cast("string").as("display_name"))
    val participants = none.select(d.as("id"),
      lit(null).cast("string").as("email_address"),
      lit(null).cast("string").as("display_name"),
      lit(null).cast("string").as("phone_number"),
      lit(null).cast("string").as("domain"))
    val attachments = none.select(d.as("id"), d.as("message_id"),
      lit("").as("filename"), lit("").as("mime_type"), lit(0L).as("size"),
      lit("").as("content_hash"))
    val conversations = Seq((1L, "conv-1")).toDF("id", "source_conversation_id")

    (MsgVault.fromFrames(s, messages, recipients, participants, labels,
      messageLabels, attachments, conversations, sources), raw)
  }

  /** Scan ONCE per (session, dir), persist the (tiny) scan result, and
    * derive every output from it — the reference's own execution shape
    * (dedup.go Scan → Execute: losers, label transfers, remote staging
    * all read the one scan result). Without this each query re-evaluates
    * the scan DAG — whose pass-1 subtree is itself referenced three times
    * inside `scan` (output union, loser anti-join, winner join) — turning
    * a 5k-row pipeline into seconds of repeated planning and exchanges.
    * The persisted frame is group-members-only: bounded by the duplicate
    * count, not the corpus.
    */
  private[queries] def scannedMemo(s: SparkSession, dir: String): (MsgVault, DataFrame) =
    memoizedIndex[(MsgVault, DataFrame)](s, dir, "msg_dedup_scan") {
      val (v, raw) = star(s, dir)
      // localCheckpoint (not persist): materializes AND truncates the
      // logical lineage — the scan subtree is deep (joins + windows ×2
      // passes), and with plain persist every derived query re-pays its
      // full analysis/optimization walk per execution
      val sc = MessageDedup.scan(v,
        MessageDedup.Config(contentHashFallback = true),
        identities = None, raw = Some(raw))
        .localCheckpoint(true)
      // label transfers re-reads the junction twice (loser labels,
      // winner anti-join) — checkpoint it too, same small-artifact logic
      (v.copy(messageLabels = v.messageLabels.localCheckpoint(true)), sc)
    }

  def dedupScan(s: SparkSession, dir: String): DataFrame =
    bucketOrdered(
      scannedMemo(s, dir)._2.select(col("id"), col("source_id"),
        col("source_type"), col("group_key"), col("key_type"),
        col("winner_id")),
      col("id"))

  def dedupLosers(s: SparkSession, dir: String): DataFrame =
    bucketOrdered(MessageDedup.losers(scannedMemo(s, dir)._2),
      col("loser_id"))

  def dedupLabelTransfers(s: SparkSession, dir: String): DataFrame = {
    val (v, sc) = scannedMemo(s, dir)
    bucketOrdered(MessageDedup.labelTransfers(v, sc),
      col("winner_id"), col("label_id").asc)
  }

  def dedupRemote(s: SparkSession, dir: String): DataFrame = {
    val (v, sc) = scannedMemo(s, dir)
    bucketOrdered(MessageDedup.remoteDeletionCandidates(v, sc),
      col("loser_id"))
  }

  /** Shared oracle CTEs: reconstruct the star arithmetically, replay both
    * dedup passes with the survivor ordering of dedup.go:769-822 (sent
    * copies first when the group has any, source preference, has-raw,
    * label count, the archived_at CLASS-ANCHOR rule — the exact closed form
    * of dedup.go's id-ASC isBetter fold, see MessageDedup.survivorOrder —
    * then id).
    * `arch` keeps the archived_at ORDER as a small integer (d % 17) —
    * same comparisons as the timestamp it derives from.
    */
  /** Oracle-composable accessor for the shared star CTE chain (ends in
    * `scan`); ExportQueries' deletion_staging oracle builds on it. */
  private[queries] def starCteForOracles: String = starCte

  private val starCte: String =
    """WITH m AS (
      |  SELECT doc_id AS id,
      |         CASE WHEN doc_id % 4 = 1 THEN (doc_id // 4 + 1) % 3
      |              ELSE (doc_id // 4) % 3 END AS source_id,
      |         CASE CASE WHEN doc_id % 4 = 1 THEN (doc_id // 4 + 1) % 3
      |                   ELSE (doc_id // 4) % 3 END
      |              WHEN 0 THEN 'gmail' WHEN 1 THEN 'imap'
      |              ELSE 'mbox' END AS source_type,
      |         CASE WHEN doc_id % 4 IN (0, 1, 2)
      |              THEN 'm' || CAST(doc_id // 4 AS VARCHAR) END AS mid,
      |         doc_id % 10 = 0 AS is_from_me,
      |         doc_id % 5 = 0 AS has_sent,
      |         CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
      |            + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
      |            + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END
      |            + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
      |           AS label_count,
      |         (doc_id % 4 IN (1, 3)) OR (doc_id % 6 = 0) AS has_raw,
      |         CASE WHEN doc_id % 13 <> 0 THEN doc_id % 17 END AS arch
      |  FROM documents WHERE doc_id % 97 <> 0),
      |p1g AS (
      |  SELECT *,
      |         COUNT(*) OVER w AS gsize,
      |         MAX(CASE WHEN has_sent OR is_from_me THEN 1 ELSE 0 END)
      |           OVER w = 1 AS any_sent
      |  FROM m WHERE mid IS NOT NULL
      |  WINDOW w AS (PARTITION BY mid)),
      |p1c AS (
      |  -- the prefix-CLASS anchor: dedup.go's isBetter compares
      |  -- archived_at only when both sides are non-zero, and the id-ASC
      |  -- fold (store ORDER BY m.id) reduces to: a NULL-archived
      |  -- lowest-id class member survives; otherwise min archived_at
      |  SELECT *, FIRST_VALUE(arch IS NULL) OVER (
      |      PARTITION BY mid,
      |        CASE WHEN any_sent AND NOT (has_sent OR is_from_me)
      |             THEN 1 ELSE 0 END,
      |        CASE source_type WHEN 'gmail' THEN 0 WHEN 'imap' THEN 1
      |             WHEN 'mbox' THEN 2 ELSE 5 END,
      |        CASE WHEN has_raw THEN 0 ELSE 1 END,
      |        label_count
      |      ORDER BY id) AS anchor_null
      |  FROM p1g WHERE gsize > 1),
      |p1r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY mid ORDER BY
      |      CASE WHEN any_sent AND NOT (has_sent OR is_from_me)
      |           THEN 1 ELSE 0 END,
      |      CASE source_type WHEN 'gmail' THEN 0 WHEN 'imap' THEN 1
      |           WHEN 'mbox' THEN 2 ELSE 5 END,
      |      CASE WHEN has_raw THEN 0 ELSE 1 END,
      |      label_count DESC,
      |      CASE WHEN NOT anchor_null THEN arch END ASC NULLS LAST,
      |      id) AS rn
      |  FROM p1c),
      |p1 AS (
      |  SELECT id, source_id, source_type, mid AS group_key,
      |         'message-id' AS key_type,
      |         MIN(CASE WHEN rn = 1 THEN id END) OVER (PARTITION BY mid)
      |           AS winner_id
      |  FROM p1r),
      |p2g AS (
      |  SELECT *,
      |         COUNT(*) OVER w AS gsize,
      |         MAX(CASE WHEN has_sent OR is_from_me THEN 1 ELSE 0 END)
      |           OVER w = 1 AS any_sent
      |  FROM m WHERE mid IS NULL AND id % 4 = 3
      |  WINDOW w AS (PARTITION BY id // 8)),
      |p2c AS (
      |  SELECT *, FIRST_VALUE(arch IS NULL) OVER (
      |      PARTITION BY id // 8,
      |        CASE WHEN any_sent AND NOT (has_sent OR is_from_me)
      |             THEN 1 ELSE 0 END,
      |        CASE source_type WHEN 'gmail' THEN 0 WHEN 'imap' THEN 1
      |             WHEN 'mbox' THEN 2 ELSE 5 END,
      |        CASE WHEN has_raw THEN 0 ELSE 1 END,
      |        label_count
      |      ORDER BY id) AS anchor_null
      |  FROM p2g WHERE gsize > 1),
      |p2r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY id // 8 ORDER BY
      |      CASE WHEN any_sent AND NOT (has_sent OR is_from_me)
      |           THEN 1 ELSE 0 END,
      |      CASE source_type WHEN 'gmail' THEN 0 WHEN 'imap' THEN 1
      |           WHEN 'mbox' THEN 2 ELSE 5 END,
      |      CASE WHEN has_raw THEN 0 ELSE 1 END,
      |      label_count DESC,
      |      CASE WHEN NOT anchor_null THEN arch END ASC NULLS LAST,
      |      id) AS rn
      |  FROM p2c),
      |p2 AS (
      |  SELECT id, source_id, source_type,
      |         sha256('Subject: c' || CAST(id // 8 AS VARCHAR) || chr(10) ||
      |                chr(10) || 'body-c' || CAST(id // 8 AS VARCHAR))
      |           AS group_key,
      |         'normalized-hash' AS key_type,
      |         MIN(CASE WHEN rn = 1 THEN id END) OVER (PARTITION BY id // 8)
      |           AS winner_id
      |  FROM p2r),
      |scan AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)""".stripMargin

  val dedupScanSql: String =
    s"""$starCte
       |SELECT id, source_id, source_type, group_key, key_type, winner_id
       |FROM scan ORDER BY ${duckBucket("id")}, id ASC""".stripMargin

  val dedupLosersSql: String =
    s"""$starCte
       |SELECT id AS loser_id, winner_id, key_type
       |FROM scan WHERE id <> winner_id
       |ORDER BY ${duckBucket("id")}, loser_id ASC""".stripMargin

  val dedupLabelTransfersSql: String =
    s"""$starCte,
       |mlab AS (
       |  SELECT doc_id AS message_id, CAST(1 AS BIGINT) AS label_id
       |  FROM documents WHERE doc_id % 5 = 0
       |  UNION ALL SELECT doc_id, 2 FROM documents WHERE doc_id % 3 = 0
       |  UNION ALL SELECT doc_id, 3 FROM documents WHERE doc_id % 7 = 0
       |  UNION ALL SELECT doc_id, 4 FROM documents WHERE doc_id % 2 = 0)
       |SELECT * FROM (
       |  SELECT DISTINCT s.winner_id, ml.label_id
       |  FROM scan s JOIN mlab ml ON ml.message_id = s.id
       |  WHERE s.id <> s.winner_id
       |    AND NOT EXISTS (SELECT 1 FROM mlab w
       |      WHERE w.message_id = s.winner_id AND w.label_id = ml.label_id))
       |ORDER BY ${duckBucket("winner_id")}, winner_id ASC, label_id ASC""".stripMargin

  val dedupRemoteSql: String =
    s"""$starCte,
       |winners AS (
       |  SELECT DISTINCT winner_id AS w_id, source_id AS w_src
       |  FROM scan WHERE id = winner_id)
       |SELECT l.id AS loser_id, l.winner_id, l.source_id, l.source_type
       |FROM scan l JOIN winners w
       |  ON l.winner_id = w.w_id AND l.source_id = w.w_src
       |WHERE l.id <> l.winner_id AND l.source_type = 'gmail'
       |ORDER BY ${duckBucket("l.id")}, loser_id ASC""".stripMargin

  /** Dedicated oracle for the archived_at CLASS-ANCHOR rule (r13 audit —
    * dedup.go:815-818's both-non-zero guard under the store's id-ASC
    * fold, see MessageDedup.survivorOrder key 5). The shared star above
    * structurally cannot discriminate it: its only multi-member prefix
    * classes are the same-source pairs {4k, 4k+2}, and a two-member
    * class agrees under the anchor rule and the group-wide
    * any-null-disables approximation alike (divergence needs >= 3
    * class members with mixed null/dated archived_at). Here every group
    * is FOUR same-class members (one source, no labels/raw/sent), arch
    * is a scrambled bijection of id with nulls on id % 3 == 0 — every
    * group holds a null, so the old approximation would ALWAYS fall to
    * lowest-id while the anchor rule picks min-arch whenever the anchor
    * is dated: maximally discriminating.
    */
  def dedupArchRule(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id").cast("long").as("d"))
    val d = col("d")
    val messages = docs.select(
      d.as("id"), lit(0L).as("source_id"), lit(1L).as("conversation_id"),
      concat(lit("src-"), d.cast("string")).as("source_message_id"),
      concat(lit("g"), expr("d div 4").cast("string")).as("rfc822_message_id"),
      lit("email").as("message_type"), lit("s").as("subject"),
      lit("").as("snippet"),
      timestamp_micros(lit(epochUs) + d * 1000000L).as("sent_at"),
      lit(100L).as("size_estimate"), lit(false).as("has_attachments"),
      lit(0).as("attachment_count"),
      lit(null).cast("timestamp").as("deleted_at"),
      lit(null).cast("timestamp").as("deleted_from_source_at"),
      lit(false).as("is_from_me"),
      when(d % 3 =!= 0,
        timestamp_micros(lit(epochUs) + ((d * 7) % 23) * 1000000L))
        .as("archived_at"))
    val none = docs.filter(lit(false))
    val v = MsgVault.fromFrames(s, messages,
      none.select(d.as("message_id"), d.as("participant_id"),
        lit("from").as("recipient_type"),
        lit(null).cast("string").as("display_name")),
      none.select(d.as("id"), lit(null).cast("string").as("email_address"),
        lit(null).cast("string").as("display_name"),
        lit(null).cast("string").as("phone_number"),
        lit(null).cast("string").as("domain")),
      Seq.empty[(Long, String)].toDF("id", "name"),
      none.select(d.as("message_id"), d.as("label_id")),
      none.select(d.as("id"), d.as("message_id"), lit("").as("filename"),
        lit("").as("mime_type"), lit(0L).as("size"),
        lit("").as("content_hash")),
      Seq((1L, "conv-1")).toDF("id", "source_conversation_id"),
      Seq((0L, "a@example.com", "gmail")).toDF("id", "identifier", "source_type"))
    bucketOrdered(
      MessageDedup.scan(v, MessageDedup.Config(sourceIds = Seq(0L)))
        .select(col("id"), col("group_key"), col("winner_id")),
      col("id"))
  }

  val dedupArchRuleSql: String =
    s"""WITH m AS (
       |  SELECT doc_id AS id, 'g' || CAST(doc_id // 4 AS VARCHAR) AS mid,
       |         CASE WHEN doc_id % 3 <> 0 THEN (doc_id * 7) % 23 END AS arch
       |  FROM documents),
       |g AS (
       |  SELECT *, COUNT(*) OVER (PARTITION BY mid) AS gsize,
       |         FIRST_VALUE(arch IS NULL) OVER (PARTITION BY mid ORDER BY id)
       |           AS anchor_null
       |  FROM m),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY mid ORDER BY
       |      CASE WHEN NOT anchor_null THEN arch END ASC NULLS LAST,
       |      id) AS rn
       |  FROM g WHERE gsize > 1)
       |SELECT id, mid AS group_key,
       |       MIN(CASE WHEN rn = 1 THEN id END) OVER (PARTITION BY mid)
       |         AS winner_id
       |FROM r
       |ORDER BY ${duckBucket("id")}, id ASC""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "msg_dedup_scan" -> (dedupScan _, Some(dedupScanSql)),
    "msg_dedup_losers" -> (dedupLosers _, Some(dedupLosersSql)),
    "msg_dedup_label_transfers" ->
      (dedupLabelTransfers _, Some(dedupLabelTransfersSql)),
    "msg_dedup_arch_rule" -> (dedupArchRule _, Some(dedupArchRuleSql)),
    "msg_dedup_remote" -> (dedupRemote _, Some(dedupRemoteSql)))
}
