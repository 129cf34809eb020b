package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Mime
import graft.operators.{DeletionStaging, Export, MessageDedup}
import graft.sources.Tables

/** Export + deletion-staging entries (reference cmd/export_eml.go,
  * internal/export/, internal/deletion/) over the same deterministic
  * message star as the dedup family ([[MessageDedupQueries.star]]) — the
  * oracle reconstructs every payload arithmetically from `documents`
  * while the Spark side does the HONEST work: real mbox shard files
  * written and parsed back, a real staged-manifest store written and
  * re-read.
  */
object ExportQueries {

  /** tmp sink root — the ONE pid+session+snapshot-scoped recipe
    * ([[CoreQueries.etlTmpPath]]); a second copy of the de-racing scheme
    * would silently drift from the next fix to it.
    */
  private def tmpPath(s: SparkSession, dir: String, name: String): String =
    CoreQueries.etlTmpPath(s, dir, name)

  /** The exportable set: LIVE messages that have raw MIME, with the blob
    * inflated back to text — exactly what export-eml serves per id
    * (reference shared.go:196-215: fetch raw, zlib-inflate, return).
    */
  private def exportable(s: SparkSession, dir: String): DataFrame = {
    val (v, raw) = MessageDedupQueries.star(s, dir)
    v.messages.filter(col("deleted_at").isNull)
      .select(col("id"), col("source_message_id"), col("sent_at"))
      .join(raw, col("id") === col("message_id"))
      .select(col("id"), col("source_message_id"), col("sent_at"),
        when(col("compression") === "zlib", Mime.inflateUdf(col("raw_data")))
          .otherwise(col("raw_data")).cast("string").as("mime"))
  }

  /** Shared oracle CTE: the raw-MIME text reconstruction for the live
    * exportable set, ending in `x(id, mime)`. Branch order mirrors the
    * star's `when` chain (MessageDedupQueries.star rawTxt).
    */
  private val exportableCte: String =
    """WITH x AS (
      |  SELECT doc_id AS id,
      |         CASE
      |           WHEN doc_id % 4 = 1 THEN
      |             'Received: tr-' || CAST(doc_id AS VARCHAR) || chr(10) ||
      |             'Message-Id: m' || CAST(doc_id // 4 AS VARCHAR) || chr(10) ||
      |             'Subject: doc-' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || text
      |           WHEN doc_id % 4 = 3 THEN
      |             'Received: tr-' || CAST(doc_id AS VARCHAR) || chr(10) ||
      |             'Subject: c' || CAST(doc_id // 8 AS VARCHAR) || chr(10) || chr(10) ||
      |             'body-c' || CAST(doc_id // 8 AS VARCHAR)
      |           WHEN doc_id % 6 = 0 THEN
      |             'Received: tr-' || CAST(doc_id AS VARCHAR) || chr(10) ||
      |             'Subject: u-' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || text
      |         END AS mime
      |  FROM documents WHERE doc_id % 97 <> 0)""".stripMargin

  // --- mbox export roundtrip ----------------------------------------------

  /** Filtered-set mbox export, THROUGH the filesystem: frame each live
    * raw-bearing message as an mboxrd record, write 32 shard files, parse
    * them back, and report (id, n_bytes, mime_md5) from the RE-READ
    * bytes. The oracle reconstructs the same triple arithmetically — so a
    * framing/quoting/shard-order bug surfaces as a value mismatch, not
    * just a count change. (Reference: export-eml serves exactly these
    * bytes per message; mbox is the bulk framing its import side already
    * speaks, internal/mbox/.)
    */
  def exportRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmpPath(s, dir, "graft_export_mbox")
    val ex = exportable(s, dir)
    Export.writeMbox(ex, col("id"),
      Export.mboxRecord(col("source_message_id"), col("sent_at"), col("mime")),
      out)
    val back = Export.readMbox(s, out)
      .select(substring(col("envelope_id"), 5, 100).cast("long").as("id"),
        length(col("mime").cast("binary")).cast("long").as("n_bytes"),
        md5(col("mime")).as("mime_md5"))
    bucketOrdered(back, col("id"))
  }

  val exportRoundtripSql: String =
    s"""$exportableCte
      |SELECT id, CAST(octet_length(encode(mime)) AS BIGINT) AS n_bytes,
      |       md5(mime) AS mime_md5
      |FROM x WHERE mime IS NOT NULL
      |ORDER BY ${duckBucket("id")}, id ASC""".stripMargin

  // --- eml manifest ---------------------------------------------------------

  /** Per-message .eml manifest (filename, size, sha256) — the scale form
    * of export-eml: the manifest is the distributed artifact; writing a
    * million 100-byte files is not. Filenames go through the reference's
    * sanitize semantics (cmd/export_eml.go:70-85).
    */
  def exportEmlManifest(s: SparkSession, dir: String): DataFrame =
    bucketOrdered(
      exportable(s, dir).select(col("id"),
        Export.emlFilename(col("source_message_id")).as("eml_filename"),
        length(col("mime").cast("binary")).cast("long").as("n_bytes"),
        sha2(col("mime").cast("binary"), 256).as("mime_sha256")),
      col("id"))

  val exportEmlManifestSql: String =
    s"""$exportableCte
      |SELECT id, 'src-' || CAST(id AS VARCHAR) || '.eml' AS eml_filename,
      |       CAST(octet_length(encode(mime)) AS BIGINT) AS n_bytes,
      |       sha256(mime) AS mime_sha256
      |FROM x WHERE mime IS NOT NULL
      |ORDER BY ${duckBucket("id")}, id ASC""".stripMargin

  // --- attachment zip manifest ---------------------------------------------

  /** Attachment export manifest over a synthetic content-addressed
    * attachment set: 7 colliding filename groups (exercising the
    * used-names suffix rule), ':' needing sanitization in every name,
    * and every 31st content hash corrupted to a 10-char prefix
    * (exercising ValidateContentHash rejection — invalid entries keep
    * their row, get no zip name, and consume no name slot).
    */
  def exportAttachmentManifest(s: SparkSession, dir: String): DataFrame = {
    val att = Tables.load(s, dir, "documents").select(
      col("doc_id").as("attachment_id"),
      concat(lit("doc:"), (col("doc_id") % 7).cast("string"), lit(".pdf"))
        .as("filename"),
      when(col("doc_id") % 31 === 0,
        substring(sha2(col("text").cast("binary"), 256), 1, 10))
        .otherwise(sha2(col("text").cast("binary"), 256)).as("content_hash"),
      length(col("text").cast("binary")).cast("long").as("size"))
    bucketOrdered(
      Export.attachmentZipManifest(att, col("attachment_id"), col("filename"),
        col("content_hash"), col("size")),
      col("attachment_id"))
  }

  val exportAttachmentManifestSql: String =
    s"""WITH a AS (
      |  SELECT doc_id AS attachment_id,
      |         'doc:' || CAST(doc_id % 7 AS VARCHAR) || '.pdf' AS fn,
      |         CASE WHEN doc_id % 31 = 0 THEN substr(sha256(text), 1, 10)
      |              ELSE sha256(text) END AS content_hash,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |v AS (
      |  SELECT *,
      |         'doc_' || CAST(attachment_id % 7 AS VARCHAR) || '.pdf' AS name,
      |         ROW_NUMBER() OVER (
      |           PARTITION BY attachment_id % 7 ORDER BY attachment_id ASC) AS rn
      |  FROM a WHERE length(content_hash) = 64)
      |SELECT * FROM (
      |  SELECT attachment_id, content_hash, n_bytes, TRUE AS hash_valid,
      |         CASE WHEN rn = 1 THEN name
      |              ELSE 'doc_' || CAST(attachment_id % 7 AS VARCHAR)
      |                   || '_' || CAST(rn AS VARCHAR) || '.pdf' END AS zip_name
      |  FROM v
      |  UNION ALL
      |  SELECT attachment_id, content_hash, n_bytes, FALSE AS hash_valid,
      |         NULL AS zip_name
      |  FROM a WHERE length(content_hash) <> 64)
      |ORDER BY ${duckBucket("attachment_id")}, attachment_id ASC""".stripMargin

  // --- deletion staging lifecycle -------------------------------------------

  /** Stage the dedup remote-deletion candidates as a pending manifest in
    * the staged-deletion store (write members + header + status event),
    * then read the store BACK and report each member with its manifest's
    * summary and current status — the reference's stage→review handoff
    * (internal/deletion/manifest.go; candidates from the dedup pass are
    * same-source gmail-only by construction, dedup.go:95-117). The
    * execute/transition half of the lifecycle is spec-gated
    * (ExportDeletionSpec) — it mutates state, which a repeatable oracle
    * query must not.
    */
  private val stagingLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def deletionStaging(s: SparkSession, dir: String): DataFrame = {
    // memoizedIndex tolerates DUPLICATE builds under a race (builds run
    // outside computeIfAbsent by design), but this build has filesystem
    // side effects on one deterministic path — two concurrent stage()
    // calls would Overwrite each other's files mid-write. Same-JVM
    // duplicates serialize on a per-(session, dir) monitor; the loser
    // then re-runs stage() sequentially, which is idempotent over the
    // finished store (the manifest is still pending, so the re-stage
    // precondition passes and the dynamic overwrite replaces like with
    // like).
    val base = memoizedIndex(s, dir, "deletion_staging_store") {
      stagingLocks.computeIfAbsent(
        System.identityHashCode(s) + "|" + dir, _ => new Object).synchronized {
      val (v, sc) = MessageDedupQueries.scannedMemo(s, dir)
      val cand = MessageDedup.remoteDeletionCandidates(v, sc)
        .join(v.messages.select(col("id"), col("source_message_id"),
          col("size_estimate"), col("sent_at")),
          col("loser_id") === col("id"))
        .select(col("source_message_id").as("gmail_id"), col("source_id"),
          col("source_type"), col("size_estimate"), col("sent_at"))
      val b = tmpPath(s, dir, "graft_deletion_store")
      DeletionStaging.stage(s, b, "dedup-remote-batch",
        "dedup remote deletion candidates", cand)
      b
      }
    }
    val members = DeletionStaging.members(s, base, "dedup-remote-batch")
    val header = DeletionStaging.headers(s, base)
    val status = DeletionStaging.currentStatus(s, base).select(
      col("manifest_id"), col("status"))
    bucketOrdered(
      members.select(col("gmail_id"), col("manifest_id"))
        .join(broadcast(header), Seq("manifest_id"))
        .join(broadcast(status), Seq("manifest_id"))
        .select(col("gmail_id"), col("manifest_id"), col("status"),
          col("message_count"), col("total_size_bytes"), col("n_accounts")),
      col("gmail_id"))
  }

  /** Oracle: replay the remote-candidate derivation (the msg_dedup_remote
    * core over the shared star CTEs) and attach the summary aggregates +
    * the literal pending status.
    */
  def deletionStagingSql(starCte: String): String =
    s"""$starCte,
       |winners AS (
       |  SELECT DISTINCT winner_id AS w_id, source_id AS w_src
       |  FROM scan WHERE id = winner_id),
       |cand AS (
       |  SELECT 'src-' || CAST(l.id AS VARCHAR) AS gmail_id,
       |         l.source_id, CAST(100 AS BIGINT) AS size_estimate
       |  FROM scan l JOIN winners w
       |    ON l.winner_id = w.w_id AND l.source_id = w.w_src
       |  WHERE l.id <> l.winner_id AND l.source_type = 'gmail'),
       |summary AS (
       |  SELECT COUNT(*) AS message_count,
       |         CAST(SUM(size_estimate) AS BIGINT) AS total_size_bytes,
       |         CAST(COUNT(DISTINCT source_id) AS BIGINT) AS n_accounts
       |  FROM cand)
       |SELECT c.gmail_id, 'dedup-remote-batch' AS manifest_id,
       |       'pending' AS status,
       |       s.message_count, s.total_size_bytes, s.n_accounts
       |FROM cand c CROSS JOIN summary s
       |ORDER BY ${duckBucket("c.gmail_id")}, c.gmail_id ASC""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "export_roundtrip" -> (exportRoundtrip _, Some(exportRoundtripSql)),
    "export_eml_manifest" -> (exportEmlManifest _, Some(exportEmlManifestSql)),
    "export_attachment_manifest" ->
      (exportAttachmentManifest _, Some(exportAttachmentManifestSql)),
    "deletion_staging" ->
      (deletionStaging _, Some(deletionStagingSql(MessageDedupQueries.starCteForOracles))))
}
