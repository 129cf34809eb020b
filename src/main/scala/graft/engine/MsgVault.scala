package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The message-archive analytics star held as canonical DataFrames —
  * the Spark analogue of the reference's registered DuckDB views over the
  * Parquet cache (reference: internal/query/views.go:129-145, required set
  * duckdb.go:1804-1813).
  *
  * Scale design: `messages` is the (large) fact table, hive-partitioned by
  * `year` on disk so time filters prune partitions; `message_recipients` /
  * `message_labels` / `attachments` are junction tables shuffled on
  * message_id when joined; `participants` / `labels` / `sources` /
  * `conversations` are small dimensions that AQE auto-broadcasts.
  */
final case class MsgVault(
    spark: SparkSession,
    messages: DataFrame,
    recipients: DataFrame,
    participants: DataFrame,
    labels: DataFrame,
    messageLabels: DataFrame,
    attachments: DataFrame,
    conversations: DataFrame,
    sources: DataFrame,
    // conversation membership junction (conversation_id, participant_id,
    // role, joined_at) — the table the reference's own TODO wants
    // exported (duckdb_text.go:135; OLTP schema store/messages.go:1552).
    // Optional: stars built before r14 (and reference-built caches,
    // which never export it) open without it, and every consumer falls
    // back to the message-derived path.
    conversationParticipants: Option[DataFrame] = None) {

  /** Attachment rollup pre-aggregated to message grain — joined *below*
    * aggregate joins to prevent fan-out double-count (reference
    * duckdb.go:396-402).
    */
  def attachmentRollup: DataFrame =
    attachments.groupBy(col("message_id").as("__att_mid"))
      .agg(sum(col("size")).as("__att_size"),
        count(lit(1)).as("__att_cnt"))

  /** Register base views so `spark.sql` raw queries see the same names the
    * reference registers in DuckDB (views.go:129-145) plus the convenience
    * views (views.go:324-489).
    */
  def registerViews(): Unit = {
    messages.createOrReplaceTempView("messages")
    recipients.createOrReplaceTempView("message_recipients")
    participants.createOrReplaceTempView("participants")
    labels.createOrReplaceTempView("labels")
    messageLabels.createOrReplaceTempView("message_labels")
    attachments.createOrReplaceTempView("attachments")
    conversations.createOrReplaceTempView("conversations")
    sources.createOrReplaceTempView("sources")
    conversationParticipants.foreach(
      _.createOrReplaceTempView("conversation_participants"))
    MsgVault.convenienceViews.foreach(spark.sql(_))
  }
}

object MsgVault {

  /** Optional columns synthesized with defaults when missing from older
    * cache files (reference duckdb.go:141-165, views.go:183-305) — the
    * schema-evolution tolerance layer.
    */
  private val optionalColumns: Map[String, Seq[(String, Column)]] = Map(
    "messages" -> Seq(
      "sender_id" -> lit(null).cast(LongType),
      "message_type" -> lit(null).cast(StringType),
      "attachment_count" -> lit(0).cast(IntegerType),
      "deleted_at" -> lit(null).cast(TimestampType),
      "deleted_from_source_at" -> lit(null).cast(TimestampType),
      "rfc822_message_id" -> lit(null).cast(StringType),
      "is_from_me" -> lit(false),
      "archived_at" -> lit(null).cast(TimestampType)),
    "participants" -> Seq(
      "phone_number" -> lit(null).cast(StringType)),
    "conversations" -> Seq(
      "source_conversation_id" -> lit(null).cast(StringType),
      "title" -> lit(null).cast(StringType),
      "conversation_type" -> lit(null).cast(StringType)),
    "sources" -> Seq(
      "source_type" -> lit(null).cast(StringType),
      "display_name" -> lit(null).cast(StringType)),
    "conversation_participants" -> Seq(
      "role" -> lit(null).cast(StringType),
      "joined_at" -> lit(null).cast(TimestampType)))

  private def backfill(name: String, df: DataFrame): DataFrame =
    optionalColumns.getOrElse(name, Nil).foldLeft(df) {
      case (d, (c, default)) =>
        if (d.columns.contains(c)) d else d.withColumn(c, default)
    }

  /** Canonical column types per table (reference views.go:174-300: every
    * view column is CAST/TRY_CAST to its canonical type so a cache written
    * by an older producer with VARCHAR-typed numerics still queries
    * correctly — duckdb_test.go:3059-3172). Columns already at the target
    * type pass through untouched; drifted columns get a permissive cast
    * (string→long parse failure yields NULL, the TRY_CAST contract), with
    * the reference's COALESCE defaults where it declares one.
    */
  private val canonicalTypes: Map[String, Seq[(String, DataType)]] = Map(
    "messages" -> Seq(
      "id" -> LongType, "source_id" -> LongType,
      "conversation_id" -> LongType, "sender_id" -> LongType,
      "size_estimate" -> LongType, "has_attachments" -> BooleanType,
      "attachment_count" -> IntegerType, "sent_at" -> TimestampType,
      "deleted_at" -> TimestampType,
      "deleted_from_source_at" -> TimestampType,
      "archived_at" -> TimestampType, "is_from_me" -> BooleanType,
      "subject" -> StringType, "snippet" -> StringType,
      "source_message_id" -> StringType, "message_type" -> StringType,
      "rfc822_message_id" -> StringType),
    "message_recipients" -> Seq(
      "message_id" -> LongType, "participant_id" -> LongType,
      "recipient_type" -> StringType, "display_name" -> StringType),
    "participants" -> Seq(
      "id" -> LongType, "email_address" -> StringType,
      "domain" -> StringType, "display_name" -> StringType,
      "phone_number" -> StringType),
    "labels" -> Seq("id" -> LongType, "name" -> StringType),
    "message_labels" -> Seq(
      "message_id" -> LongType, "label_id" -> LongType),
    "attachments" -> Seq(
      "id" -> LongType, "message_id" -> LongType, "size" -> LongType,
      "filename" -> StringType, "mime_type" -> StringType,
      "content_hash" -> StringType),
    "conversations" -> Seq(
      "id" -> LongType, "source_conversation_id" -> StringType,
      "title" -> StringType, "conversation_type" -> StringType),
    "sources" -> Seq(
      "id" -> LongType, "identifier" -> StringType,
      "source_type" -> StringType, "display_name" -> StringType),
    "conversation_participants" -> Seq(
      "conversation_id" -> LongType, "participant_id" -> LongType,
      "role" -> StringType, "joined_at" -> TimestampType))

  /** Drift-cast defaults (views.go:181-196 COALESCE(TRY_CAST(..), d)). */
  private val castDefaults: Map[(String, String), Column] = Map(
    ("messages", "has_attachments") -> lit(false),
    ("messages", "is_from_me") -> lit(false),
    ("messages", "attachment_count") -> lit(0))

  private def canonicalize(name: String, df: DataFrame): DataFrame =
    canonicalTypes.getOrElse(name, Nil).foldLeft(df) {
      case (d, (c, target)) =>
        if (!d.columns.contains(c) || d.schema(c).dataType == target) d
        else {
          // try_cast, not cast: under ANSI mode (the Spark 4 default) a
          // plain cast of a malformed drifted value ('N/A' in a numeric
          // column) would THROW on first action — the reference's TRY_CAST
          // contract is NULL-on-failure (views.go:181-196)
          val casted = col(c).try_cast(target)
          d.withColumn(c, castDefaults.get((name, c))
            .map(dv => coalesce(casted, dv)).getOrElse(casted))
        }
    }

  /** Open a Parquet star directory: `<dir>/messages` is hive-partitioned by
    * year (partition discovery + pruning are native); junction tables may
    * contain incremental shards — `mergeSchema` mirrors the reference's
    * `union_by_name=true` (duckdb.go:310).
    */
  def open(spark: SparkSession, dir: String): MsgVault = {
    // `batch` is the writer's idempotent-retry shard key
    // ([[CacheBuilder.build]]) — physical layout, not part of the star:
    // messages carry it as a partition column (dropped here); junctions
    // live in batch_<tag> subdirectories (globbed here)
    def read(name: String): DataFrame =
      canonicalize(name, backfill(name,
        spark.read.option("mergeSchema", "true").parquet(s"$dir/$name")
          .drop("batch")))
    def readShards(name: String): DataFrame =
      canonicalize(name, backfill(name,
        spark.read.option("mergeSchema", "true").parquet(s"$dir/$name/*")))
    // presence probe, not schema probe: a pre-r14 star simply has no
    // conversation_participants directory — open it without the
    // junction and let consumers fall back (the reference's own caches
    // never export it, duckdb_text.go:135)
    val cpPath = new org.apache.hadoop.fs.Path(
      s"$dir/conversation_participants")
    val hasCp = cpPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(cpPath)
    MsgVault(spark,
      messages = withYearMonth(read("messages")),
      recipients = readShards("message_recipients"),
      participants = read("participants"),
      labels = read("labels"),
      messageLabels = readShards("message_labels"),
      attachments = readShards("attachments"),
      conversations = read("conversations"),
      sources = read("sources"),
      conversationParticipants =
        if (hasCp) Some(read("conversation_participants")) else None)
  }

  /** Build directly from in-memory frames (typed fixtures in tests). */
  def fromFrames(spark: SparkSession, messages: DataFrame, recipients: DataFrame,
      participants: DataFrame, labels: DataFrame, messageLabels: DataFrame,
      attachments: DataFrame, conversations: DataFrame,
      sources: DataFrame,
      conversationParticipants: Option[DataFrame] = None): MsgVault =
    MsgVault(spark,
      withYearMonth(canonicalize("messages", backfill("messages", messages))),
      canonicalize("message_recipients", recipients),
      canonicalize("participants", backfill("participants", participants)),
      canonicalize("labels", labels),
      canonicalize("message_labels", messageLabels),
      canonicalize("attachments", attachments),
      canonicalize("conversations", backfill("conversations", conversations)),
      canonicalize("sources", backfill("sources", sources)),
      conversationParticipants.map(cp =>
        canonicalize("conversation_participants",
          backfill("conversation_participants", cp))))

  /** Derived year/month columns the ETL adds (build_cache.go:305-306). */
  private def withYearMonth(df: DataFrame): DataFrame = {
    val withY = if (df.columns.contains("year")) df
      else df.withColumn("year", year(col("sent_at")))
    if (withY.columns.contains("month")) withY
    else withY.withColumn("month", month(col("sent_at")))
  }

  /** Spark-SQL re-expressions of the reference convenience views
    * (views.go:324-489). DuckDB's order-sensitive FIRST is replaced with
    * min_by on participant_id — deterministic under shuffle (SURVEY §7
    * "what's hard" #3); LIST(x ORDER BY x) becomes
    * to_json(array_sort(collect_list)).
    */
  val convenienceViews: Seq[String] = Seq(
    """CREATE OR REPLACE TEMP VIEW v_messages AS
      |SELECT m.id, m.source_id, m.source_message_id, m.conversation_id,
      |       m.subject, m.snippet, m.sent_at, m.size_estimate,
      |       m.has_attachments, m.attachment_count, m.message_type,
      |       m.year, m.month,
      |       COALESCE(ms.from_email, ds.from_email, '') AS from_email,
      |       COALESCE(ms.from_name, ds.from_name, '') AS from_name,
      |       COALESCE(ms.from_domain, ds.from_domain, '') AS from_domain,
      |       COALESCE(ms.from_phone, ds.from_phone, '') AS from_phone,
      |       COALESCE(ml_agg.labels, '[]') AS labels,
      |       m.deleted_from_source_at
      |FROM messages m
      |LEFT JOIN (
      |  SELECT mr.message_id,
      |         min_by(p.email_address, mr.participant_id) AS from_email,
      |         min_by(COALESCE(NULLIF(TRIM(mr.display_name), ''),
      |                         NULLIF(TRIM(p.display_name), ''),
      |                         NULLIF(p.phone_number, ''),
      |                         p.email_address, ''), mr.participant_id) AS from_name,
      |         min_by(p.domain, mr.participant_id) AS from_domain,
      |         min_by(COALESCE(p.phone_number, ''), mr.participant_id) AS from_phone
      |  FROM message_recipients mr
      |  JOIN participants p ON p.id = mr.participant_id
      |  WHERE mr.recipient_type = 'from'
      |  GROUP BY mr.message_id) ms ON ms.message_id = m.id
      |LEFT JOIN (
      |  SELECT msg.id AS message_id,
      |         COALESCE(p.email_address, '') AS from_email,
      |         COALESCE(p.display_name, '') AS from_name,
      |         COALESCE(p.domain, '') AS from_domain,
      |         COALESCE(p.phone_number, '') AS from_phone
      |  FROM messages msg JOIN participants p ON p.id = msg.sender_id
      |  WHERE msg.sender_id IS NOT NULL) ds
      |  ON ds.message_id = m.id AND ms.message_id IS NULL
      |LEFT JOIN (
      |  SELECT ml.message_id,
      |         to_json(array_sort(collect_list(l.name))) AS labels
      |  FROM message_labels ml JOIN labels l ON l.id = ml.label_id
      |  GROUP BY ml.message_id) ml_agg ON ml_agg.message_id = m.id
      |""".stripMargin,
    """CREATE OR REPLACE TEMP VIEW v_senders AS
      |SELECT p.email_address AS from_email,
      |       COALESCE(NULLIF(TRIM(min_by(mr.display_name, mr.message_id)), ''),
      |                NULLIF(TRIM(min_by(p.display_name, mr.message_id)), ''),
      |                p.email_address) AS from_name,
      |       p.domain AS from_domain,
      |       COUNT(*) AS message_count,
      |       SUM(m.size_estimate) AS total_size,
      |       COALESCE(SUM(att.attachment_size), 0) AS attachment_size,
      |       COALESCE(SUM(att.attachment_count), 0) AS attachment_count,
      |       MIN(m.sent_at) AS first_message_at,
      |       MAX(m.sent_at) AS last_message_at
      |FROM message_recipients mr
      |JOIN participants p ON p.id = mr.participant_id
      |JOIN messages m ON m.id = mr.message_id
      |LEFT JOIN (
      |  SELECT message_id, SUM(size) AS attachment_size,
      |         COUNT(*) AS attachment_count
      |  FROM attachments GROUP BY message_id) att ON att.message_id = m.id
      |WHERE mr.recipient_type = 'from'
      |GROUP BY p.email_address, p.domain
      |""".stripMargin,
    """CREATE OR REPLACE TEMP VIEW v_domains AS
      |SELECT p.domain, COUNT(*) AS message_count,
      |       SUM(m.size_estimate) AS total_size,
      |       COUNT(DISTINCT p.email_address) AS sender_count
      |FROM message_recipients mr
      |JOIN participants p ON p.id = mr.participant_id
      |JOIN messages m ON m.id = mr.message_id
      |WHERE mr.recipient_type = 'from'
      |GROUP BY p.domain
      |""".stripMargin,
    """CREATE OR REPLACE TEMP VIEW v_labels AS
      |SELECT l.name, COUNT(*) AS message_count,
      |       SUM(m.size_estimate) AS total_size
      |FROM message_labels ml
      |JOIN labels l ON l.id = ml.label_id
      |JOIN messages m ON m.id = ml.message_id
      |GROUP BY l.name
      |""".stripMargin,
    """CREATE OR REPLACE TEMP VIEW v_threads AS
      |SELECT c.id AS conversation_id, c.source_conversation_id,
      |       c.title AS conversation_title, c.conversation_type,
      |       COUNT(DISTINCT m.id) AS message_count,
      |       MIN(m.sent_at) AS first_message_at,
      |       MAX(m.sent_at) AS last_message_at,
      |       COALESCE(to_json(collect_set(p.email_address)), '[]')
      |         AS participant_emails
      |FROM conversations c
      |JOIN messages m ON m.conversation_id = c.id
      |LEFT JOIN message_recipients mr ON mr.message_id = m.id
      |LEFT JOIN participants p ON p.id = mr.participant_id
      |GROUP BY c.id, c.source_conversation_id, c.title, c.conversation_type
      |""".stripMargin)
}
