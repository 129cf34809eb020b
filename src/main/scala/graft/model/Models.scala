package graft.model

import java.sql.Timestamp

/** Typed model layer mirroring the reference's query models
  * (reference: internal/query/models.go). Case classes double as Spark
  * `Encoder` targets for `Dataset[T]` results.
  */

/** One row of an aggregate view (reference models.go:11-18). */
final case class AggregateRow(
    key: String,
    count: Long,
    total_size: Long,
    attachment_size: Long,
    attachment_count: Long,
    total_unique: Long)

/** Message list-view row (reference models.go:22-41).
  * `source_conversation_id` is the Gmail thread id (models.go:26);
  * `deleted_from_source_at` is the reference's `DeletedAt` field —
  * their JSON name, but the SCANNED column is deleted_from_source_at
  * (duckdb.go:1289), so this keeps the unambiguous name (the star also
  * carries a dedup-loser `deleted_at`, which list surfaces never show).
  * BodyText (models.go:40) is deliberately absent: it is only populated
  * on timeline views, served here by the bodies-joining
  * listConversationMessages overload.
  */
final case class MessageSummary(
    id: Long,
    source_message_id: String,
    conversation_id: Long,
    source_conversation_id: String,
    subject: String,
    snippet: String,
    from_email: String,
    from_name: String,
    from_phone: String,
    sent_at: Timestamp,
    size_estimate: Long,
    has_attachments: Boolean,
    attachment_count: Int,
    labels: Seq[String],
    deleted_from_source_at: Option[Timestamp],
    message_type: String,
    conversation_title: String)

/** Archive-wide stats (reference engine.go:96-103). `distinct_sources`
  * is the reference's AccountCount; `label_count` its LabelCount (distinct
  * label NAMES among the matching messages, duckdb.go:1164-1177).
  */
final case class TotalStats(
    message_count: Long,
    total_size: Long,
    attachment_size: Long,
    attachment_count: Long,
    distinct_sources: Long,
    label_count: Long)

/** Aggregate view dimension (reference models.go:90-121). */
sealed abstract class ViewType(val name: String)
object ViewType {
  case object Senders extends ViewType("Senders")
  case object SenderNames extends ViewType("Sender Names")
  case object Recipients extends ViewType("Recipients")
  case object RecipientNames extends ViewType("Recipient Names")
  case object Domains extends ViewType("Domains")
  case object Labels extends ViewType("Labels")
  case object Time extends ViewType("Time")
  val all: Seq[ViewType] = Seq(Senders, SenderNames, Recipients,
    RecipientNames, Domains, Labels, Time)

  /** Untrusted-string entry point (CLI/REST config values). The sealed
    * hierarchy makes an out-of-range value UNREPRESENTABLE in compiled
    * callers — the Scala twin of the reference's enum-validation guard
    * (sqlite_injection_test.go:11-25: ViewType(999) must error, never
    * fall through to a default SQL branch) — and this parser extends the
    * same guarantee to the string boundary: unknown names are rejected
    * with the reference's wording, never defaulted.
    */
  def fromName(s: String): Either[String, ViewType] =
    all.find(_.name.equalsIgnoreCase(s.trim))
      .toRight(s"unsupported view type: $s")
}

sealed trait TimeGranularity
object TimeGranularity {
  case object Year extends TimeGranularity
  case object Month extends TimeGranularity
  case object Day extends TimeGranularity

  /** Period length 4/7/10 → year/month/day (reference duckdb.go:1013-1023). */
  def infer(explicit: Option[TimeGranularity], period: String): TimeGranularity =
    explicit.getOrElse(period.length match {
      case 4  => Year
      case 10 => Day
      case _  => Month
    })

  /** Reject-unknown string parse (sqlite_injection_test.go:74-88 twin). */
  def fromName(s: String): Either[String, TimeGranularity] =
    s.trim.toLowerCase match {
      case "year"  => Right(Year)
      case "month" => Right(Month)
      case "day"   => Right(Day)
      case other   => Left(s"unsupported time granularity: $other")
    }
}

sealed trait SortField
object SortField {
  case object Count extends SortField
  case object Size extends SortField
  case object AttachmentSize extends SortField
  case object Name extends SortField

  /** Reject-unknown string parse (sqlite_injection_test.go:29-46 twin). */
  def fromName(s: String): Either[String, SortField] =
    s.trim.toLowerCase match {
      case "count"           => Right(Count)
      case "size"            => Right(Size)
      case "attachment_size" => Right(AttachmentSize)
      case "name"            => Right(Name)
      case other             => Left(s"unsupported sort field: $other")
    }
}

sealed trait SortDirection
object SortDirection {
  case object Desc extends SortDirection
  case object Asc extends SortDirection
}

sealed trait MessageSortField
object MessageSortField {
  case object Date extends MessageSortField
  case object Size extends MessageSortField
  case object Subject extends MessageSortField

  /** Reject-unknown string parse (sqlite_injection_test.go:50-70 twin). */
  def fromName(s: String): Either[String, MessageSortField] =
    s.trim.toLowerCase match {
      case "date"    => Right(Date)
      case "size"    => Right(Size)
      case "subject" => Right(Subject)
      case other     => Left(s"unsupported message sort field: $other")
    }
}

/** Texts-mode aggregate view (reference text_models.go TextViewType /
  * duckdb_text.go:191-243 textAggViewDef — the five views the text TUI
  * cycles through). Same reject-unknown string boundary as [[ViewType]].
  */
sealed abstract class TextViewType(val name: String)
object TextViewType {
  case object Contacts extends TextViewType("Contacts")
  case object ContactNames extends TextViewType("Contact Names")
  case object Sources extends TextViewType("Sources")
  case object Labels extends TextViewType("Labels")
  case object Time extends TextViewType("Time")
  val all: Seq[TextViewType] =
    Seq(Contacts, ContactNames, Sources, Labels, Time)

  def fromName(s: String): Either[String, TextViewType] =
    all.find(_.name.equalsIgnoreCase(s.trim))
      .toRight(s"unsupported text view type: $s")
}

/** Texts-mode conversation-list sort (reference text_models.go TextSortBy*). */
sealed trait TextSortField
object TextSortField {
  case object LastMessage extends TextSortField
  case object Count extends TextSortField
  case object Name extends TextSortField
}

/** Texts-mode filter (reference text_models.go TextFilter;
  * duckdb_text.go:22-103 buildTextFilterConditions). Contact matches
  * resolve against the dual-path sender (direct sender_id, falling back
  * to the first from-recipient).
  */
final case class TextFilter(
    sourceId: Option[Long] = None,
    contactPhone: String = "",
    contactName: String = "",
    sourceType: String = "",
    label: String = "",
    timeRange: TimeRange = TimeRange(),
    after: Option[Timestamp] = None,
    before: Option[Timestamp] = None,
    sortField: TextSortField = TextSortField.LastMessage,
    sortDirection: SortDirection = SortDirection.Desc,
    pagination: Pagination = Pagination())

/** Texts-mode conversation row (reference text_models.go:38-46). */
final case class ConversationRow(
    conversation_id: Long,
    title: String,
    source_type: String,
    message_count: Long,
    participant_count: Long,
    last_message_at: Timestamp,
    last_preview: String)

final case class Pagination(limit: Int = 0, offset: Int = 0)
final case class MessageSorting(
    field: MessageSortField = MessageSortField.Date,
    direction: SortDirection = SortDirection.Desc)
final case class TimeRange(
    period: String = "",
    granularity: Option[TimeGranularity] = None)

/** Which messages to retrieve (reference models.go:192-248). Empty string =
  * no filter on that dimension, unless the dimension appears in
  * `emptyValueTargets` — then it drills into the NULL/empty bucket
  * (reference models.go:204-209).
  */
final case class MessageFilter(
    sender: String = "",
    senderName: String = "",
    recipient: String = "",
    recipientName: String = "",
    domain: String = "",
    label: String = "",
    conversationId: Option[Long] = None,
    emptyValueTargets: Set[ViewType] = Set.empty,
    timeRange: TimeRange = TimeRange(),
    sourceId: Option[Long] = None,
    // tri-state (reference appendSourceFilter source_filter.go:1-37):
    // None = unscoped; Some(Nil) = match NOTHING (an empty collection);
    // Some(ids) = IN-list. Takes precedence over sourceId when set.
    sourceIds: Option[Seq[Long]] = None,
    after: Option[Timestamp] = None,
    before: Option[Timestamp] = None,
    withAttachmentsOnly: Boolean = false,
    hideDeletedFromSource: Boolean = false,
    pagination: Pagination = Pagination(),
    sorting: MessageSorting = MessageSorting()) {
  def matchesEmpty(v: ViewType): Boolean = emptyValueTargets.contains(v)
}

/** Options for [[graft.engine.MsgEngine.totalStats]] (reference
  * models.go:339-346 StatsOptions). When `searchQuery` is set, stats
  * reflect only matching messages; `groupBy` switches the text-term
  * semantics to the active view's key columns (duckdb.go:588-647
  * buildStatsSearchConditions) so the totals line up with the visible
  * aggregate rows.
  */
final case class StatsOptions(
    sourceId: Option[Long] = None,
    // tri-state, same contract as MessageFilter.sourceIds
    sourceIds: Option[Seq[Long]] = None,
    withAttachmentsOnly: Boolean = false,
    hideDeletedFromSource: Boolean = false,
    searchQuery: String = "",
    // None = default subject/snippet/sender terms (the reference's
    // zero-value ViewType lands in the same default branch)
    groupBy: Option[ViewType] = None)

/** Options for aggregate views (reference models.go:124-147). */
final case class AggregateOptions(
    sortField: SortField = SortField.Count,
    sortDirection: SortDirection = SortDirection.Desc,
    limit: Int = 100,
    sourceId: Option[Long] = None,
    // tri-state (reference appendSourceFilter source_filter.go:1-37):
    // None = unscoped; Some(Nil) = match NOTHING (an empty collection);
    // Some(ids) = IN-list. Takes precedence over sourceId when set.
    sourceIds: Option[Seq[Long]] = None,
    after: Option[Timestamp] = None,
    before: Option[Timestamp] = None,
    withAttachmentsOnly: Boolean = false,
    hideDeletedFromSource: Boolean = false,
    searchQuery: String = "")
