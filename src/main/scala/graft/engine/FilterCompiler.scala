package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model._
import graft.search.SearchQuery

/** Compiles [[MessageFilter]] + parsed [[SearchQuery]] into a filtered
  * messages DataFrame — the Spark analogue of the reference's WHERE-clause
  * builders (reference: internal/query/duckdb.go:649-679 buildWhereClause,
  * 847-1010 buildFilterConditions, 435-476 search conditions).
  *
  * Plan shape, Spark-first:
  *   - scalar predicates become `Column`s (pushed into the Parquet scan by
  *     Catalyst);
  *   - each `EXISTS (...)` becomes a distinct message-id set semi-joined
  *     (`left_semi`) — the same "semi-join avoids duplicates without
  *     DISTINCT" rewrite the reference documents (duckdb.go:844-846);
  *   - each `NOT EXISTS (...)` becomes `left_anti` (empty-bucket drilldowns,
  *     duckdb.go:888-996);
  *   - `OR`-of-EXISTS (dual-path sender) joins the id sets as boolean flags
  *     and filters once — one pass over the fact table.
  */
final class FilterCompiler(v: MsgVault) {
  import FilterCompiler._

  private val mr = v.recipients
  private val p = v.participants
  private val ml = v.messageLabels
  private val lbl = v.labels

  /** Soft-delete visibility rule applied on every read path (reference
    * internal/store/live_messages.go:35-53): dedup losers always hidden;
    * source-deleted rows hidden only on opt-in.
    */
  def liveMessages(hideDeletedFromSource: Boolean): Column = {
    val base = col("deleted_at").isNull
    if (hideDeletedFromSource) base && col("deleted_from_source_at").isNull
    else base
  }

  /** Email-surface type filter (reference shared.go:18-22). */
  def emailOnly: Column =
    col("message_type") === "email" || col("message_type").isNull ||
      col("message_type") === ""

  /** Texts-mode type filter (reference duckdb_text.go:16-18). */
  def textsOnly: Column =
    col("message_type").isin("whatsapp", "imessage", "sms", "google_voice_text")

  // ---- message-id sets for semi/anti joins ------------------------------

  /** ids of messages whose from-participant matches `pred`. */
  // Every id-set helper ALIASES its output column (`.as("message_id")`
  // mints a fresh attribute id even under the same name): callers join
  // these sets against frames that may have ALREADY joined the same
  // mr/p/ml/lbl instances (the Labels aggregate view + `label:` search,
  // the Senders view + `from:` search) — without the alias the join
  // condition's column exists on BOTH sides of the self-join and Spark's
  // DetectAmbiguousSelfJoin rejects the plan (found by the InjectionSpec
  // twin of reference duckdb_test.go:2110-2140).
  private def fromIds(pred: Column): DataFrame =
    mr.filter(col("recipient_type") === "from")
      .join(p, p("id") === mr("participant_id"))
      .filter(pred)
      .select(mr("message_id").as("message_id")).distinct()

  /** ids of messages with a participant of one of `types` matching `pred`.
    * The `to:` operator spans all three recipient types (reference
    * duckdb.go:2413-2424 `recipient_type IN ('to','cc','bcc')`); `cc:` and
    * `bcc:` match only their own type (the DuckDB search path ignores
    * those operators entirely — no CcAddrs/BccAddrs handling — so the
    * contract comes from the SQLite engine, sqlite.go:1243-1272, which
    * filters `recipient_type = 'cc'` / `= 'bcc'` exactly).
    */
  private def rcptIds(pred: Column,
      types: Seq[String] = Seq("to", "cc", "bcc")): DataFrame =
    mr.filter(col("recipient_type").isin(types: _*))
      .join(p, p("id") === mr("participant_id"))
      .filter(pred)
      .select(mr("message_id").as("message_id")).distinct()

  /** ids of messages having a label matching `pred`. */
  private def labelIds(pred: Column): DataFrame =
    ml.join(lbl, lbl("id") === ml("label_id"))
      .filter(pred)
      .select(ml("message_id").as("message_id")).distinct()

  /** participant ids matching `pred` (for the sender_id direct path). */
  private def participantIds(pred: Column): DataFrame =
    p.filter(pred).select(p("id").as("__pid")).distinct()

  /** Address match semantics: a value starting with "@" is a domain
    * pattern (suffix match on email / equality on domain); otherwise exact
    * email or phone equality (reference sqlite.go:1202-1283, parser
    * normalizeAddr).
    */
  private def addrPred(value: String): Column =
    if (value.startsWith("@"))
      lower(p("email_address")).endsWith(value) ||
        lower(p("domain")) === value.stripPrefix("@")
    else
      lower(p("email_address")) === value || p("phone_number") === value

  // ---- main compile ------------------------------------------------------

  /** Returns `messages` with every condition of `filter` applied. */
  def compile(filter: MessageFilter): DataFrame = {
    var msg = v.messages.filter(liveMessages(filter.hideDeletedFromSource))

    // scalar predicates first — these push down to the scan
    filter.conversationId.foreach(id => msg = msg.filter(col("conversation_id") === id))
    // bounds are second-truncated per the reference's uniform
    // Format("2006-01-02 15:04:05") binding — see FilterCompiler.secTrunc
    filter.after.foreach(t =>
      msg = msg.filter(col("sent_at") >= lit(FilterCompiler.secTrunc(t))))
    filter.before.foreach(t =>
      msg = msg.filter(col("sent_at") < lit(FilterCompiler.secTrunc(t))))
    if (filter.withAttachmentsOnly) msg = msg.filter(col("has_attachments") === true)
    sourceScope(filter.sourceId, filter.sourceIds).foreach(c => msg = msg.filter(c))
    if (filter.timeRange.period.nonEmpty) {
      val g = TimeGranularity.infer(filter.timeRange.granularity, filter.timeRange.period)
      msg = msg.filter(timeKey(g) === filter.timeRange.period)
    }

    // sender: dual path — from-recipient OR direct sender_id (duckdb.go:875-888)
    if (filter.sender.nonEmpty) {
      val viaMr = fromIds(p("email_address") === filter.sender ||
        p("phone_number") === filter.sender)
      val viaSender = participantIds(p("email_address") === filter.sender ||
        p("phone_number") === filter.sender)
      msg = orOfPaths(msg, viaMr, viaSender)
    } else if (filter.matchesEmpty(ViewType.Senders)) {
      // empty bucket = in NO sender bucket: anti-join BOTH dual paths by
      // the same addressable-attribute predicate the bucket keys use. A
      // bare `sender_id IS NULL` filter would drop a message whose
      // sender participant exists but has neither email nor phone — that
      // message is in no bucket, and bucket counts + empty-bucket count
      // must sum to the total (the SenderNames sibling below already
      // anti-joins the attribute path this way)
      val addressable =
        (p("email_address").isNotNull && p("email_address") =!= "") ||
          (p("phone_number").isNotNull && p("phone_number") =!= "")
      val nonEmptyFrom = fromIds(addressable)
      val attrSenders = participantIds(addressable)
      msg = msg.join(nonEmptyFrom, msg("id") === nonEmptyFrom("message_id"), "left_anti")
      msg = msg.join(attrSenders, msg("sender_id") === attrSenders("__pid"), "left_anti")
    }

    if (filter.senderName.nonEmpty) {
      val viaMr = fromIds(participantNameOf(p) === filter.senderName)
      val viaSender = participantIds(participantNameOf(p) === filter.senderName)
      msg = orOfPaths(msg, viaMr, viaSender)
    } else if (filter.matchesEmpty(ViewType.SenderNames)) {
      val named = fromIds(participantNameOf(p).isNotNull)
      val namedSenders = participantIds(participantNameOf(p).isNotNull)
      msg = msg.join(named, msg("id") === named("message_id"), "left_anti")
      msg = msg.join(namedSenders, msg("sender_id") === namedSenders("__pid"), "left_anti")
    }

    if (filter.recipient.nonEmpty) {
      val ids = rcptIds(p("email_address") === filter.recipient)
      msg = msg.join(ids, msg("id") === ids("message_id"), "left_semi")
    } else if (filter.matchesEmpty(ViewType.Recipients)) {
      // anti-join the SAME set the Recipients view buckets: recipient
      // rows whose participant has an email (the view's nullGuard). A
      // bare recipient-row set would exclude a message whose only 'to'
      // participant is email-less (phone-only) from the empty bucket
      // even though the view put it in NO bucket — breaking the
      // buckets + empty == total invariant the Senders branch documents
      val any = rcptIds(p("email_address").isNotNull)
      msg = msg.join(any, msg("id") === any("message_id"), "left_anti")
    }

    if (filter.recipientName.nonEmpty) {
      val ids = rcptIds(participantNameOf(p) === filter.recipientName)
      msg = msg.join(ids, msg("id") === ids("message_id"), "left_semi")
    } else if (filter.matchesEmpty(ViewType.RecipientNames)) {
      val named = rcptIds(participantNameOf(p).isNotNull)
      msg = msg.join(named, msg("id") === named("message_id"), "left_anti")
    }

    if (filter.domain.nonEmpty) {
      val ids = fromIds(p("domain") === filter.domain)
      msg = msg.join(ids, msg("id") === ids("message_id"), "left_semi")
    } else if (filter.matchesEmpty(ViewType.Domains)) {
      val ids = fromIds(p("domain").isNotNull && p("domain") =!= "")
      msg = msg.join(ids, msg("id") === ids("message_id"), "left_anti")
    }

    if (filter.label.nonEmpty) {
      // label match is case-insensitive exact (ILIKE with escaped value,
      // duckdb.go:989-997)
      val ids = labelIds(lower(lbl("name")) === filter.label.toLowerCase)
      msg = msg.join(ids, msg("id") === ids("message_id"), "left_semi")
    } else if (filter.matchesEmpty(ViewType.Labels)) {
      val any = ml.select(col("message_id")).distinct()
      msg = msg.join(any, msg("id") === any("message_id"), "left_anti")
    }

    msg
  }

  /** `(EXISTS mr-path OR EXISTS sender-path)` — two flag joins + one filter;
    * `idSet` is keyed by message_id, `pidSet` by participant id matched
    * against msg.sender_id.
    */
  private def orOfPaths(msg: DataFrame, idSet: DataFrame, pidSet: DataFrame): DataFrame =
    msg
      .join(idSet.withColumn("__via_mr", lit(true)),
        msg("id") === idSet("message_id"), "left")
      .join(pidSet.withColumn("__via_sender", lit(true)),
        msg("sender_id") === pidSet("__pid"), "left")
      .filter(col("__via_mr") || col("__via_sender"))
      .drop("__via_mr", "__via_sender", "message_id", "__pid")

  /** Source/account scoping: SourceIDs (collections) overrides SourceID
    * (reference source_filter.go:1-37).
    */
  private def sourceScope(sourceId: Option[Long],
      sourceIds: Option[Seq[Long]]): Option[Column] =
    sourceIds match {
      // set-but-empty = match NOTHING (reference source_filter.go:12-18:
      // an empty collection compiles to 1=0, not to "unscoped")
      case Some(ids) if ids.isEmpty => Some(lit(false))
      case Some(ids) => Some(col("source_id").isin(ids: _*))
      case None => sourceId.map(col("source_id") === _)
    }

  // ---- search query compilation (SearchFast path) ------------------------

  /** Applies a parsed Gmail-style query on top of `msg` (reference
    * duckdb.go:2302-2475 buildSearchConditions). `keyCols` are extra
    * grouping-dimension columns text terms should also match in aggregate
    * views (duckdb.go:649-655, search-on-key-columns semantics
    * duckdb_test.go:539-643). `idCol` disambiguates the message-id
    * attribute when `msgIn` is a post-join frame carrying several `id`
    * columns.
    */
  def compileSearch(msgIn: DataFrame, q: SearchQuery,
      keyCols: Seq[Column] = Nil, idCol: Option[Column] = None,
      senderFallback: Boolean = true,
      labelKeyCol: Option[Column] = None): DataFrame = {
    var msg = msgIn
    def mid: Column = idCol.getOrElse(msg("id"))

    // text terms: each term must match subject OR snippet OR the sender
    // OR a key column (AND across terms). On the fast path
    // (`senderFallback`) the sender match spans email/name/PHONE from the
    // from-recipient row with a direct-sender (sender_id) fallback,
    // mirroring the reference's COALESCE(ms.from_*, ds.from_*) columns
    // (duckdb.go:2375-2388) — an OR of the two paths, which over-admits
    // only the anomalous row carrying BOTH a from-recipient and a
    // conflicting sender_id. The aggregate path matches only the
    // from-recipient's email/display name (duckdb.go:448-462 — no phone,
    // no direct-sender there).
    for (term <- q.textTerms) {
      val t = term.toLowerCase
      val basePred = lower(p("email_address")).contains(t) ||
        lower(coalesce(p("display_name"), lit(""))).contains(t)
      val partyPred =
        if (senderFallback) basePred || coalesce(p("phone_number"), lit("")).contains(t)
        else basePred
      val fromMatch = fromIds(partyPred)
        .withColumnRenamed("message_id", "__tm_id")
      val direct = lower(col("subject")).contains(t) ||
        lower(coalesce(col("snippet"), lit(""))).contains(t) ||
        keyCols.map(k => lower(k).contains(t)).foldLeft(lit(false))(_ || _)
      msg = msg
        .join(fromMatch.withColumn("__from_hit", lit(true)),
          mid === fromMatch("__tm_id"), "left")
      msg =
        if (senderFallback) {
          val senderMatch = participantIds(partyPred)
          msg.join(senderMatch.withColumn("__sender_hit", lit(true)),
              col("sender_id") === senderMatch("__pid"), "left")
            .filter(direct || col("__from_hit") || col("__sender_hit"))
            .drop("__from_hit", "__tm_id", "__sender_hit", "__pid")
        } else
          msg.filter(direct || col("__from_hit"))
            .drop("__from_hit", "__tm_id")
    }

    applyNonText(msg, q, idCol, labelKeyCol)
  }

  /** Non-text search conditions — identical across the fast, aggregate and
    * stats paths (reference buildNonTextSearchConditions duckdb.go:484-586
    * is shared the same way).
    */
  private def applyNonText(msgIn: DataFrame, q: SearchQuery,
      idCol: Option[Column], labelKeyCol: Option[Column] = None): DataFrame = {
    var msg = msgIn
    def mid: Column = idCol.getOrElse(msg("id"))

    for (s <- q.subjectTerms)
      msg = msg.filter(lower(col("subject")).contains(s.toLowerCase))

    // address dimensions: OR within a dimension, AND across dimensions
    // (reference sqlite.go:1464-1469 documents OR-within-dimension; exact
    // email/phone equality is the declared SQLite-engine contract — the
    // DuckDB engine's per-addr ANDed substring ILIKE, duckdb.go:2391-2424,
    // is a documented divergence between the reference's own two engines)
    def addrDim(values: Seq[String], from: Boolean,
        types: Seq[String] = Seq("to", "cc", "bcc")): Unit = if (values.nonEmpty) {
      val pred = values.map(addrPred).reduce(_ || _)
      val ids = if (from) fromIds(pred) else rcptIds(pred, types)
      msg = msg.join(ids, mid === ids("message_id"), "left_semi")
    }
    addrDim(q.fromAddrs, from = true)
    addrDim(q.toAddrs, from = false) // to: spans to/cc/bcc (duckdb.go:2413)
    addrDim(q.ccAddrs, from = false, types = Seq("cc"))
    addrDim(q.bccAddrs, from = false, types = Seq("bcc"))

    // labels — two view-dependent semantics (duckdb.go:521-551):
    //  * Labels AGGREGATE view (labelKeyCol set): the terms filter the
    //    GROUPED label column directly, OR'd across terms, so only the
    //    matching labels appear as result rows — not every label carried
    //    by the matching messages (duckdb_test.go:2110-2140).
    //  * everywhere else: AND across terms (each must match —
    //    sqlite.go:1466-1469 "message must have all labels"), each term a
    //    case-insensitive SUBSTRING match (both engines wrap the escaped
    //    term in %...%: duckdb.go:2436-2444, sqlite.go:1274-1284) — one
    //    semi-join per term so different terms may match different rows.
    labelKeyCol match {
      case Some(k) if q.labels.nonEmpty =>
        msg = msg.filter(q.labels
          .map(l => lower(k).contains(l.toLowerCase))
          .reduce(_ || _))
      case _ =>
        for (l <- q.labels) {
          val ids = labelIds(lower(lbl("name")).contains(l.toLowerCase))
          msg = msg.join(ids, mid === ids("message_id"), "left_semi")
        }
    }

    q.hasAttachment.foreach(b => msg = msg.filter(col("has_attachments") === b))
    // the parser resolves dates against UTC wall-clock (SearchParser now =
    // LocalDateTime.now(UTC), mirroring parser.go:200 time.Now().UTC()) —
    // convert via an explicit UTC offset, NOT Timestamp.valueOf (which
    // would interpret the wall time in the JVM default zone and shift
    // every boundary by the host's UTC offset)
    def utcTs(d: java.time.LocalDateTime): java.sql.Timestamp =
      java.sql.Timestamp.from(d.toInstant(java.time.ZoneOffset.UTC))
    q.afterDate.foreach(d => msg = msg.filter(col("sent_at") >= lit(utcTs(d))))
    q.beforeDate.foreach(d => msg = msg.filter(col("sent_at") < lit(utcTs(d))))
    q.largerThan.foreach(n => msg = msg.filter(col("size_estimate") > n))
    q.smallerThan.foreach(n => msg = msg.filter(col("size_estimate") < n))

    msg
  }

  /** Search conditions for the stats surface (reference
    * buildStatsSearchConditions duckdb.go:588-647). Text terms filter on
    * the ACTIVE VIEW's key dimension for 1:N views — the stats query has
    * no participant/label joins, so each term becomes an EXISTS
    * (semi-join) against that dimension — keeping the headline totals
    * consistent with the aggregate rows on screen:
    *   - Recipients / RecipientNames: any to/cc/bcc participant whose
    *     email or display name contains the term;
    *   - Labels: any label whose name contains the term;
    *   - everything else: the default subject/snippet/from-sender match
    *     (email/name only — the aggregate-path semantics).
    * The reference special-cases ONLY those three 1:N views; Time and
    * SenderNames deliberately land in the default branch (its switch,
    * duckdb.go:602-635), so a Time-view search can show a matching
    * bucket while the header counts by subject/sender — faithful parity,
    * not a gap. Non-text operators are view-independent and shared.
    */
  def compileStatsSearch(msgIn: DataFrame, q: SearchQuery,
      groupBy: Option[ViewType] = None): DataFrame = {
    var msg = msgIn
    groupBy match {
      case Some(ViewType.Recipients) | Some(ViewType.RecipientNames) =>
        for (term <- q.textTerms) {
          val t = term.toLowerCase
          val ids = rcptIds(lower(p("email_address")).contains(t) ||
            lower(coalesce(p("display_name"), lit(""))).contains(t))
          msg = msg.join(ids, msg("id") === ids("message_id"), "left_semi")
        }
      case Some(ViewType.Labels) =>
        for (term <- q.textTerms) {
          val ids = labelIds(lower(lbl("name")).contains(term.toLowerCase))
          msg = msg.join(ids, msg("id") === ids("message_id"), "left_semi")
        }
      case _ =>
        for (term <- q.textTerms) {
          val t = term.toLowerCase
          val fromMatch = fromIds(lower(p("email_address")).contains(t) ||
              lower(coalesce(p("display_name"), lit(""))).contains(t))
            .withColumnRenamed("message_id", "__tm_id")
          val direct = lower(col("subject")).contains(t) ||
            lower(coalesce(col("snippet"), lit(""))).contains(t)
          msg = msg
            .join(fromMatch.withColumn("__from_hit", lit(true)),
              msg("id") === fromMatch("__tm_id"), "left")
            .filter(direct || col("__from_hit"))
            .drop("__from_hit", "__tm_id")
        }
    }
    applyNonText(msg, q, idCol = None)
  }
}

object FilterCompiler {

  /** Second-truncated time bound: every reference engine binds After /
    * Before as `Format("2006-01-02 15:04:05")` — a whole-second string —
    * uniformly across email, stats, text and search surfaces
    * (duckdb.go:563-567,658-663,861-866, duckdb_text.go:85-95,
    * sqlite.go:200-204). Callers passing sub-second timestamps must see
    * the same window the reference admits, so the bound is floored to
    * the second before binding (TZ-independent, unlike the day-granular
    * searchByDomains bounds).
    */
  def secTrunc(t: java.sql.Timestamp): java.sql.Timestamp =
    java.sql.Timestamp.from(
      t.toInstant.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))

  /** display_name → phone → email fallback chain (reference
    * shared.go:32-43 participantNameExpr) — columns must be qualified
    * against the participants frame to avoid ambiguity with
    * message_recipients.display_name after joins.
    */
  def participantNameOf(p: DataFrame): Column =
    coalesce(
      nullif(trim(p("display_name")), lit("")),
      nullif(p("phone_number"), lit("")),
      p("email_address"))

  /** Per-message from/to label tied to a message_recipients row (reference
    * shared.go:45-57 recipientNameExpr).
    */
  def recipientName(mrDisplay: Column, pDisplay: Column, pPhone: Column,
      pEmail: Column): Column =
    coalesce(
      nullif(trim(mrDisplay), lit("")),
      nullif(trim(pDisplay), lit("")),
      nullif(pPhone, lit("")),
      pEmail,
      lit(""))

  /** Time-bucket key (reference timeExpr duckdb.go:681-691). */
  def timeKey(g: TimeGranularity): Column = g match {
    case TimeGranularity.Year => col("year").cast("string")
    case TimeGranularity.Day => date_format(col("sent_at"), "yyyy-MM-dd")
    case TimeGranularity.Month =>
      concat(col("year").cast("string"), lit("-"),
        lpad(col("month").cast("string"), 2, "0"))
  }
}
