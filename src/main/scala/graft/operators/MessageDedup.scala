package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.MsgVault
import graft.functions.Mime

/** The msgvault archive dedup pipeline (reference: internal/dedup/dedup.go):
  *
  *   1. primary pass — group live messages by RFC822 Message-ID within the
  *      scoped sources (never across accounts unless the caller passes a
  *      multi-source collection scope, dedup.go:1-36);
  *   2. Message-ID backfill — recover missing ids from stored raw MIME
  *      before grouping (dedup.go:246-303);
  *   3. content-hash fallback — messages not matched by pass 1 are grouped
  *      by sha256 of transport-header-normalized raw MIME
  *      (dedup.go:505-600, 673-758);
  *   4. survivor selection — sent copies outrank everything, then source
  *      type preference, has-raw-MIME, label count, earliest archived_at,
  *      lowest id (dedup.go:755-822);
  *   5. outputs — (loser_id, winner_id) prune pairs, label transfers, and
  *      same-source remote-deletion candidates (gmail only,
  *      dedup.go:832-900).
  *
  * Spark design: every pass is a key-shuffle (`groupBy` Message-ID / hash)
  * with survivor selection as ONE window `row_number` over a preference
  * ordering — no driver-side loops, no global state; the expensive
  * inflate→normalize→sha2 step is a per-row map over only the rows that
  * still need it (pass-1 matches are anti-joined away first).
  */
object MessageDedup {

  /** DefaultSourcePreference (dedup.go:137-139): earlier wins. */
  val defaultSourcePreference: Seq[String] = Seq("gmail", "imap", "mbox", "emlx", "hey")

  /** Source types eligible for remote-deletion staging (dedup.go:143-145). */
  val remoteSourceTypes: Set[String] = Set("gmail")

  final case class Config(
      sourcePreference: Seq[String] = defaultSourcePreference,
      sourceIds: Seq[Long] = Nil,
      contentHashFallback: Boolean = false)

  /** Enriched per-message frame with every survivor-selection signal:
    * source_type, label_count, has_sent_label, is_from_me,
    * matched_identity, has_raw, archived_at.
    *
    * @param identities optional (source_id, email) account-identity pairs —
    *        a From: match marks the message a sent copy for ITS source only
    *        (dedup.go:118-127)
    * @param raw optional message_raw frame (message_id, raw_data binary,
    *        compression)
    */
  private def enriched(v: MsgVault, cfg: Config,
      identities: Option[DataFrame], raw: Option[DataFrame]): DataFrame = {
    // both soft-delete columns: the reference scans with
    // LiveMessagesWhere(_, hideDeletedFromSource = true) in BOTH dedup
    // passes — a source-deleted ghost must never join a group (it could
    // win survivor selection and get a live message pruned)
    var msg = v.messages.filter(
      col("deleted_at").isNull && col("deleted_from_source_at").isNull)
    if (cfg.sourceIds.nonEmpty)
      msg = msg.filter(col("source_id").isin(cfg.sourceIds: _*))

    val src = v.sources.select(col("id").as("__src_id"),
      coalesce(col("source_type"), lit("")).as("source_type"))

    val lblCount = v.messageLabels.groupBy(col("message_id").as("__lc_mid"))
      .agg(count(lit(1)).as("label_count"))

    // system SENT label: match the provider label id too when the schema
    // carries it (reference checks source_label_id = 'SENT' in addition
    // to the display name, which can be localized)
    val sentLabelPred =
      if (v.labels.columns.contains("source_label_id"))
        upper(col("name")) === "SENT" ||
          upper(coalesce(col("source_label_id"), lit(""))) === "SENT"
      else upper(col("name")) === "SENT"
    val sentIds = v.messageLabels
      .join(v.labels.filter(sentLabelPred),
        v.labels("id") === v.messageLabels("label_id"), "left_semi")
      .select(col("message_id").as("__sent_mid")).distinct()
      .withColumn("__has_sent", lit(true))

    // From: address per message for identity matching
    val fromEmail = v.recipients.filter(col("recipient_type") === "from")
      .join(v.participants,
        v.participants("id") === v.recipients("participant_id"))
      .groupBy(v.recipients("message_id").as("__fe_mid"))
      .agg(min_by(lower(v.participants("email_address")),
        v.recipients("participant_id")).as("from_email"))

    val rawFlag = raw.map(_.select(col("message_id").as("__raw_mid"))
      .distinct().withColumn("__has_raw", lit(true)))

    var e = msg
      .join(src, col("source_id") === col("__src_id"), "left")
      .join(lblCount, msg("id") === col("__lc_mid"), "left")
      .join(sentIds, msg("id") === col("__sent_mid"), "left")
      .join(fromEmail, msg("id") === col("__fe_mid"), "left")
    e = rawFlag.fold(e.withColumn("__has_raw", lit(false)))(rf =>
      e.join(rf, msg("id") === col("__raw_mid"), "left"))
    e = identities.fold(e.withColumn("matched_identity", lit(false))) { ids =>
      val idSet = ids.select(col("source_id").as("__id_src"),
        lower(col("email")).as("__id_email")).distinct()
        .withColumn("__id_hit", lit(true))
      e.join(idSet, e("source_id") === col("__id_src") &&
          col("from_email") === col("__id_email"), "left")
        .withColumn("matched_identity", coalesce(col("__id_hit"), lit(false)))
    }

    val archived = if (e.columns.contains("archived_at")) col("archived_at")
      else lit(null).cast("timestamp")
    e.select(msg("id"), col("source_id"), col("source_type"),
      col("rfc822_message_id"),
      coalesce(col("label_count"), lit(0L)).as("label_count"),
      coalesce(col("__has_sent"), lit(false)).as("has_sent_label"),
      coalesce(col("is_from_me"), lit(false)).as("is_from_me"),
      col("matched_identity"),
      coalesce(col("__has_raw"), lit(false)).as("has_raw"),
      archived.as("archived_at"))
  }

  /** IsSentCopy (dedup.go:193-200): OR of the three signals. */
  private val isSentCopy: Column =
    col("has_sent_label") || col("is_from_me") || col("matched_identity")

  /** Rank columns shared by the survivor sort and the prefix-class
    * window (the archived_at rule needs the tie-SET these define).
    */
  private def sentRank: Column =
    when(col("__any_sent") && !isSentCopy, 1).otherwise(0)
  private def rawRank: Column = when(col("has_raw"), 0).otherwise(1)
  private def prefRank(cfg: Config): Column =
    cfg.sourcePreference.zipWithIndex
      .foldLeft(when(lit(false), 0)) { case (acc, (st, i)) =>
        acc.when(col("source_type") === st, i)
      }.otherwise(cfg.sourcePreference.length)

  /** Survivor ordering within a group (dedup.go:769-822), as window sort
    * keys — row_number 1 is the survivor:
    *   1. sent copies first when the group has any (the candidate-set
    *      restriction expressed as a rank on the pre-materialized
    *      `__any_sent` group flag — a window expression can't nest inside
    *      another window's ordering),
    *   2. source-type preference (unknown types last),
    *   3. has raw MIME,
    *   4. more labels,
    *   5. archived_at — the reference's isBetter compares it only when
    *      BOTH sides are non-zero and otherwise falls to id, which makes
    *      the pairwise fold non-transitive; but selectSurvivor folds the
    *      group in id-ASC order (store/dedup.go:143 `ORDER BY m.id`), and
    *      that fold has an exact closed form (r13 audit): within the
    *      tie-set on keys 1-4, IF the lowest-id member has NULL
    *      archived_at it survives (a later member can never beat it — the
    *      both-non-zero guard fails and its id is higher); OTHERWISE the
    *      minimum non-null archived_at survives (nulls never displace a
    *      dated best, a smaller date always does). Expressed as: archived
    *      participates (nulls last) unless the class ANCHOR — first id of
    *      the tie-set, `__class_anchor_null` — is null,
    *   6. lowest id.
    */
  private def survivorOrder(cfg: Config): Seq[Column] = Seq(
    sentRank.asc,
    prefRank(cfg).asc,
    rawRank.asc,
    col("label_count").desc,
    when(!col("__class_anchor_null"), col("archived_at")).asc_nulls_last,
    col("id").asc)

  /** Group, pick the survivor, and tag each member with its winner_id —
    * shared by both passes. One shuffle on the key; two window passes over
    * the already-partitioned data.
    */
  private def withWinner(members: DataFrame, key: Column, cfg: Config): DataFrame = {
    val gw = Window.partitionBy(key)
    members
      .withColumn("__gsize", count(lit(1)).over(gw))
      .filter(col("__gsize") > 1)
      .withColumn("__any_sent", max(isSentCopy).over(gw))
      // the prefix-CLASS anchor (survivorOrder key 5): first id of the
      // tie-set on keys 1-4; ordered first() with the default running
      // frame returns the partition's first row's value for every row
      .withColumn("__class_anchor_null",
        first(col("archived_at").isNull).over(
          Window.partitionBy(key, sentRank, prefRank(cfg), rawRank,
            col("label_count")).orderBy(col("id"))))
      .withColumn("__rn", row_number().over(gw.orderBy(survivorOrder(cfg): _*)))
      .withColumn("winner_id", min(when(col("__rn") === 1, col("id"))).over(gw))
  }

  /** Scan result: one row per (group member) with its group key/type and
    * the group's chosen winner_id — losers are the rows with
    * id =!= winner_id.
    */
  def scan(v: MsgVault, cfg: Config = Config(),
      identities: Option[DataFrame] = None,
      raw: Option[DataFrame] = None): DataFrame = {
    val base = enriched(v, cfg, identities, raw)

    // Message-ID backfill from raw MIME where the column is null
    // (dedup.go:246-303) — only the rows that NEED it touch the UDFs: the
    // raw frame is semi-joined to null-Message-ID messages first, so an
    // archive that is 99% backfilled decompresses 1% of its blobs.
    val withMid = raw match {
      case Some(r) =>
        val needing = base.filter(col("rfc822_message_id").isNull ||
            col("rfc822_message_id") === "")
          .select(base("id").as("__need_id"))
        val backfill = r
          .join(needing, col("message_id") === col("__need_id"), "left_semi")
          .select(col("message_id").as("__r_mid"),
            when(coalesce(col("compression"), lit("")) === "zlib",
              Mime.inflateUdf(col("raw_data"))).otherwise(col("raw_data")).as("__r_raw"))
          .select(col("__r_mid"),
            Mime.extractMessageIdUdf(col("__r_raw")).as("__r_extracted"))
        base.join(backfill, base("id") === col("__r_mid"), "left")
          // the `needing` set includes EMPTY-STRING ids, so the fill must
          // too — a bare coalesce only fills NULLs, leaving a "" row to
          // pay the inflate+extract cost and then discard the result
          .withColumn("mid",
            when(col("rfc822_message_id").isNull ||
              col("rfc822_message_id") === "", col("__r_extracted"))
              .otherwise(col("rfc822_message_id")))
          .drop("__r_mid", "__r_extracted")
      case None => base.withColumn("mid", col("rfc822_message_id"))
    }

    // pass 1: Message-ID groups with >1 member
    val withKey = withMid.filter(col("mid").isNotNull && col("mid") =!= "")
    val pass1 = withWinner(withKey, col("mid"), cfg)
      .select(col("id"), col("source_id"), col("source_type"),
        col("mid").as("group_key"), lit("message-id").as("key_type"),
        col("winner_id"))

    if (!cfg.contentHashFallback || raw.isEmpty) return pass1

    // pass 2: content-hash fallback. The reference excludes only pass-1
    // LOSERS (dedup.go:394-406): survivors stay eligible so orphan
    // messages with identical content can still link to them. Guards on
    // mixed groups (dedup.go:425-460):
    //   - a group with ≥2 Message-ID survivors is skipped (merging them
    //     would undo pass-1 decisions);
    //   - a group with a survivor AND a sent-copy orphan is skipped;
    //   - a group containing exactly one Message-ID survivor forces that
    //     survivor to win (demoting it would destroy its absorbed labels).
    val r = raw.get
    val p1Losers = pass1.filter(col("id") =!= col("winner_id"))
      .select(col("id").as("__p1_loser"))
    val p1Winners = pass1.select(col("winner_id").as("__p1_winner")).distinct()
    val remaining = withMid
      .join(p1Losers, withMid("id") === col("__p1_loser"), "left_anti")
    val hashed = remaining
      .join(r.select(col("message_id").as("__r_mid"), col("raw_data"),
        col("compression")), remaining("id") === col("__r_mid"))
      .withColumn("__inflated",
        when(coalesce(col("compression"), lit("")) === "zlib",
          Mime.inflateUdf(col("raw_data"))).otherwise(col("raw_data")))
      .withColumn("__norm", Mime.normalizeRawMimeUdf(col("__inflated")))
      .filter(col("__norm").isNotNull)
      .withColumn("chash", sha2(col("__norm"), 256))
      // drop the MIME blobs BEFORE the winner window: its
      // partitionBy(chash) shuffles full rows, and without this
      // projection every message ships ~3 copies of its decompressed
      // MIME (raw_data, __inflated, __norm) across the cluster just to
      // carry a 64-char hash — the per-row map this pass promises must
      // shuffle keys and survivor signals only
      .drop("raw_data", "compression", "__inflated", "__norm", "__r_mid")
      .join(p1Winners.withColumn("__is_p1_survivor", lit(true)),
        col("id") === col("__p1_winner"), "left")
      .withColumn("__is_p1_survivor",
        coalesce(col("__is_p1_survivor"), lit(false)))

    val hw = Window.partitionBy(col("chash"))
    val pass2 = withWinner(hashed, col("chash"), cfg)
      .withColumn("__n_survivors",
        sum(when(col("__is_p1_survivor"), 1L).otherwise(0L)).over(hw))
      .withColumn("__has_sent_orphan",
        max(!col("__is_p1_survivor") && isSentCopy).over(hw))
      .filter(col("__n_survivors") < 2)
      .filter(!(col("__n_survivors") === 1 && col("__has_sent_orphan")))
      .withColumn("winner_id",
        when(col("__n_survivors") === 1,
          min(when(col("__is_p1_survivor"), col("id"))).over(hw))
          .otherwise(col("winner_id")))
      .select(col("id"), col("source_id"), col("source_type"),
        col("chash").as("group_key"), lit("normalized-hash").as("key_type"),
        col("winner_id"))

    pass1.unionByName(pass2)
  }

  /** (loser_id, winner_id) prune pairs — the merge-job input
    * (dedup.go:852-861): soft-delete losers, keep winner.
    */
  def losers(scanned: DataFrame): DataFrame =
    scanned.filter(col("id") =!= col("winner_id"))
      .select(col("id").as("loser_id"), col("winner_id"), col("key_type"))

  /** Labels to union onto each winner: labels of its losers it does not
    * already carry (dedup.go Execute label transfer; summary
    * LabelsTransferred).
    */
  def labelTransfers(v: MsgVault, scanned: DataFrame): DataFrame = {
    val l = losers(scanned)
    val loserLabels = v.messageLabels
      .join(l, v.messageLabels("message_id") === l("loser_id"))
      .select(col("winner_id"), col("label_id")).distinct()
    val winnerLabels = v.messageLabels
      .select(col("message_id").as("__w_mid"), col("label_id").as("__w_lbl"))
    loserLabels.join(winnerLabels,
        col("winner_id") === col("__w_mid") && col("label_id") === col("__w_lbl"),
        "left_anti")
      .select(col("winner_id"), col("label_id"))
  }

  /** Remote-deletion staging candidates: pruned copies that (1) live in a
    * remote source type and (2) share source_id with their survivor — the
    * load-bearing same-mailbox rule (dedup.go:102-112, 143-145).
    */
  def remoteDeletionCandidates(v: MsgVault, scanned: DataFrame): DataFrame = {
    val winners = scanned.filter(col("id") === col("winner_id"))
      .select(col("winner_id").as("__w_id"), col("source_id").as("__w_src"))
      .distinct()
    scanned.filter(col("id") =!= col("winner_id"))
      .filter(col("source_type").isin(remoteSourceTypes.toSeq: _*))
      .join(winners, col("winner_id") === col("__w_id") &&
        col("source_id") === col("__w_src"))
      .select(col("id").as("loser_id"), col("winner_id"), col("source_id"),
        col("source_type"))
  }
}
