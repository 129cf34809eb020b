package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Mime

/** Archive integrity audit — the analytics half of the reference's
  * `msgvault verify` (cmd/verify.go:26-200): count live messages, count
  * raw-MIME coverage, and prove the stored blobs actually decompress.
  * The reference SAMPLES N random messages because it runs single-node
  * against SQLite; the distributed form verifies EVERY blob — a full
  * integrity scan is exactly the kind of embarrassingly parallel pass a
  * cluster makes cheap (one scan, per-row inflate, one small rollup).
  * (The Gmail-side count comparison is the sync connector's half —
  * upstream per SURVEY §7.)
  */
object ArchiveVerify {

  /** Per-source audit over live messages joined to the raw sidecar:
    * n_messages, n_with_raw, n_raw_ok (stored bytes inflate cleanly —
    * plain blobs count as ok when present), n_raw_corrupt,
    * ⁺r13 n_mime_ok (the inflated bytes also pass the structural MIME
    * check — the reference's second sample verification,
    * `mime.Parse(rawData)` at verify.go:241-247: a blob can inflate
    * cleanly yet not be a message; [[Mime.looksLikeMime]] is the
    * tolerant structural proxy), and the coverage percentage (2 dp,
    * matching the report format of verify.go:141-150).
    *
    * Scale shape: one scan of each side, the inflate UDF touches only
    * rows that HAVE raw bytes (and runs ONCE per blob — the mime check
    * reads the same inflated column), and the rollup output is
    * |sources| rows.
    */
  def auditRaw(messages: DataFrame, raw: DataFrame,
      sources: DataFrame): DataFrame = {
    val live = messages.filter(col("deleted_at").isNull)
      .select(col("id"), col("source_id"))
    val checked = raw.select(col("message_id"),
      when(col("compression") === "zlib",
        Mime.inflateUdf(col("raw_data")))
        .otherwise(col("raw_data")).as("__bytes"))
      .select(col("message_id"),
        col("__bytes").isNotNull.as("__raw_ok"),
        Mime.looksLikeMimeUdf(col("__bytes")).as("__mime_ok"))
      // one verdict per message even when the sidecar holds duplicate
      // blob rows (a crashed re-ingest can append a second copy — the
      // exact state an audit exists to catch): ANDed, so a message is ok
      // only when EVERY stored blob inflates, and the left join below
      // cannot multiply live rows (n_messages stays = live count,
      // raw_pct stays <= 100)
      .groupBy(col("message_id")).agg(min(col("__raw_ok")).as("__raw_ok"),
        min(col("__mime_ok")).as("__mime_ok"))
    live.join(checked, live("id") === checked("message_id"), "left")
      .groupBy(col("source_id"))
      .agg(
        count(lit(1)).as("n_messages"),
        sum(when(col("__raw_ok").isNotNull, 1L).otherwise(0L))
          .as("n_with_raw"),
        sum(when(col("__raw_ok") === true, 1L).otherwise(0L)).as("n_raw_ok"),
        sum(when(col("__raw_ok") === false, 1L).otherwise(0L))
          .as("n_raw_corrupt"),
        sum(when(col("__raw_ok") === true && col("__mime_ok") === true, 1L)
          .otherwise(0L)).as("n_mime_ok"))
      // LEFT join: a live message whose source row is missing (deleted or
      // corrupt) is referential breakage the audit must REPORT, not a
      // row-drop condition — it surfaces as source_type '(unknown)'
      .join(broadcast(sources.select(col("id").as("source_id"),
        col("source_type"))), Seq("source_id"), "left")
      .withColumn("source_type", coalesce(col("source_type"),
        lit("(unknown)")))
      // 2-dp percentage via EXACT integer round-half-up, one double
      // division at the end: round(x*100.0/n, 2) over a double quotient
      // is engine-dependent at decimal ties (Spark rounds the shortest
      // decimal rendering via BigDecimal, DuckDB rounds the binary
      // double — 107/4000 → 2.68 vs 2.67), so the report would flake at
      // corpus sizes landing on a .xx5 tie. Integer basis points are
      // tie-free and /100.0 is one correctly-rounded op on both engines.
      .withColumn("raw_pct",
        expr("(n_with_raw * 20000 + n_messages) div (2 * n_messages)")
          .cast("double") / 100.0)
  }
}
