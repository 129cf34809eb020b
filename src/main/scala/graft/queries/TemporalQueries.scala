package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.TemporalJoins

/** As-of and range join query entries over the events table. The as-of
  * oracle is DuckDB's native ASOF JOIN — the gate proves the union+window
  * construction reproduces the real operator's semantics (inclusive
  * backward match, left-join nulls) bit-for-bit; the range-join oracle is
  * the plain inequality join the binned plan must be equivalent to.
  */
object TemporalQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** For every purchase, the most recent click (≤, same user): classic
    * attribution as-of. The click side is pre-aggregated to one row per
    * (user, ts) — the determinism contract of [[TemporalJoins.asofJoinBackward]]
    * (and what makes the DuckDB ASOF tie-break irrelevant). Times are µs
    * longs on both sides: DuckDB reads the nanos parquet at µs
    * resolution, so ns would mismatch in the last three digits.
    */
  def joinAsof(s: SparkSession, dir: String): DataFrame = {
    // `div` = integer division: ts_ns / 1000 via `/` would round-trip a
    // ~1.7e18 long through double (53-bit mantissa) and gain ±1 µs
    val ev = t(s, dir, "events")
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val probe = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val ref = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us").as("ref_ts"))
      .agg(max(col("value")).as("click_value"))
    bucketOrdered(
      TemporalJoins.asofJoinBackward(probe, ref, "user_id",
        leftTs = "ts_us", rightTs = "ref_ts", payload = Seq("click_value"))
        .select(col("event_id"), col("user_id"),
          col("asof_ts").as("click_t"),
          (col("ts_us") - col("asof_ts")).as("gap_us"),
          col("click_value")),
      col("event_id"))
  }

  val joinAsofSql: String =
    s"""WITH probe AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t
      |  FROM events WHERE event_type = 'purchase'),
      |ref AS (
      |  SELECT user_id, epoch_us(ts) AS t, max(value) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id, r.t AS click_t, p.t - r.t AS gap_us,
      |       r.click_value
      |FROM probe p ASOF LEFT JOIN ref r
      |  ON p.user_id = r.user_id AND p.t >= r.t
      |ORDER BY ${duckBucket("p.event_id")}, p.event_id ASC""".stripMargin

  /** Events bucketed into overlapping value bands (one band per nation
    * row — a pure range predicate, no equi-key): per-band event count and
    * exact value total. Exercises interval overlap (bands overlap their
    * neighbors) and the binned equi-join rewrite of the range predicate.
    */
  def joinRange(s: SparkSession, dir: String): DataFrame = {
    val points = t(s, dir, "events").select(col("event_id"), col("value"))
    val bands = t(s, dir, "nation").select(col("n_name").as("band"),
      (col("n_nationkey") * 18.0).as("lo"),
      (col("n_nationkey") * 18.0 + 50.0).as("hi"))
    orderedAtTail(
      TemporalJoins.binnedRangeJoin(points, "value", bands, "lo", "hi",
        binWidth = 25.0)
        .groupBy(col("band"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_events"),
          CoreQueries.dsum(col("value")).as("total_value")),
      col("band").asc)
  }

  val joinRangeSql: String =
    """WITH iv AS (
      |  SELECT n_name AS band, n_nationkey * 18.0 AS lo,
      |         n_nationkey * 18.0 + 50.0 AS hi
      |  FROM nation)
      |SELECT band, lo, hi, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events e JOIN iv ON e.value >= iv.lo AND e.value < iv.hi
      |GROUP BY 1, 2, 3 ORDER BY band ASC""".stripMargin

  /** Batch twin of the watermarked stream-stream interval join
    * ([[graft.streaming.EventsStreaming.runAttributionJoinAvailableNow]],
    * whose streaming==batch equivalence is spec-tested): purchases paired
    * with same-user clicks from the preceding hour.
    */
  def streamJoinPairs(s: SparkSession, dir: String): DataFrame =
    bucketOrdered(
      graft.streaming.EventsStreaming.attributionPairs(t(s, dir, "events")),
      col("purchase_id"), col("click_id").asc)

  val streamJoinPairsSql: String =
    s"""WITH p AS (
      |  SELECT user_id AS u, event_id AS pid, ts AS pt
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id AS u, event_id AS cid, ts AS ct
      |  FROM events WHERE event_type = 'click')
      |SELECT p.pid AS purchase_id, c.cid AS click_id, p.u AS user_id
      |FROM p JOIN c ON p.u = c.u
      |  AND c.ct BETWEEN p.pt - INTERVAL 1 HOUR AND p.pt
      |ORDER BY ${duckBucket("p.pid")}, purchase_id ASC, click_id ASC""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "join_asof" -> (joinAsof _, Some(joinAsofSql)),
    "join_range" -> (joinRange _, Some(joinRangeSql)),
    "stream_join_pairs" -> (streamJoinPairs _, Some(streamJoinPairsSql)))
}
