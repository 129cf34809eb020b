package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** As-of and range joins — the two join shapes analytics engines add on
  * top of equi-joins and that Spark has no native operator for. Both are
  * composed from native operators so Catalyst/AQE still plan them:
  * the as-of join is a union + single window (exactly the merge phase of
  * a sort-merge as-of), the range join is bin-bucketed into an equi-join.
  *
  * The reference pairs every message with the most recent prior state of
  * its thread/conversation when listing (conversation rollups,
  * internal/query/duckdb.go:1238-1320) — the as-of pattern; generalized
  * here to the standard (key, time) contract.
  */
object TemporalJoins {

  /** Backward as-of join: for each left row, the single most recent right
    * row of the same `key` with rightTs ≤ leftTs (within `toleranceNs`),
    * or nulls. Timestamps must be LONG (exact integer ns — the repo's
    * `ts_ns` convention; doubles/timestamps have equality subtleties).
    *
    * Plan: both sides are tagged and unioned (right sorts BEFORE left on
    * ties, making the match inclusive), then ONE window per key ordered
    * by (ts, side) carries the latest right row forward as a single
    * struct (`last(struct(...), ignoreNulls)` — struct-wrapped so a
    * matched row whose payload value is NULL is still the carried match),
    * and left rows are kept. That is the
    * merge phase of a sort-merge as-of join: one hash shuffle of each
    * side on `key`, a per-partition sort, an O(n) scan — no per-row
    * subquery, no nested loop. Keys parallelize across partitions; a
    * single key's rows are processed sequentially (inherent to as-of
    * semantics), so extreme key skew costs a long task, not a crash.
    *
    * Output: left columns + `asof_ts` (matched right timestamp) +
    * `payload` columns. Deterministic iff the right side is unique per
    * (key, rightTs) — pre-aggregate it otherwise; `payload` names must
    * not collide with left column names.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      toleranceNs: Long = Long.MaxValue): DataFrame = {
    require(left.schema(leftTs).dataType == LongType &&
      right.schema(rightTs).dataType == LongType,
      "as-of timestamps must be exact longs (ns)")
    require(payload.forall(p => !left.columns.contains(p)),
      "payload column names must not collide with left columns")
    // the output's computed columns would silently OVERWRITE same-named
    // left data columns (withColumn replaces)
    require(!left.columns.contains("asof_ts") &&
      Seq("__t", "__side", "__m").forall(r => !left.columns.contains(r)),
      "left columns must not be named asof_ts/__t/__side/__m (reserved)")
    // a payload named like a computed/internal column would collide in
    // the carry/select below (duplicate asof_ts at best, shadowing at
    // worst) — the left-column require above can't catch these
    require(payload.forall(p =>
      !Seq("asof_ts", "__t", "__side", "__m").contains(p)),
      "payload names asof_ts/__t/__side/__m are reserved")
    val lOnly = left.columns.toSeq.filterNot(c => c == key || c == leftTs)
    val rProj = right.select(
      (Seq(col(key), col(rightTs).as("__t")) ++ payload.map(col)): _*)
    val lp = left.select(
      Seq(col(key), col(leftTs).as("__t"), lit(1).as("__side")) ++
        lOnly.map(col) ++
        payload.map(p => lit(null).cast(rProj.schema(p).dataType).as(p)): _*)
    val rp = rProj.select(
      Seq(col(key), col("__t"), lit(0).as("__side")) ++
        lOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct per right row carried forward by a single last():
    // the when() is NULL for left rows but a NON-NULL struct for every
    // right row even when all its payload fields are NULL — so a matched
    // right row with a NULL payload value yields NULL (that row's own
    // value), never an older right row's non-null leaking through
    // ignoreNulls, and a multi-column payload can never mix fields from
    // different right rows. (One struct also means one WindowExec
    // expression instead of 1+|payload|.)
    val matchStruct = struct(
      (col("__t").as("asof_ts") +: payload.map(col)): _*)
    val carried = payload.foldLeft(
      lp.unionByName(rp)
        .withColumn("__m",
          last(when(col("__side") === 0, matchStruct), ignoreNulls = true)
            .over(w))
        .withColumn("asof_ts", col("__m").getField("asof_ts"))) { (df, p) =>
      df.withColumn(p, col("__m").getField(p))
    }
    val expired = col("asof_ts").isNull ||
      col("__t") - col("asof_ts") > toleranceNs
    val masked = (Seq("asof_ts") ++ payload).foldLeft(
      carried.filter(col("__side") === 1)) { (df, p) =>
      df.withColumn(p, when(expired, lit(null)).otherwise(col(p)))
    }
    masked.select(
      Seq(col(key), col("__t").as(leftTs)) ++ lOnly.map(col) ++
        (Seq("asof_ts") ++ payload).map(col): _*)
  }

  /** Range (interval) join without an equi-key: point rows join interval
    * rows where lo ≤ v < hi. Spark's native plan for that predicate is a
    * broadcast nested loop — fine while the interval side broadcasts,
    * quadratic death otherwise. Binning makes it an equi-join: each
    * interval explodes to the bins it covers, each point maps to exactly
    * ONE bin (floor(v/binWidth)), so the bin equi-join emits every
    * qualifying pair exactly once (no post-dedup) and the residual
    * lo/hi filter runs inside the join. Scales as a plain shuffled
    * join — AQE balances the bin buckets. Pick binWidth ≈ the median
    * interval length: wider bins cut the interval explode factor but
    * admit more non-matching pairs to the residual filter.
    *
    * Column names must be disjoint between the two frames.
    */
  def binnedRangeJoin(points: DataFrame, value: String,
      intervals: DataFrame, lo: String, hi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "point/interval column names must be disjoint")
    val ivb = intervals.withColumn("__bin", explode(sequence(
      floor(col(lo) / binWidth).cast("long"),
      floor(col(hi) / binWidth).cast("long"))))
    val ptb = points.withColumn("__bin",
      floor(col(value) / binWidth).cast("long"))
    ptb.join(ivb, Seq("__bin"))
      .filter(col(value) >= col(lo) && col(value) < col(hi))
      .drop("__bin")
  }
}
