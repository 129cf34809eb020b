package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Query registries (Core/Doc/Search) consumed by [[graft.SparkEntry]].
  *
  * Result-edge ordering discipline: every query ends in a deterministic
  * total order (reference is explicit about tie-breaks,
  * internal/vector/hybrid/rrf.go:64-75), but a bare un-limited `orderBy`
  * compiles to a range exchange whose partitioner SAMPLING JOB executes
  * the child plan a second time — for a map-only pipeline that doubles
  * the query's real work just to sort a few thousand result rows
  * (`orderBy(...).limit(k)` is exempt: it compiles to
  * TakeOrderedAndProject, no sampling). Small final results therefore
  * sort on a single partition:
  */
package object queries {

  /** Total order for a small result of a MAP-ONLY pipeline: one
    * round-robin shuffle of the already-computed result rows (upstream
    * stays parallel, nothing re-executes), then an in-partition sort.
    * `coalesce(1)` would be wrong here — with no shuffle boundary above,
    * it collapses the whole scan+compute stage to one task.
    */
  private[queries] def orderedViaShuffle(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** Total order for a small result ABOVE a shuffle (agg/join/window):
    * coalesce the reduce side to one task and sort in place — no extra
    * exchange at all. Only for results small enough that a single-task
    * reduce is free (≤ ~100k narrow rows).
    */
  private[queries] def orderedAtTail(df: DataFrame, cols: Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols: _*)

  /** DuckDB twins of [[graft.operators.Similarity.dot]]/`cosine` — the
    * same index-order double folds, composed into larger oracle strings.
    */
  private[queries] def duckDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p,q) -> p+q)"

  private[queries] def duckCos(a: String, b: String): String =
    s"${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  /** Shared oracle fragment (`n` + `cents` CTEs): replays
    * [[graft.operators.Similarity.strideCentroids]] — md5-stride pick,
    * nList 16 — over `src`. ONE definition for every oracle that probes
    * the shared assignment artifact: three hand-maintained copies of
    * this block already drifted once (the md5-stride fix touched each
    * separately).
    */
  private[queries] def duckCentsCtes(src: String): String =
    s"""n AS (SELECT count(*) AS cnt FROM $src),
       |cents AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
       |  FROM $src, n
       |  WHERE CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |        % greatest(1, cnt // 16) = 0
       |  ORDER BY vec_id LIMIT 16)""".stripMargin

  /** [[duckCentsCtes]] + the argmax assignment replay of
    * [[graft.operators.Similarity.semanticAssign]] (ties → higher cid,
    * matching `greatest(struct)`), ending in an `assigned` CTE.
    */
  private[queries] def duckAssignedCtes(src: String): String =
    s"""${duckCentsCtes(src)},
       |scored AS (
       |  SELECT e.vec_id, e.embedding, c.cid,
       |    ${duckCos("e.embedding", "c.cvec")} AS s
       |  FROM $src e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, embedding, cid AS cluster
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
       |                  ORDER BY s DESC, cid DESC) AS rn FROM scored)
       |  WHERE rn = 1)""".stripMargin

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), AnyRef]()

  /** Build-once/search-many memo for derived index structures (inverted
    * index postings, IVF centroid assignment). The reference's FTS5 and
    * vec0 indexes are PERSISTENT — built at ingest, reused by every
    * search — so a search query's cost should be probe + hydrate, not a
    * per-query corpus re-index. Keyed per (session, sfDir); the builder
    * decides what to persist/materialize.
    */
  private[queries] def memoizedIndex[T <: AnyRef](s: SparkSession, dir: String,
      key: String)(build: => T): T = {
    val k = (System.identityHashCode(s), dir, key)
    val hit = memo.get(k)
    if (hit != null) hit.asInstanceOf[T]
    else {
      // The build runs OUTSIDE computeIfAbsent on purpose: builds nest
      // (cluster labels build from the memoized pair table), and a nested
      // computeIfAbsent on the SAME map throws "Recursive update" whenever
      // the inner entry happens to land in the outer entry's bin — a
      // hash-layout-dependent landmine that only fires when unrelated
      // keys shift the table. The cost is a possible duplicate build under
      // a concurrent race (builds are idempotent; putIfAbsent keeps the
      // first winner) — correct, where the locked form is crash-prone.
      val v = build
      val prev = memo.putIfAbsent(k, v)
      if (prev != null) {
        // race loser: release its persisted blocks before discarding —
        // builds typically persist+count, and a dropped-but-persisted
        // DataFrame would pin executor memory for the session's lifetime.
        // Composite artifacts (IvfIndex.Index, tuples of frames) hold
        // their persisted frames one wrapper deep, so walk Products —
        // but NOT collections: scala List is itself a Product (`::`),
        // so element-wise recursion over a long memoized list (centroid
        // seqs, weight tables) would take one stack frame per element
        // and can StackOverflowError right here in the loser path.
        // Collections in artifacts carry plain data, never persisted
        // frames; only tuple/case-class wrappers are walked.
        def release(x: Any): Unit = x match {
          case df: DataFrame => df.unpersist(false); ()
          case _: Iterable[_] => ()
          case p: Product => p.productIterator.foreach(release)
          case _ => ()
        }
        release(v)
        prev.asInstanceOf[T]
      } else v.asInstanceOf[T]
    }
  }
}
