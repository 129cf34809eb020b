package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization strategy for eagerly-computed intermediate frames,
  * selected by the session conf `spark.graft.page.materialize`:
  *
  *   - `localCheckpoint` (default): blocks live on executors with NO
  *     lineage to recompute from. Fastest (no replication, no external
  *     IO), and re-reads never diverge from the first computation — but
  *     losing an executor mid-query FAILS the query instead of
  *     recomputing. The right default for local mode and for bounded
  *     page retries on a cluster (a failed page query is just re-run).
  *   - `persist`: MEMORY_AND_DISK cache, lineage kept. Executor loss
  *     silently recomputes the lost blocks from source — fault-tolerant,
  *     BUT a recompute may observe different data if the source moved
  *     (only sound over immutable inputs). For cluster jobs over frozen
  *     parquet snapshots this is the cheap fault-tolerant choice.
  *   - `checkpoint`: reliable checkpoint to `sc.setCheckpointDir` (HDFS/
  *     object store). Survives executor loss without recompute — the
  *     strong choice for long cluster jobs over live-ish sources. Throws
  *     if no checkpoint dir is configured (an explicit opt-in).
  *
  * Two entry points with different consistency contracts:
  *
  *   - [[bounded]] — page-sized or deterministically re-derivable frames
  *     (list/search pages in [[MsgEngine.enrich]], the curation survivor
  *     set): every mode above is sound; the conf is honored verbatim.
  *   - [[snapshot]] — frames whose whole PURPOSE is that every reader
  *     sees one fixed row set even while the source moves underneath
  *     ([[CacheBuilder.build]]'s new-slice snapshot: the watermark and
  *     the exports must derive from the SAME rows). `persist` is
  *     unsound here — a lost block's recompute re-scans the live source
  *     and can resurrect exactly the divergence the snapshot closes —
  *     so `persist` maps to `localCheckpoint` (fail-honest) and only
  *     `checkpoint` provides fault tolerance.
  */
object Materialize {
  val ConfKey = "spark.graft.page.materialize"

  /** How many non-default materializations to retain before releasing
    * the oldest. localCheckpoint self-cleans (the ContextCleaner
    * reclaims GC-unreachable RDD blocks), but `persist` pins each frame
    * in the CacheManager by STRONG reference and `checkpoint` writes
    * reliable files Spark never deletes by default
    * (spark.cleaner.referenceTracking.cleanCheckpoints=false) — a
    * long-lived engine paging per user query would otherwise grow
    * cache/storage unboundedly, one entry per page. The ring bounds
    * that: page frames are consumed within a call or two, so anything
    * `retain` materializations old is safely releasable.
    *
    * Concurrent-engine caveat: eviction is by COUNT, and a released
    * checkpoint frame has no lineage to recompute from — a query still
    * reading a frame when `retain` newer materializations land would
    * fail irrecoverably mid-flight (persist mode silently recomputes
    * instead, itself unsound on snapshot-adjacent paths). Concurrent
    * engines therefore either size `retain` above (max concurrent
    * queries × pages per query) or set the shared grace knob
    * `spark.graft.memo.releaseGraceMs` > 0: evicted frames are then
    * RETIRED and released only after the grace elapses (drained on
    * subsequent materializations), the same deferred-release contract
    * the memoized-index artifacts use.
    */
  val RetainConfKey = "spark.graft.page.materialize.retain"

  private val retained =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val retiring = new graft.RetireQueue[DataFrame](release)

  private def mode(df: DataFrame): String =
    df.sparkSession.conf.get(ConfKey, "localCheckpoint") match {
      case m @ ("localCheckpoint" | "persist" | "checkpoint") => m
      case other => throw new IllegalArgumentException(
        s"$ConfKey=$other (expected localCheckpoint|persist|checkpoint)")
    }

  /** Release one evicted frame: drop its CacheManager entry and, for a
    * reliable checkpoint, delete the checkpoint files (unpersist alone
    * cannot — they live outside the block manager).
    *
    * ROOT-ONLY on purpose: `checkpoint(true)` returns a plan whose root
    * IS the LogicalRDD, so matching the root releases exactly the
    * artifact the ring owns. Walking the whole analyzed tree (the r10
    * shape) unpersisted every LogicalRDD the frame was BUILT ON — in a
    * live engine that is the star's own localCheckpointed tables, which
    * have no lineage to recompute from, so evicting one page killed
    * every later query with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (found by
    * the r11 concurrent-engines soak). The ring must only free what it
    * owns; anything nested belongs to somebody else.
    */
  private def release(df: DataFrame): Unit =
    try {
      df.unpersist(false)
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(false)
          lr.rdd.getCheckpointFile.foreach { f =>
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(
              df.sparkSession.sessionState.newHadoopConf()).delete(p, true)
          }
        case _ => ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  private def graceMs(df: DataFrame): Long =
    try df.sparkSession.conf
      .get("spark.graft.memo.releaseGraceMs", "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def retain(df: DataFrame): DataFrame = {
    val cap =
      try df.sparkSession.conf.get(RetainConfKey, "32").toInt
      catch { case _: NumberFormatException => 32 }
    retained.add(df)
    retiring.drain()
    while (retained.size > math.max(cap, 1)) {
      val old = retained.poll()
      // the EVICTED frame's session decides its grace: the ring is
      // JVM-global, so the evicting caller can be a different session
      // whose grace=0 default must not override the owner's opt-in
      if (old != null) retiring.retireOrRelease(graceMs(old), old)
    }
    df
  }

  /** Eagerly materialize a bounded / deterministically re-derivable
    * frame under the configured strategy. All modes return the same
    * rows; they differ only in executor-loss behavior (see class doc).
    *
    * persist-mode caveat beyond executor loss: the CacheManager matches
    * cached plans structurally, so a plan-identical page query issued
    * after an IN-PLACE corpus rewrite can be served the pre-rewrite
    * cached rows until the ring evicts them — one more reason persist
    * is documented as sound only over immutable/frozen inputs.
    */
  def bounded(df: DataFrame): DataFrame = mode(df) match {
    case "persist" =>
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count() // eager, matching localCheckpoint(true)'s contract
      retain(p)
    case "checkpoint" => retain(df.checkpoint(true))
    case _ => df.localCheckpoint(true)
  }

  /** Eagerly materialize a consistency-critical snapshot. `persist` is
    * deliberately NOT honored (recompute-on-loss could observe a moved
    * source — see class doc); it degrades to fail-honest
    * `localCheckpoint`, and `checkpoint` is the fault-tolerant option.
    */
  def snapshot(df: DataFrame): DataFrame = mode(df) match {
    // ring-retained for the same reason as bounded(): the caller's own
    // release (CacheBuilder's finally) unpersists blocks but cannot
    // delete reliable checkpoint FILES — the ring eviction does
    case "checkpoint" => retain(df.checkpoint(true))
    case _ => df.localCheckpoint(true)
  }
}
