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

  private def mode(df: DataFrame): String =
    df.sparkSession.conf.get(ConfKey, "localCheckpoint") match {
      case m @ ("localCheckpoint" | "persist" | "checkpoint") => m
      case other => throw new IllegalArgumentException(
        s"$ConfKey=$other (expected localCheckpoint|persist|checkpoint)")
    }

  /** Eagerly materialize a bounded / deterministically re-derivable
    * frame under the configured strategy. All modes return the same
    * rows; they differ only in executor-loss behavior (see class doc).
    */
  def bounded(df: DataFrame): DataFrame = mode(df) match {
    case "persist" =>
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count() // eager, matching localCheckpoint(true)'s contract
      p
    case "checkpoint" => df.checkpoint(true)
    case _ => df.localCheckpoint(true)
  }

  /** Eagerly materialize a consistency-critical snapshot. `persist` is
    * deliberately NOT honored (recompute-on-loss could observe a moved
    * source — see class doc); it degrades to fail-honest
    * `localCheckpoint`, and `checkpoint` is the fault-tolerant option.
    */
  def snapshot(df: DataFrame): DataFrame = mode(df) match {
    case "checkpoint" => df.checkpoint(true)
    case _ => df.localCheckpoint(true)
  }
}
