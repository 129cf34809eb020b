package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Streaming corpus curation — the continuous-ingest twin of the batch
  * `pipeline_curate` / `dedup_incremental` family: fresh document shards
  * land in a drop directory, and every micro-batch is quality-gated,
  * deduplicated (exactly within the batch, near-dup against a FROZEN
  * reference index AND against everything this stream already curated),
  * then appended to the curated corpus. This is the shape a 100 TB
  * training pipeline actually runs day-to-day: the full-corpus dedup is
  * the periodic batch job; the per-delivery increment must not rescan
  * the world.
  *
  * Scale/plan shape per micro-batch (all costs bounded by the BATCH, not
  * the corpus):
  *  - quality gate + exact dedup: one narrow pass over the batch
  *    (codegen'd [[TextFunctions.textStats]]; hash groupBy of batch rows).
  *  - near-dup vs the frozen index: [[Dedup.incrementalProbe]] — the
  *    batch's band rows broadcast against the prebuilt band table; the
  *    indexed corpus is touched only for candidate members (semi-join).
  *  - near-dup vs prior curated output: the stream maintains its OWN
  *    band-table sidecar (`bandsDir`), appended per batch — so probing
  *    "what I already kept" reads band rows (a few longs per doc), never
  *    re-shingles the curated corpus; curated text is loaded only for
  *    verify candidates, pruned by a member semi-join.
  *
  * Exactly-once: same discipline as [[VectorStreaming]] — foreachBatch is
  * at-least-once, so each micro-batch writes its docs AND its band rows
  * under its own `batch=<stream>-b<id>` partition with dynamic overwrite;
  * a replayed batch REPLACES its own partial output. Replays are also
  * deterministic: the prior-curated probe explicitly EXCLUDES the
  * current batch's own partition, so a half-written crash cannot make a
  * replay see (and dedup against) its own first attempt.
  *
  * Cross-batch semantics: arrival order wins — a doc near-dupping an
  * EARLIER batch's survivor is dropped, like the reference's ingest-time
  * Message-ID check admits the first copy and prunes later ones
  * (internal/dedup/dedup.go's scan order). Within one batch the winner
  * is the min doc id (the batch twin's contract). A near-dup of a doc
  * the quality gate rejected is NOT dropped — rejected docs never enter
  * any index.
  *
  * Caveats (documented, not silent): the per-batch sidecar band table is
  * bucket-capped per BATCH, not globally — a band bucket can exceed
  * `maxBucket` across many small batches; the periodic batch re-dedup
  * (which rebuilds the frozen index) is the backstop, exactly as the
  * reference's full `dedup --apply` pass backstops its ingest check.
  */
object DocStreaming {

  /** Drain every unconsumed document shard in `srcDir`: quality-gate,
    * dedup, append survivors to `curatedDir` (+ band sidecar to
    * `bandsDir`). Returns when the backlog is consumed. `indexed` is the
    * frozen reference corpus (`(id, text)`-shaped via `id`/`text`
    * columns); pass an empty frame to curate against nothing but the
    * stream's own history.
    */
  def runCurateAvailableNow(spark: SparkSession, srcDir: String,
      indexed: DataFrame, curatedDir: String, bandsDir: String,
      checkpoint: String, minQuality: Double = 0.35,
      threshold: Double = 0.8): Unit = {
    val schema =
      try spark.read.parquet(srcDir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.contains("UNABLE_TO_INFER_SCHEMA")) =>
          return // empty drop dir: steady state between deliveries
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(_.contains("PATH_NOT_FOUND")) =>
          System.err.println(
            s"[graft] doc-stream drain: source dir '$srcDir' does not " +
              "exist — treating as empty (no shards delivered yet). If " +
              "this repeats across drains, the path is misconfigured.")
          return
      }
    // the frozen index's band table is built ONCE per drain and persisted
    // — every micro-batch probes the same artifact (the production form
    // writes it next to the index and reads it back; the rebuild is the
    // batch pipeline's job, not the stream's)
    val idx = indexed.select(col("id").cast("long").as("id"),
      col("text").cast("string").as("text"))
    val bIdx = Dedup.indexedBandTable(idx, col("id"), col("text")).persist()
    bIdx.count()
    val streamTag = VectorStreaming.streamIdentity(spark, checkpoint)
    try {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          curateBatch(spark, batch, idx, bIdx, curatedDir, bandsDir,
            s"$streamTag-b$batchId", minQuality, threshold)
          ()
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally bIdx.unpersist(blocking = false)
  }

  /** One micro-batch of the curation pipeline; graft-private so the spec
    * and the scale probe can drive a single batch deterministically.
    */
  private[graft] def curateBatch(spark: SparkSession, batch: DataFrame,
      indexed: DataFrame, bIdx: DataFrame, curatedDir: String,
      bandsDir: String, tag: String, minQuality: Double,
      threshold: Double): Unit = {
    // 1. quality gate + WITHIN-batch exact dedup (min id per content) —
    //    one narrow pass, batch-bounded. Snapshot before the multi-read
    //    below (probe + two writes re-evaluate the frame otherwise).
    val fresh = batch
      .select(col("doc_id").cast("long").as("doc_id"),
        col("text").cast("string").as("text"))
      .filter(col("text").isNotNull &&
        TextFunctions.qualityScore(col("text")) >= minQuality)
      .groupBy(sha2(col("text").cast("binary"), 256).as("__h"))
      .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
      .localCheckpoint(true)

    // incrementalProbe applies the same (id, text) column exprs to both
    // sides — present the batch under the reference frames' column names
    val freshAsRef = fresh.select(col("doc_id").as("id"), col("text"))

    // ONE MinHash pass over the batch feeds the within-batch dedup, both
    // probes, AND the sidecar write below — without this the drain pays
    // the batch's most expensive text pass three extra times per delivery
    val freshBands = Dedup.freshBandRows(freshAsRef, col("id"), col("text"))
      .localCheckpoint(true)

    // 2. WITHIN-batch near-dup: min-id wins. Greedy drop of every id
    //    that loses at least one pair to a smaller id — matching
    //    [[Dedup.nearDuplicates]]'s id_a < id_b pair orientation.
    val within = Dedup.nearDuplicatesWithBands(fresh, col("doc_id"),
      col("text"),
      freshBands.select(col("band"), col("band_hash"),
        col("new_id").as("doc_id")),
      threshold).select(col("id_b").as("doc_id")).distinct()

    // 3. near-dup vs the frozen index (batch band rows broadcast against
    //    the prebuilt table; corpus touched only for candidate members)
    val vsIndex = Dedup.incrementalProbeWithBands(bIdx, indexed, freshAsRef,
      freshBands, col("id"), col("text"), threshold)
      .select(col("new_id").as("doc_id")).distinct()

    // 4. near-dup vs PRIOR curated output via the stream's own band
    //    sidecar — own-tag partitions excluded so a crash replay never
    //    dedups against its own first attempt
    val prior = readOrEmpty(spark, curatedDir,
      "doc_id bigint, text string, batch string")
      .filter(col("batch") =!= tag)
      .select(col("doc_id").as("id"), col("text"))
    val priorBands = readOrEmpty(spark, bandsDir,
      "band int, band_hash bigint, members array<bigint>, batch string")
      .filter(col("batch") =!= tag)
      .select(col("band"), col("band_hash"), col("members"))
    val vsPrior = Dedup.incrementalProbeWithBands(priorBands, prior,
      freshAsRef, freshBands, col("id"), col("text"), threshold)
      .select(col("new_id").as("doc_id")).distinct()

    val dropIds = within.union(vsIndex).union(vsPrior).distinct()
    val kept = fresh.join(dropIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // two writes below must see ONE survivor set

    // 5. exactly-once writes: docs + band sidecar, each under this
    //    batch's own partition, dynamic overwrite (replay = replace)
    def overwriteOwn(df: DataFrame, dir: String): Unit = {
      // dynamic overwrite only replaces partitions the frame EMITS — a
      // replay whose survivor set is EMPTY (the frozen index grew
      // between attempts and now rejects everything) writes no
      // partitions and deletes nothing, so the first attempt's rows
      // would stay live against the authoritative replay's verdict.
      // Deleting the own-tag partition first makes "a replayed batch
      // REPLACES its own partial output" hold unconditionally; a crash
      // between delete and write reads as "first attempt never
      // happened", which the replay covers.
      val own = new org.apache.hadoop.fs.Path(dir, s"batch=$tag")
      val fs = own.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(own)) { fs.delete(own, true); () }
      df.withColumn("batch", lit(tag))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(dir)
    }
    overwriteOwn(kept, curatedDir)
    // sidecar = the already-computed band rows filtered to survivors —
    // no re-shingle of kept
    overwriteOwn(
      Dedup.bandTableFromRows(
        freshBands.join(kept.select(col("doc_id").as("new_id")),
          Seq("new_id"), "left_semi")), bandsDir)
  }

  /** Read a partitioned sink that may not exist yet (first batch) —
    * a missing/empty dir is an empty frame of the declared schema.
    */
  private def readOrEmpty(spark: SparkSession, dir: String,
      ddl: String): DataFrame =
    try {
      // compaction-aware: excludes batch partitions shadowed by a
      // completed SinkCompaction pass (they may linger after a crash
      // mid-delete, and double-reading prior history would inflate the
      // candidate-verify work every drain)
      val df = SinkCompaction.read(spark, dir)
      // first write may be in flight for OTHER partitions only; missing
      // columns (never-written sink discovered as empty) fall through
      if (df.columns.isEmpty) emptyOf(spark, ddl) else df
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(c =>
            c.contains("PATH_NOT_FOUND") ||
              c.contains("UNABLE_TO_INFER_SCHEMA")) =>
        emptyOf(spark, ddl)
    }

  private def emptyOf(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))
}
