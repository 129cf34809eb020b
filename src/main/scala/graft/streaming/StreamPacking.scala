package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Packing

/** Streaming INCREMENTAL packing — the continuous-ingest twin of
  * [[graft.operators.Packing.packPlacement]]: document shards land in a
  * drop directory and every micro-batch's documents are appended to the
  * global concat-and-chunk token stream at the stream's running offset.
  * This is the day-to-day shape of continuous-pretraining batch
  * assembly: the full-corpus placement is the periodic batch job; the
  * per-delivery increment must not rescan the world.
  *
  * Semantics: documents are packed in (arrival batch, id) order. When
  * deliveries are contiguous ascending id ranges (the backfill/replay
  * shape), the incremental placement is BIT-IDENTICAL to the batch
  * operator over the union — the equivalence the `stream_pack_placement`
  * oracle certifies by replaying the plain batch cumsum.
  *
  * Cost per micro-batch is bounded by the BATCH, not the corpus: the
  * two-level scan runs over batch rows only, and the running offset is
  * carried in a per-batch state ledger (`_pack_offsets.json` in the
  * sink), NOT derived by re-aggregating prior placements.
  *
  * Exactly-once, same discipline as [[DocStreaming]]/[[VectorStreaming]]:
  * foreachBatch is at-least-once, so each batch writes its placement
  * under its own `batch=<stream>-b<id>` partition (own partition deleted
  * first — a replay whose row set changed replaces, never merges), and
  * the ledger keys base/after offsets by BATCH ORDINAL — a replayed
  * batch recomputes the same deterministic input rows (checkpoint
  * contract) and rewrites its own entry with the same values. Micro-
  * batches execute sequentially, and ordinal k's entry is written before
  * batch k+1 starts, so the base lookup never races its predecessor.
  */
object StreamPacking {

  private def ledgerPath(dir: String) = Paths.get(dir, "_pack_offsets.json")

  /** The per-batch offset ledger: ordinal → (base, after). */
  private[graft] def readLedger(dir: String): Map[Long, (Long, Long)] = {
    val p = ledgerPath(dir)
    if (!Files.exists(p)) Map.empty
    else {
      val s = new String(Files.readAllBytes(p), "UTF-8")
      """"(\d+)"\s*:\s*\{\s*"base"\s*:\s*(-?\d+)\s*,\s*"after"\s*:\s*(-?\d+)\s*\}""".r
        .findAllMatchIn(s)
        .map(m => m.group(1).toLong -> (m.group(2).toLong, m.group(3).toLong))
        .toMap
    }
  }

  private def writeLedger(dir: String, m: Map[Long, (Long, Long)]): Unit = {
    val body = m.toSeq.sortBy(_._1).map { case (k, (b, a)) =>
      s""""$k": {"base": $b, "after": $a}"""
    }.mkString("{", ", ", "}")
    Files.createDirectories(Paths.get(dir))
    Files.write(ledgerPath(dir), body.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Drain every unconsumed document shard in `srcDir`, appending each
    * batch's placement rows (doc_id, n_tokens, tok_offset, pack_first,
    * pack_last, start_in_pack, batch) to `sinkDir`. `tokens` is the
    * per-document token-count expression over the shard schema.
    */
  def runPackAvailableNow(spark: SparkSession, srcDir: String,
      sinkDir: String, checkpoint: String, seqLen: Int,
      id: String, tokens: Column,
      maxFilesPerTrigger: Int = 1): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val streamTag = VectorStreaming.streamIdentity(spark, checkpoint)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        packBatch(spark, batch, sinkDir, s"$streamTag-b$batchId", batchId,
          seqLen, id, tokens)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One micro-batch: place the batch's documents at the running offset,
    * write under the batch's own partition, advance the ledger.
    * graft-private so the spec can drive batches (and replays)
    * deterministically.
    */
  private[graft] def packBatch(spark: SparkSession, batch: DataFrame,
      sinkDir: String, tag: String, ordinal: Long, seqLen: Int,
      id: String, tokens: Column): Unit = {
    val ledger = readLedger(sinkDir)
    val base = if (ordinal == 0L) 0L
      else ledger.getOrElse(ordinal - 1,
        throw new IllegalStateException(
          s"pack ledger at $sinkDir missing ordinal ${ordinal - 1} — " +
            s"batch $ordinal cannot derive its base offset"))._2
    // batch-bounded two-level scan, then pure arithmetic re-derivation
    // of the pack columns at the SHIFTED offset (the placement operator
    // numbers from 0; the stream numbers from the running total)
    val placed = Packing.packPlacement(batch, col(id), tokens, seqLen)
    val off = col("tok_offset") + lit(base)
    val shifted = placed.select(
      col("doc_id"), col("n_tokens"),
      off.as("tok_offset"),
      floor(off / seqLen).cast("long").as("pack_first"),
      floor((off + greatest(col("n_tokens"), lit(1L)) - 1) / seqLen)
        .cast("long").as("pack_last"),
      pmod(off, lit(seqLen.toLong)).as("start_in_pack"))
      // the write and the total below are two reads of this frame — and
      // a failed speculative re-derivation must not double-place rows
      .localCheckpoint(true)
    val total = {
      val row = shifted.agg(coalesce(sum(col("n_tokens")), lit(0L))).head()
      row.getLong(0)
    }
    // own-partition replace (DocStreaming.overwriteOwn rationale: dynamic
    // overwrite alone would leave a first attempt's rows live when the
    // replay emits no partitions)
    val own = new org.apache.hadoop.fs.Path(sinkDir, s"batch=$tag")
    val fs = own.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(own)) { fs.delete(own, true); () }
    // Output file count follows BATCH SIZE, not the placement scan's
    // partition count: packPlacement ranges the batch over
    // defaultParallelism partitions, and writing that layout verbatim
    // emits up to that many near-empty files PER MICRO-BATCH — a
    // small-files swamp whose reader pays a parquet-reader init per
    // split (measured: the placement read-back burned 5.1 s of summed
    // task time over 32 splits for a 4-batch local sink). `total` (the
    // batch's token count) is already computed for the ledger, so size
    // files at ~500k placement-row-tokens each: one file per small
    // batch, proportional fan-out for a large one. coalesce is narrow
    // and reduce-only — a batch below one file's worth never shuffles.
    val files = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, total / 500000L + 1L))
    shifted.coalesce(files.toInt).withColumn("batch", lit(tag))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(sinkDir)
    writeLedger(sinkDir, ledger + (ordinal -> (base, base + total)))
  }
}
