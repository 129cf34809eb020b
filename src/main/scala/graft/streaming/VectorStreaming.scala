package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Similarity

/** Streaming ingestion into the coarse vector index — the streaming twin
  * of the `vector_index_delta` batch query (reference analogue: the
  * embedding queue drain feeding the sqlite-vec store,
  * internal/vector/sqlitevec/backend.go:299-343, re-expressed as a
  * Structured Streaming file source instead of a polling worker).
  *
  * Fresh embedding shards land as parquet files in a drop directory;
  * each micro-batch is assigned against the ACTIVE generation's FROZEN
  * centroids ([[Similarity.assignTo]] — one narrow scan, no shuffle
  * beyond the per-list write clustering) and appended into the inverted
  * lists' hive partitions ([[graft.operators.IvfIndex.writeLists]]
  * layout, so probe queries keep pruning to nProbe/nList of the data as
  * the index grows). Prior batches' files are never touched; only a
  * REPLAYED micro-batch rewrites (exactly) its own partitions.
  *
  * Effectively-once: the checkpoint tracks consumed source files (a
  * completed drain re-run adds nothing), and because `foreachBatch` is
  * only AT-least-once — a crash between the write and the checkpoint
  * commit replays the batch — each micro-batch writes its own batch=
  * partitions with dynamic overwrite, so a replay REPLACES its partial
  * output instead of duplicating vectors. The Spark-native equivalent
  * of the reference's transactional queue claim/ack cycle. Centroids
  * stay frozen across drains; a generation rotate
  * ([[graft.operators.VectorIndex]]) re-derives them only when drift
  * warrants a rebuild.
  */
object VectorStreaming {

  /** Drain every unconsumed shard in `srcDir` into the `listsDir` index:
    * assign → cluster-partitioned write under the micro-batch's own
    * batch= partition. Returns when the backlog is consumed; a drain
    * against an empty drop directory is a no-op.
    */
  def runAssignAvailableNow(spark: SparkSession, srcDir: String,
      centroids: Seq[Seq[Float]], listsDir: String,
      checkpoint: String): Unit = {
    // an empty/not-yet-created drop dir is the steady state between
    // shard deliveries — a no-op drain, not a schema-inference crash.
    // Only THOSE error classes are swallowed: a misconfigured path would
    // otherwise be indistinguishable from "nothing to do" and the index
    // would silently stop growing
    val schema =
      try spark.read.parquet(srcDir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).exists(c =>
              c.contains("UNABLE_TO_INFER_SCHEMA") ||
                c.contains("PATH_NOT_FOUND")) =>
          return
      }
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // foreachBatch is AT-LEAST-once: a batch replayed after a crash
        // between the write and the checkpoint commit must land on its
        // own batch=b<id> partitions and OVERWRITE them (dynamic mode),
        // or the lists would accumulate duplicate vectors; cluster stays
        // a partition column below it, so probes still prune
        Similarity.assignTo(batch, col("vec_id"), col("embedding"),
          centroids)
          .withColumn("batch", lit(s"b$batchId"))
          .repartition(col("cluster")) // one writer per list, no small files
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch", "cluster")
          .parquet(listsDir)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
