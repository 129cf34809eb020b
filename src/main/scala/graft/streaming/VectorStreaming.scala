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
  * the index grows). Existing list files are never rewritten.
  *
  * Exactly-once: the checkpoint tracks consumed source files, so a
  * crashed or re-triggered drain adds nothing on re-run —
  * `Trigger.AvailableNow` + checkpoint is the Spark-native equivalent of
  * the reference's transactional queue claim/ack cycle. Centroids stay
  * frozen across drains; a generation rotate
  * ([[graft.operators.VectorIndex]]) re-derives them only when drift
  * warrants a rebuild.
  */
object VectorStreaming {

  /** Drain every unconsumed shard in `srcDir` into the `listsDir` index:
    * assign → cluster-partitioned append. Returns when the backlog is
    * consumed.
    */
  def runAssignAvailableNow(spark: SparkSession, srcDir: String,
      centroids: Seq[Seq[Float]], listsDir: String,
      checkpoint: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.assignTo(batch, col("vec_id"), col("embedding"),
          centroids)
          .repartition(col("cluster")) // one writer per list, no small files
          .write.mode(SaveMode.Append).partitionBy("cluster")
          .parquet(listsDir)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
