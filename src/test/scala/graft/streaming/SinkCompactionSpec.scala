package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Crash-safe compaction of batch-partitioned streaming sinks: data is
  * identical through every interruption point, files shrink, readers
  * never double-count.
  */
class SinkCompactionSpec extends SparkTestBase {

  private def writeBatches(dir: String, tags: Seq[String],
      inner: Boolean = false): Unit = {
    import spark.implicits._
    tags.zipWithIndex.foreach { case (tag, i) =>
      val base = (0L until 50L).map(j => (i * 1000L + j, s"v$i-$j"))
        .toDF("id", "v")
      val df = if (inner) base.withColumn("cluster", pmod(col("id"), lit(4)))
               else base
      val cols = if (inner) Seq("batch", "cluster") else Seq("batch")
      df.withColumn("batch", lit(tag))
        .write.mode("append")
        .partitionBy(cols: _*)
        .parquet(dir)
    }
  }

  private def batchDirs(dir: String): Seq[String] =
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName)

  test("compact merges batch partitions; data identical, dirs collapse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    writeBatches(dir, Seq("s-b0", "s-b1", "s-b2"))
    val before = SinkCompaction.read(spark, dir)
      .select(col("id"), col("v")).collect().map(_.toSeq).toSet
    val n = SinkCompaction.compact(spark, dir)
    assert(n == 3)
    assert(batchDirs(dir).size == 1, s"expected 1 batch dir: ${batchDirs(dir)}")
    assert(batchDirs(dir).head.startsWith("batch=compact-"))
    val after = SinkCompaction.read(spark, dir)
      .select(col("id"), col("v")).collect().map(_.toSeq).toSet
    assert(after == before)
    // idempotent: a second compact has one live partition — no-op
    assert(SinkCompaction.compact(spark, dir) == 0)
  }

  test("inner partition columns survive compaction (pruning layout kept)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmpi").toString
    writeBatches(dir, Seq("s-b0", "s-b1"), inner = true)
    val before = SinkCompaction.read(spark, dir)
      .select(col("id"), col("cluster").cast("int")).collect()
      .map(_.toSeq).toSet
    SinkCompaction.compact(spark, dir, innerPartitions = Seq("cluster"))
    val bd = batchDirs(dir)
    assert(bd.size == 1)
    val clusters = new java.io.File(s"$dir/${bd.head}").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
    assert(clusters.length == 4, "cluster= layout must survive")
    assert(SinkCompaction.read(spark, dir)
      .select(col("id"), col("cluster").cast("int")).collect()
      .map(_.toSeq).toSet == before)
  }

  test("crash after data write: lingering sources are not double-read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmpc").toString
    writeBatches(dir, Seq("s-b0", "s-b1"))
    val before = SinkCompaction.read(spark, dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    SinkCompaction.compact(spark, dir)
    // simulate the crash-mid-delete by RESURRECTING a source partition
    // (equivalent: delete never ran for it)
    import spark.implicits._
    (0L until 50L).map(j => (j, s"v0-$j")).toDF("id", "v")
      .withColumn("batch", lit("s-b0"))
      .write.mode("append").partitionBy("batch").parquet(dir)
    val read = SinkCompaction.read(spark, dir).select(col("id"), col("v"))
    assert(read.count() == before.size, "dead source must be excluded")
    // the next compact finishes the reclamation
    SinkCompaction.compact(spark, dir, minSources = 999) // maintenance only
    assert(!batchDirs(dir).contains("batch=s-b0"),
      "finishInterrupted must delete the lingering dead source")
    // ...and retires the fully-reclaimed manifest, so a future batch
    // minting a colliding tag can never be shadowed
    val manifests = new java.io.File(s"$dir/_graft_compactions").listFiles
    assert(manifests == null || manifests.isEmpty,
      s"fully-reclaimed manifest must be retired: ${manifests.toSeq}")
  }

  test("crash before the data write completes: sources stay authoritative") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cmpa").toString
    writeBatches(dir, Seq("s-b0", "s-b1"))
    // simulate: manifest published, data write never completed (no
    // partition dir at all)
    val mdir = new java.io.File(s"$dir/_graft_compactions")
    mdir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$mdir/compact-dead.json"),
      "[\"s-b0\",\"s-b1\"]".getBytes("UTF-8"))
    // reader ignores the incomplete manifest
    assert(SinkCompaction.read(spark, dir).count() == 100)
    // next compact clears the stale attempt and compacts for real
    assert(SinkCompaction.compact(spark, dir) == 2)
    assert(!new java.io.File(s"$mdir/compact-dead.json").exists(),
      "stale manifest must be cleared")
    assert(SinkCompaction.read(spark, dir).count() == 100)
  }

  test("a compacted curated sink still feeds DocStreaming's prior probe") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_cmpd").toString
    val cur = s"$tmp/curated"; val bands = s"$tmp/bands"
    def mkText(seed: String): String =
      (1 to 40).map(i => s"$seed$i").mkString(" ")
    val indexed = Seq((1000L, mkText("idx"))).toDF("id", "text")
    val bIdx = graft.operators.Dedup.indexedBandTable(
      indexed, col("id"), col("text"))
    def drain(tag: String, docs: Seq[(Long, String)]): Unit =
      DocStreaming.curateBatch(spark, docs.toDF("doc_id", "text"), indexed,
        bIdx, cur, bands, tag, minQuality = 0.0, threshold = 0.8)
    drain("s-b0", Seq((1L, mkText("cat"))))
    drain("s-b1", Seq((2L, mkText("dog"))))
    SinkCompaction.compact(spark, cur)
    SinkCompaction.compact(spark, bands)
    // a near-dup of batch 0's survivor must STILL be dropped — the
    // compacted history is the same history
    val nd = (mkText("cat").split(" ").dropRight(1) :+ "zzz").mkString(" ")
    drain("s-b2", Seq((3L, nd), (4L, mkText("eel"))))
    val kept = spark.read.parquet(cur).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L), s"got $kept")
  }
}
