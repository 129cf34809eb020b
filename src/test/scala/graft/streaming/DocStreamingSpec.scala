package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Streaming corpus curation: quality gate + within-batch / vs-index /
  * vs-prior-curated dedup, arrival order wins, exactly-once replays.
  */
class DocStreamingSpec extends SparkTestBase {

  // 40 distinct pseudo-words: quality ≈ (0.8 + 1.0 + 0 + 1.0)/4 = 0.7,
  // comfortably above the 0.35 gate; 38 3-shingles for the Jaccard math
  private def mkText(seed: String): String =
    (1 to 40).map(i => s"$seed$i").mkString(" ")

  // change the LAST word: 3 of 38 shingles differ ⇒ J = 35/41 ≈ 0.854
  private def nearDupOf(text: String, repl: String): String =
    (text.split(" ").dropRight(1) :+ repl).mkString(" ")

  private val lowQuality = "x x x x !!!" // score ≈ 0.125 < 0.35

  test("drains quality-gate and dedup within batch, vs index, vs prior") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dstream").toString
    val src = s"$tmp/drop"; val cur = s"$tmp/curated"
    val bands = s"$tmp/bands"; val ckpt = s"$tmp/ckpt"

    val idxText = mkText("idx")
    val indexed = Seq((1000L, idxText)).toDF("id", "text")

    val textC = mkText("cat")
    val textD = mkText("dog")
    val textE = mkText("eel")
    // batch 1: 1 keeps (C), 2 exact-dups 1, 3 near-dups the index,
    // 4 fails the quality gate, 5 keeps (D)
    Seq((1L, textC), (2L, textC), (3L, nearDupOf(idxText, "zzz")),
      (4L, lowQuality), (5L, textD))
      .toDF("doc_id", "text").write.parquet(src)
    DocStreaming.runCurateAvailableNow(spark, src, indexed, cur, bands, ckpt)

    // batch 2 (later drain): 6 near-dups batch 1's SURVIVOR C (arrival
    // order wins — dropped), 7 keeps (E), 8 near-dups the index again
    Seq((6L, nearDupOf(textC, "qqq")), (7L, textE),
      (8L, nearDupOf(idxText, "yyy")))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    DocStreaming.runCurateAvailableNow(spark, src, indexed, cur, bands, ckpt)

    val kept = spark.read.parquet(cur)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 7L),
      s"expected survivors {1,5,7}, got $kept")

    // the band sidecar mirrors the curated partitions (probe artifact)
    val bandBatches = spark.read.parquet(bands)
      .select(col("batch")).distinct().count()
    assert(bandBatches == 2, "one sidecar partition per micro-batch")

    // third drain, no new files: checkpointed no-op
    DocStreaming.runCurateAvailableNow(spark, src, indexed, cur, bands, ckpt)
    assert(spark.read.parquet(cur).count() == 3)
  }

  test("a replayed micro-batch replaces its own output, never duplicates") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dreplay").toString
    val cur = s"$tmp/curated"; val bands = s"$tmp/bands"
    val indexed = Seq((1000L, mkText("idx"))).toDF("id", "text")
    val bIdx = graft.operators.Dedup.indexedBandTable(
      indexed, col("id"), col("text"))
    val batch = Seq((1L, mkText("cat")), (2L, mkText("dog")))
      .toDF("doc_id", "text")
    // foreachBatch is at-least-once: same tag twice = crash replay
    DocStreaming.curateBatch(spark, batch, indexed, bIdx, cur, bands,
      "s0-b0", minQuality = 0.35, threshold = 0.8)
    DocStreaming.curateBatch(spark, batch, indexed, bIdx, cur, bands,
      "s0-b0", minQuality = 0.35, threshold = 0.8)
    assert(spark.read.parquet(cur).count() == 2,
      "replay must overwrite its own partition, not append")
    // and the replay did NOT dedup against its own first attempt: both
    // docs survived (they are not dups of anything but themselves)
    assert(spark.read.parquet(cur).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("drain against an empty or absent drop directory is a no-op") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dempty").toString
    val indexed = Seq((1000L, mkText("idx"))).toDF("id", "text")
    DocStreaming.runCurateAvailableNow(spark, s"$tmp/nowhere", indexed,
      s"$tmp/curated", s"$tmp/bands", s"$tmp/ckpt")
    assert(!new java.io.File(s"$tmp/curated").exists())
  }
}
