package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** Property tests for the sequence-packing two-level scan: for ARBITRARY
  * token-count vectors, id orderings (sparse/shuffled), seqLens, and
  * partition counts, the distributed placement must equal the local
  * prefix-sum replay exactly. This is the invariant the correctness of
  * every downstream packed-batch writer rests on — a base-offset or
  * partition-id bug shifts every document after the first bad boundary.
  */
class PackingPropSpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop, min: Int = 30): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  private val docsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    ids <- Gen.listOfN(n, Gen.choose(-1000L, 1000L)).map(_.distinct)
    toks <- Gen.listOfN(ids.length, Gen.choose(0L, 5000L))
  } yield ids.zip(toks)

  test("property: distributed placement == local prefix replay for any input") {
    check(Prop.forAll(docsGen, Gen.choose(1, 513), Gen.choose(1, 7)) {
      (docs, seqLen, parts) =>
        val df = docs.toDF("doc_id", "n")
        val got = Packing.packPlacement(df, col("doc_id"), col("n"),
          seqLen, partitions = parts)
          .collect()
          .map(r => r.getLong(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
              r.getLong(5))).toMap
        var acc = 0L
        val want = docs.sortBy(_._1).map { case (id, n) =>
          val off = acc; acc += n
          id -> (n, off, off / seqLen,
            (off + math.max(n, 1L) - 1) / seqLen, off % seqLen)
        }.toMap
        got == want
    })
  }

  test("property: written packs == local concat-and-chunk replay") {
    // the WRITE side: tokens materialized through the sharded sink must
    // reproduce the exact global concatenation — slices, in-pack order,
    // and interior-boundary mask positions
    val gen = for {
      n <- Gen.choose(1, 25)
      ids <- Gen.listOfN(n, Gen.choose(-50L, 50L)).map(_.distinct)
      lens <- Gen.listOfN(ids.length, Gen.choose(0, 23))
    } yield ids.zip(lens)
    check(Prop.forAll(gen, Gen.choose(1, 17)) { (docs, seqLen) =>
      val df = docs.map { case (id, len) =>
        (id, (0 until len).map(i => s"t${id}_$i"))
      }.toDF("doc_id", "toks")
      val out = java.nio.file.Files
        .createTempDirectory("graft_packs_spec").toString
      try {
        Packing.writePacks(df, col("doc_id"), col("toks"), seqLen, out)
        val got = spark.read.parquet(out).collect().map { r =>
          r.getLong(0) -> ((r.getLong(1),
            r.getSeq[String](2).toList,
            r.getSeq[Long](3).toList))
        }.toMap
        // local replay
        val stream = scala.collection.mutable.ArrayBuffer.empty[String]
        val bounds = scala.collection.mutable.Map.empty[Long, List[Long]]
          .withDefaultValue(Nil)
        docs.sortBy(_._1).foreach { case (id, len) =>
          val off = stream.length.toLong
          if (len > 0 && off % seqLen > 0)
            bounds(off / seqLen) = bounds(off / seqLen) :+ (off % seqLen)
          stream ++= (0 until len).map(i => s"t${id}_$i")
        }
        val want = stream.grouped(seqLen).zipWithIndex.map {
          case (slice, i) =>
            i.toLong -> ((slice.length.toLong, slice.toList,
              bounds(i.toLong)))
        }.toMap
        got == want
      } finally {
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        } finally walk.close()
      }
    }, min = 12)
  }

  test("property: pack ids cover 0..ceil(total/L)-1 with no gaps") {
    check(Prop.forAll(docsGen, Gen.choose(1, 129)) { (docs, seqLen) =>
      val total = docs.map(_._2).sum
      val df = docs.toDF("doc_id", "n")
      val packs = Packing.packSummary(
        Packing.packPlacement(df, col("doc_id"), col("n"), seqLen))
        .select(col("pack_id")).collect().map(_.getLong(0)).toSet
      // concat-and-chunk leaves no empty interior pack: the touched set
      // is contiguous from 0, reaches at least the last DATA pack, and
      // overshoots it by at most one (a trailing zero-token doc sits AT
      // offset == total, which is the next pack when total % L == 0)
      val lastData = if (total == 0) 0L else (total - 1) / seqLen
      val maxPack = packs.max
      packs == (0L to maxPack).toSet &&
        maxPack >= lastData && maxPack <= lastData + 1
    }, min = 20)
  }
}
