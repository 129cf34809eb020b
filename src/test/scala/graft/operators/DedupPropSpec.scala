package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** Property-based equivalence for the bucket-local pair generators: on
  * random corpora, the distributed plans must emit EXACTLY the pairs the
  * O(n²) definition does (expression outputs collected once per corpus,
  * brute force computed in plain Scala). The oracle gate proves this for
  * the driver corpus; these properties cover corpora the fixtures don't —
  * dup-heavy, near-empty, single-word, skewed vocabularies.
  *
  * Few iterations (Spark jobs per case are ~100 ms), many rows per case.
  */
class DedupPropSpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(n).withMaxSize(25), p)
    assert(res.passed, res.status.toString)
  }

  // skewed tiny vocabulary → heavy dup/near-dup structure by construction
  private val word: Gen[String] =
    Gen.frequency(5 -> Gen.const("alpha"), 5 -> Gen.const("beta"),
      3 -> Gen.const("gamma"), 2 -> Gen.const("delta"),
      1 -> Gen.identifier.map(_.take(6)))
  private val doc: Gen[String] = Gen.chooseNum(0, 30)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val corpus: Gen[Seq[(Long, String)]] = Gen.chooseNum(2, 25)
    .flatMap(n => Gen.listOfN(n, doc)).map(_.zipWithIndex
      .map { case (t, i) => (i.toLong, t) })

  test("simhashPairs == O(n²) Hamming join on random corpora") {
    check(Prop.forAll(corpus) { rows =>
      val df = rows.toDF("doc_id", "text")
      val sigs = df.select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressions.simhash60Md5(
          TextFunctions.rawTokens(col("text"))).as("simhash"))
        .filter(col("simhash").isNotNull)
      val got = Dedup.simhashPairs(sigs, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val s = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = (for {
        (a, sa) <- s; (b, sb) <- s if a < b
        h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
      } yield (a, b, h.toLong)).toSet
      got == want
    }, n = 12)
  }

  test("winnowPairs == O(n²) shared-fingerprint join on random corpora") {
    check(Prop.forAll(corpus) { rows =>
      val df = rows.toDF("doc_id", "text")
      val fps = df.select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressions.winnowFingerprints(
          TextFunctions.rawTokens(col("text")), 4, 5).as("fps"))
        .filter(col("fps").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      val got = Dedup.winnowPairs(df, col("doc_id"), col("text"),
        k = 4, w = 5, minShared = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (a, fa) <- fps; (b, fb) <- fps if a < b
        shared = (fa intersect fb).size if shared >= 1
      } yield (a, b, shared.toLong)).toSet
      got == want
    }, n = 12)
  }
}
