package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EmbedQuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("quantizeInt8: codes bounded, max element hits ±127, dequant error ≤ scale/2") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(2.0f, 1.0f, -2.0f, 0.5f))
    ).toDF("vec_id", "emb")
    val out = Embed.quantizeInt8(df, col("vec_id"), col("emb"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Long](2), r.getDouble(4))).toMap
    val (s1, c1, mse1) = out(1L)
    assert(math.abs(s1 - 1.0 / 127.0) < 1e-12)
    // -1.0 is the max-abs element → code -127; 0.5 → 64 (floor(63.5+0.5))
    assert(c1 == Seq(64L, -127L, 32L, 0L))
    assert(c1.forall(c => c >= -127 && c <= 127))
    // per-element error ≤ scale/2 ⇒ mse ≤ scale²/4
    assert(mse1 <= s1 * s1 / 4 + 1e-18)
    val (s2, c2, _) = out(2L)
    assert(c2 == Seq(127L, 64L, -127L, 32L))
    assert(math.abs(s2 - 2.0 / 127.0) < 1e-12)
  }

  test("quantizeInt8: zero vector → scale 0, all-zero codes, zero mse") {
    val df = Seq((9L, Array(0.0f, 0.0f))).toDF("vec_id", "emb")
    val r = Embed.quantizeInt8(df, col("vec_id"), col("emb")).head()
    assert(r.getDouble(1) == 0.0)
    assert(r.getSeq[Long](2) == Seq(0L, 0L))
    assert(r.getLong(3) == 0L && r.getDouble(4) == 0.0)
  }

  test("ngramDocFreq counts each doc once and orders (freq desc, ngram asc)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon other"),
      (3L, "alpha beta gamma delta epsilon"),
      // repeats the gram INSIDE one doc — still counts once for doc 4
      (4L, "alpha beta gamma delta epsilon pad alpha beta gamma delta epsilon"),
      (5L, "short doc")
    ).toDF("doc_id", "text")
    val top = Curation.ngramDocFreq(docs, col("doc_id"), col("text"),
      n = 5, topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head == ("alpha beta gamma delta epsilon", 4L))
    // remaining entries are ngram-ascending within equal freq
    assert(top.map(_._2).sorted.reverse.toSeq == top.map(_._2).toSeq)
  }
}
