package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE vocabulary induction: hand-computed merges on a toy corpus, the
  * double-delimiter rewrite's canonical-greedy semantics, apply-side
  * train/apply agreement, and early exhaustion.
  */
class BpeVocabSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "low low low lower lower newest"),
    (2L, "newest newest newest wider"))
    .toDF("doc_id", "text")

  test("learnMerges: frequency-weighted argmax with lexicographic tie-break") {
    // word freqs: low 3, lower 2, newest 4, wider 1
    // pair counts round 1: (w,e)=2+4=6 wins over (l,o)=(o,w)=5
    // round 2: (l,o)=5
    // round 3: four-way tie at 4 — (e,we),(n,e),(s,t),(we,s) — pair ASC
    //          picks "e we"
    val m = BpeVocab.learnMerges(corpus, col("text"), 3)
      .orderBy("iteration").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(m == Seq((1L, "w e", 6L), (2L, "l o", 5L), (3L, "e we", 4L)))
  }

  test("double-delimiter rewrite merges consecutive pair runs canonically") {
    // 'a a a a' must become 'aa aa' (single-space delimiters would give
    // 'aa a a' — the first match would consume the shared delimiter);
    // 'a a a' becomes 'aa a' (greedy left-to-right)
    val d = Seq("  a  a  a  a  ", "  a  a  a  ").toDF("seq")
      .withColumn("out", call_function("replace", col("seq"),
        lit(" a  a "), lit(" aa ")))
      .collect().map(_.getString(1)).toSeq
    assert(d == Seq("  aa  aa  ", "  aa  a  "))
  }

  test("applyMerges agrees with the dictionary the merges were learned on") {
    val merges = BpeVocab.learnMerges(corpus, col("text"), 3)
      .orderBy("iteration").collect().map(_.getString(1)).toSeq
    val sub = BpeVocab.applyMerges(corpus, col("doc_id"), col("text"), merges)
      .groupBy("subword").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // after (w,e),(l,o),(e,we): low → [lo, w] ×3; lower → [lo, we, r] ×2;
    // newest → [n, ewe, s, t] ×4; wider → [w, i, d, e, r] ×1
    assert(sub("lo") == 5 && sub("we") == 2 && sub("ewe") == 4)
    assert(sub("w") == 4) // 3 from low + 1 from wider
    assert(sub("r") == 3) // 2 from lower + 1 from wider
    assert(!sub.contains("o")) // fully merged away
  }

  test("exhaustion stops early with the honest prefix") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // one word type 'ab': round 1 merges (a,b); no pair remains
    val m = BpeVocab.learnMerges(tiny, col("text"), 5)
      .orderBy("iteration").collect()
    assert(m.length == 1)
    assert(m(0).getString(1) == "a b")
  }
}
