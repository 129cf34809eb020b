package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private val bench = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "short eval question")
  ).toDF("doc_id", "text")

  private val corpus = Seq(
    // verbatim copy of bench doc 1 → many shared 8-grams
    (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
    // shares exactly one 8-gram window (first 8 words of bench doc 1)
    (11L, "prefix words the quick brown fox jumps over the lazy then diverges completely here"),
    // clean
    (12L, "completely unrelated text about spark catalyst optimizer internals and shuffles"),
    // contains the SHORT bench doc verbatim (whole-text gram of a <8-token doc)
    (13L, "short eval question"),
    // superset of the short bench doc — does NOT match its whole-text gram
    (14L, "a short eval question with extra words")
  ).toDF("doc_id", "text")

  private def grams = Decontaminate.benchmarkNgrams(bench, col("text"), n = 8)

  test("contaminatedDocs flags overlap and counts distinct shared 8-grams") {
    val got = Decontaminate.contaminatedDocs(corpus, col("doc_id"),
      col("text"), grams, n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bench doc 1 has 13 tokens → 6 distinct 8-grams; doc 10 shares all 6
    assert(got(10L) == 6L)
    assert(got(11L) == 1L)
    // doc 13 == the short bench doc, whose only gram is its whole text
    assert(got(13L) == 1L)
    assert(!got.contains(12L) && !got.contains(14L))
  }

  test("cleanCorpus removes exactly the contaminated docs, schema intact") {
    val clean = Decontaminate.cleanCorpus(corpus, col("doc_id"), col("text"),
      grams, n = 8)
    assert(clean.columns.toSeq == Seq("doc_id", "text"))
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq == Seq(12L, 14L))
  }

  test("benchmark side is broadcast; corpus side has no shuffle before the join") {
    val plan = Decontaminate.contaminatedDocs(corpus, col("doc_id"),
      col("text"), grams, n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in:\n$plan")
  }

  test("zero-token docs contribute nothing on either side") {
    val empties = Seq((20L, "   "), (21L, "...")).toDF("doc_id", "text")
    assert(Decontaminate.contaminatedDocs(empties, col("doc_id"), col("text"),
      grams, n = 8).count() == 0L)
    assert(Decontaminate.benchmarkNgrams(empties, col("text"), n = 8).count() == 0L)
  }
}
