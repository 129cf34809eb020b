package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Fused BM25+ANN search behaviors (reference
  * internal/vector/sqlitevec/fused_test.go): saturation probes, the
  * boost over-fetch regression, and null-subject handling.
  *
  * Fixture: 8 docs where BOTH signals rank 1..8 by id — equal BM25 tf
  * (ties break by id) and embeddings drifting away from the query vector
  * as id grows — so page math is exact (fused_test.go:902-935 seeds the
  * same shape: vec offset = id, subjects alpha..golf + one boost target).
  */
class HybridSearchSpec extends SparkTestBase {
  import spark.implicits._

  private val subjectsSeq = Seq(
    "alpha planning", "bravo planning", "charlie planning",
    "delta planning", "echo planning", "foxtrot planning",
    "golf planning", "Quarterly review")

  private lazy val docs = (1 to 8)
    .map(i => (i.toLong, Seq("planning", "notes", "team")))
    .toDF("id", "toks")
  private lazy val vectors = (1 to 8)
    .map { i =>
      val raw = Array(1f, i * 0.01f, 0f)
      val n = math.sqrt(raw.map(x => x * x.toDouble).sum).toFloat
      (i.toLong, raw.map(_ / n))
    }
    .toDF("id", "embedding")
  private lazy val subjects = subjectsSeq.zipWithIndex
    .map { case (s, i) => ((i + 1).toLong, s) }.toDF("id", "subject")
  private val qv = Seq(1f, 0f, 0f)

  test("saturation flags: k below pool trips them, k above does not") {
    val tight = HybridSearch.fusedSearch(docs, col("id"), col("toks"),
      vectors, col("id"), col("embedding"), Seq("planning"), qv, k = 5)
    assert(tight.bm25Saturated && tight.annSaturated)
    assert(tight.df.count() == 5)
    val loose = HybridSearch.fusedSearch(docs, col("id"), col("toks"),
      vectors, col("id"), col("embedding"), Seq("planning"), qv, k = 20)
    assert(!loose.bm25Saturated && !loose.annSaturated)
  }

  test("empty pre-filtered set reports NOT saturated") {
    // fused_test.go:848-901 — an empty candidate pool must not read as
    // "more results available"
    val none = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    val r = HybridSearch.fusedSearch(docs, col("id"), col("toks"),
      vectors, col("id"), col("embedding"), Seq("planning"), qv, k = 5,
      preFilter = Some(none))
    assert(r.df.count() == 0)
    assert(!r.bm25Saturated && !r.annSaturated)
  }

  test("subject boost over-fetches past the page limit (deep hit promoted)") {
    // fused_test.go:902-1069 — limit 3, boost-eligible doc ranked 8th by
    // both signals. Page-then-boost can never surface it; pool-then-boost
    // must.
    val boosted = HybridSearch.fusedSearchBoosted(
      docs, col("id"), col("toks"), vectors, col("id"), col("embedding"),
      Seq("planning"), qv, subjects, Seq("quarterly"),
      boostFactor = 5.0, limit = 3, k = 20)
    val page = boosted.df.collect()
    assert(page.length == 3)
    val byId = page.map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("subject_boosted")).toMap
    assert(byId.contains(8L) && byId(8L)) // promoted AND flagged
    // the counterfactual the reference regressed: trim-then-boost loses it
    val trimmed = HybridSearch.boostRerank(
      HybridSearch.fusedSearch(docs, col("id"), col("toks"),
        vectors, col("id"), col("embedding"), Seq("planning"), qv, k = 3).df
        .join(subjects, Seq("id"), "left"),
      col("subject"), Seq("quarterly"), 5.0)
    assert(!trimmed.collect().map(_.getAs[Long]("id")).contains(8L))
  }

  test("NULL and non-matching subjects never boost") {
    // fused_test.go:1070-1123
    val subjWithNull = subjects
      .withColumn("subject", when(col("id") === 8, lit(null)).otherwise(col("subject")))
    val r = HybridSearch.fusedSearchBoosted(
      docs, col("id"), col("toks"), vectors, col("id"), col("embedding"),
      Seq("planning"), qv, subjWithNull, Seq("quarterly"),
      boostFactor = 5.0, limit = 3, k = 20)
    val page = r.df.collect()
    assert(page.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    assert(page.forall(!_.getAs[Boolean]("subject_boosted")))
  }

  test("boostFactor <= 1.0 or empty terms disable the boost entirely") {
    // fused.go:465 inactive conditions
    val r1 = HybridSearch.fusedSearchBoosted(
      docs, col("id"), col("toks"), vectors, col("id"), col("embedding"),
      Seq("planning"), qv, subjects, Seq("quarterly"),
      boostFactor = 1.0, limit = 3, k = 20)
    assert(r1.df.collect().map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    val r2 = HybridSearch.fusedSearchBoosted(
      docs, col("id"), col("toks"), vectors, col("id"), col("embedding"),
      Seq("planning"), qv, subjects, Seq("", ""),
      boostFactor = 5.0, limit = 3, k = 20)
    assert(r2.df.collect().map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
  }
}
