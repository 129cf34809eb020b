package graft.operators

import graft.SparkTestBase
import graft.functions.{Fts, TextFunctions}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Inverted-index search: parity with the scan path, persistence with
  * token-sorted layout, prefix + exact AND semantics.
  */
class InvertedIndexSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = Tables.load(spark, dir, "documents")
    .select(col("doc_id"), col("text"))
  private lazy val index = InvertedIndex.build(
    docs, col("doc_id"), TextFunctions.wsTokens(col("text")))

  test("index lookup returns exactly the scan-path matches (prefix AND)") {
    val terms = Seq("spar", "win")
    val viaIndex = InvertedIndex.matchingIds(index, terms, prefix = true)
      .collect().map(_.getLong(0)).toSet
    val viaScan = docs
      .filter(Fts.prefixMatch(TextFunctions.wsTokens(col("text")), terms))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(viaIndex == viaScan && viaIndex.nonEmpty)
  }

  test("mixed-case corpus: normalized build matches folded query terms") {
    // the build contract: tokens lowercased at index time, query terms
    // folded at lookup — an index over case-preserving tokens silently
    // misses "Spark" for query "spark"
    import spark.implicits._
    val mixed = Seq((1L, "Spark Wins Today"), (2L, "nothing relevant"))
      .toDF("doc_id", "text")
    val idx = InvertedIndex.build(mixed, col("doc_id"),
      TextFunctions.wsTokens(lower(col("text"))))
    assert(InvertedIndex.matchingIds(idx, Seq("Spar", "win"), prefix = true)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("exact-term AND differs from prefix when the prefix is not a word") {
    val exact = InvertedIndex.matchingIds(index, Seq("spark"), prefix = false)
      .collect().map(_.getLong(0)).toSet
    val viaScan = docs
      .filter(Fts.termMatch(TextFunctions.wsTokens(col("text")), Seq("spark")))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(exact == viaScan)
    assert(InvertedIndex.matchingIds(index, Seq("spar"), prefix = false)
      .collect().isEmpty) // "spar" is not a token
  }

  test("bm25Search with no terms returns empty, not an empty.reduce crash") {
    // the punctuation-only query class: compiled terms are Nil
    assert(Fts.bm25Search(
      docs.select(col("doc_id"), TextFunctions.wsTokens(col("text")).as("toks")),
      col("doc_id"), col("toks"), Nil).isEmpty)
  }

  test("BM25 through the index matches the scan-path scorer") {
    val terms = Seq("spark", "join")
    val (ranked, doclens) = InvertedIndex.buildRanked(
      docs, col("doc_id"), TextFunctions.wsTokens(col("text")))
    val viaIndex = InvertedIndex.bm25Search(ranked, doclens, terms, limit = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaScan = Fts.bm25Search(
      docs.select(col("doc_id"), TextFunctions.wsTokens(col("text")).as("toks")),
      col("doc_id"), col("toks"), terms, limit = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaIndex.keySet == viaScan.keySet && viaIndex.nonEmpty)
    // identical formula, different summation order → tolerance, not bits
    viaIndex.foreach { case (id, s) =>
      assert(math.abs(s - viaScan(id)) < 1e-9, s"doc $id: $s vs ${viaScan(id)}")
    }
  }

  test("matchingIds answers identically on plain and ranked (struct-postings) indexes") {
    // r13 review finding: exploding struct postings used to group the
    // AND count per (doc, tf, dl) — a doc whose terms carry different
    // tfs never reached hits == terms.length. The struct case must
    // project doc_id before grouping. Fixture makes the corner bite:
    // doc 1 has tf=2 for one term, tf=1 for the others.
    import spark.implicits._
    val mixed = Seq(
      (1L, "apple banana banana cherry"),
      (2L, "apple banana cherry"),
      (3L, "apple banana")) // missing cherry — must NOT match
      .toDF("doc_id", "text")
    val toks = TextFunctions.wsTokens(col("text"))
    val plainIdx = InvertedIndex.build(mixed, col("doc_id"), toks)
    val (rankedIdx, _) =
      InvertedIndex.buildRanked(mixed, col("doc_id"), toks, withDl = true)
    val terms = Seq("apple", "banana", "cherry")
    def ids(idx: org.apache.spark.sql.DataFrame) =
      InvertedIndex.matchingIds(idx, terms, prefix = false)
        .collect().map(_.getLong(0)).toSet
    assert(ids(plainIdx) == Set(1L, 2L))
    assert(ids(rankedIdx) == Set(1L, 2L))
  }

  test("withDl index (no doclens join) + precomputed stats match the join path") {
    // the 100 TB serve shape: dl embedded per posting and corpus stats
    // computed once per snapshot — scoring must be bit-equal to the
    // legacy per-query doclens-join path on the same index contents
    val terms = Seq("spark", "join")
    val (plain, doclens) = InvertedIndex.buildRanked(
      docs, col("doc_id"), TextFunctions.wsTokens(col("text")))
    val (withDl, doclens2) = InvertedIndex.buildRanked(
      docs, col("doc_id"), TextFunctions.wsTokens(col("text")), withDl = true)
    val stats = InvertedIndex.corpusStats(doclens2)
    val legacy = InvertedIndex.bm25Search(plain, doclens, terms, limit = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val fused = InvertedIndex.bm25Search(withDl, doclens2, terms, limit = 50,
      statsOpt = Some(stats))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(legacy.nonEmpty && legacy.toSeq == fused.toSeq)
  }

  test("persisted index round-trips and serves lookups") {
    val out = java.nio.file.Files.createTempDirectory("graft_idx").toString
    InvertedIndex.write(index, out, buckets = 4)
    val reread = InvertedIndex.read(spark, out)
    val ids = InvertedIndex.matchingIds(reread, Seq("spark"), prefix = false)
      .count()
    assert(ids > 0)
    // postings are sorted (binary-search/merge friendly)
    val p = reread.filter(col("token") === "spark")
      .select(col("postings")).head().getAs[scala.collection.Seq[Long]](0)
    assert(p == p.sorted)
  }
}
