package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fts

/** Hybrid lexical+semantic search: BM25 branch + ANN branch fused with RRF
  * — the Spark rebuild of the reference's FusedSearch single-SQL pipeline
  * (reference: internal/vector/sqlitevec/fused.go:31-253: filtered-ids CTE →
  * bm25 CTE (row_number) → ann CTE (KNN, row_number) → FULL OUTER JOIN →
  * RRF → ORDER BY score DESC, id ASC LIMIT), with the reference's
  * subject-boost re-rank (fused.go:203-221) generalized to a caller column.
  *
  * Scale: each branch fetches k+1 (k+1 detects pool saturation,
  * fused.go:119-175) so the fusion join is tiny regardless of corpus size;
  * the optional pre-filter semi-joins the corpus before either branch.
  */
object HybridSearch {

  /** Saturation flags are lazy: each is an extra count job over its
    * branch, and callers that only read `df` (the common path) shouldn't
    * pay for two more executions of the branch pipelines.
    */
  final class Result(val df: DataFrame,
      bm25Sat: => Boolean, annSat: => Boolean) {
    lazy val bm25Saturated: Boolean = bm25Sat
    lazy val annSaturated: Boolean = annSat
  }

  /** @param docs    (id, tokens) corpus for the lexical branch
    * @param vectors (id, embedding) corpus for the semantic branch
    * @param preFilter optional id-set DataFrame (single `id` column) both
    *        branches are semi-joined against (reference hybrid/filter.go).
    *        Like the reference vector.Filter ("values are pre-resolved to
    *        IDs at the Go layer", backend.go:44-47), resolution is the
    *        CALLER's: note the reference's own engines disagree on
    *        repeated same-field tokens — the SQLite/DuckDB query engines
    *        OR them within a dimension (IN clause,
    *        sqlite.go:1464-1469, what FilterCompiler mirrors), while the
    *        vector backend ANDs one OR-group per token
    *        (backend.go:48-57). Both are expressible here: one id-set
    *        per token chained as successive semi-joins = AND-of-OR; one
    *        merged id-set = OR.
    */
  /** Both k-trimmed branches plus their lazy saturation probes. */
  private final case class Branches(bm25: DataFrame, ann: DataFrame,
      bm25Sat: () => Boolean, annSat: () => Boolean)

  private def branches(docs: DataFrame, id: Column, tokens: Column,
      vectors: DataFrame, vecId: Column, vec: Column,
      terms: Seq[String], queryVec: Seq[Float], k: Int,
      preFilter: Option[DataFrame],
      statsOpt: Option[Fts.CorpusStats]): Branches = {
    // precomputed BM25 stats describe the UNFILTERED corpus — with a
    // pre-filter the lexical branch must re-measure the filtered set
    require(statsOpt.isEmpty || preFilter.isEmpty,
      "statsOpt cannot be combined with preFilter (stats would be stale)")

    // the filter id column is renamed so corpora whose own id column is
    // also called "id" don't hit an ambiguous reference
    def applyPre(df: DataFrame, c: Column): DataFrame = preFilter match {
      case Some(ids) =>
        val pre = ids.select(col(ids.columns.head).as("__pre_id"))
        df.join(pre, c === pre("__pre_id"), "left_semi")
      case None => df
    }

    // BM25 branch: LIMIT k+1 — the extra row only signals saturation
    val bm25 = Fts.bm25Search(applyPre(docs, id), id, tokens, terms, k + 1,
      statsOpt)
      .select(col("doc_id").as("id"), col("rank").as("rank"))

    // ANN branch
    val ann = Similarity.bruteForceKnn(applyPre(vectors, vecId), vecId, vec,
      queryVec, k + 1)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("vec_id").asc)))
      .select(col("vec_id").as("id"), col("rank"))

    Branches(bm25.filter(col("rank") <= k), ann.filter(col("rank") <= k),
      () => bm25.count() > k, () => ann.count() > k)
  }

  /** @param limit page size — the reference separates the page LIMIT
    *        from the per-signal pool K (FusedRequest.Limit vs
    *        KPerSignal, fused.go:186-191); negative means "same as k",
    *        the historical behavior of this API.
    */
  def fusedSearch(docs: DataFrame, id: Column, tokens: Column,
      vectors: DataFrame, vecId: Column, vec: Column,
      terms: Seq[String], queryVec: Seq[Float], k: Int = 20,
      rrfK: Int = 60, preFilter: Option[DataFrame] = None,
      statsOpt: Option[graft.functions.Fts.CorpusStats] = None,
      limit: Int = -1): Result = {
    val b = branches(docs, id, tokens, vectors, vecId, vec, terms, queryVec,
      k, preFilter, statsOpt)
    val fused = Similarity.rrfFuse(b.bm25, b.ann, "id", "rank", rrfK,
      if (limit < 0) k else limit)
    new Result(fused, b.bm25Sat(), b.annSat())
  }

  /** Boost-aware fused search. When a subject boost is active the page
    * limit must NOT trim the fused pool before the boost runs — a
    * boost-eligible hit ranked past `limit` could never be promoted
    * (reference fused.go:203-216: boost-active requests fetch the entire
    * fused pool, naturally capped at 2×k, and re-trim to the page limit
    * only after boost-aware ordering is final; regression tests
    * fused_test.go:902-1069).
    *
    * @param subjects      (id, subject text) lookup — left-joined onto the
    *        pool; rows with NULL/empty subjects never boost
    *        (fused_test.go:1070-1123)
    * @param subjectTerms  substring terms; empty terms are skipped, and
    *        `boostFactor <= 1.0` disables the boost entirely
    *        (fused.go:465: both are the reference's inactive conditions).
    *        Documented divergence (r13 audit): the reference lowercases
    *        the SUBJECT but not the term (fused.go:483-488
    *        `strings.Contains(lower, term)`), so any term carrying an
    *        uppercase letter can never boost there — an obvious
    *        one-sided-fold slip, not a semantic; this engine folds both
    *        sides (case-insensitive match), which is what that code
    *        plainly intends.
    * Output adds a `subject_boosted` flag per row (the reference's
    * SubjectBoosted explain field).
    */
  def fusedSearchBoosted(docs: DataFrame, id: Column, tokens: Column,
      vectors: DataFrame, vecId: Column, vec: Column,
      terms: Seq[String], queryVec: Seq[Float],
      subjects: DataFrame, subjectTerms: Seq[String],
      boostFactor: Double = 1.5, limit: Int = 20, k: Int = 20,
      rrfK: Int = 60, preFilter: Option[DataFrame] = None,
      statsOpt: Option[graft.functions.Fts.CorpusStats] = None): Result = {
    val b = branches(docs, id, tokens, vectors, vecId, vec, terms, queryVec,
      k, preFilter, statsOpt)
    // fuse at full pool width — ≤ 2k rows since both branches are k-trimmed
    val full = Similarity.rrfFuse(b.bm25, b.ann, "id", "rank", rrfK, 2 * k)
    val cleanTerms = subjectTerms.filter(_.nonEmpty)
    val active = boostFactor > 1.0 && cleanTerms.nonEmpty
    val page =
      if (!active)
        full.withColumn("subject_boosted", lit(false))
      else {
        val hit = cleanTerms
          .map(t => lower(col("__subj")).contains(t.toLowerCase))
          .reduce(_ || _)
        // ONE row per id before the join: a duplicate subject row would
        // fan out its pool row and let one message occupy several page
        // slots; boolean max = OR, so any matching version boosts
        val subj = subjects.toDF("id", "__subj")
          .groupBy(col("id"))
          .agg(max(hit).as("__boost_hit"))
        full.join(subj, Seq("id"), "left")
          .withColumn("subject_boosted",
            coalesce(col("__boost_hit"), lit(false)))
          .withColumn("rrf_score",
            when(col("subject_boosted"), col("rrf_score") * boostFactor)
              .otherwise(col("rrf_score")))
          .drop("__boost_hit")
      }
    new Result(
      page.orderBy(col("rrf_score").desc, col("id").asc).limit(limit),
      b.bm25Sat(), b.annSat())
  }

  /** Subject/title-term boost re-rank (reference fused.go:464-507): results
    * whose boost column matches any term get score × boostFactor, then
    * deterministic re-sort.
    */
  def boostRerank(fused: DataFrame, boostText: Column, terms: Seq[String],
      boostFactor: Double = 1.5): DataFrame = {
    // empty terms are boost-INACTIVE (fused.go:465), not match-everything:
    // contains("") is vacuously true for every non-null text, which would
    // boost all non-null rows past null-text rows and reorder the page
    val hit = terms.filter(_.nonEmpty)
      .map(t => lower(boostText).contains(t.toLowerCase))
      .reduceOption(_ || _).getOrElse(lit(false))
    fused.withColumn("rrf_score",
      when(hit, col("rrf_score") * boostFactor).otherwise(col("rrf_score")))
      .orderBy(col("rrf_score").desc, col("id").asc)
  }
}
