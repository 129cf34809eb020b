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
    *        branches are semi-joined against (reference hybrid/filter.go)
    */
  def fusedSearch(docs: DataFrame, id: Column, tokens: Column,
      vectors: DataFrame, vecId: Column, vec: Column,
      terms: Seq[String], queryVec: Seq[Float], k: Int = 20,
      rrfK: Int = 60, preFilter: Option[DataFrame] = None,
      statsOpt: Option[graft.functions.Fts.CorpusStats] = None): Result = {
    // precomputed BM25 stats describe the UNFILTERED corpus — with a
    // pre-filter the lexical branch must re-measure the filtered set
    require(statsOpt.isEmpty || preFilter.isEmpty,
      "statsOpt cannot be combined with preFilter (stats would be stale)")

    def applyPre(df: DataFrame, c: Column): DataFrame = preFilter match {
      case Some(ids) => df.join(ids, c === ids("id"), "left_semi")
      case None => df
    }

    // BM25 branch: LIMIT k+1 — the extra row only signals saturation
    val bm25 = Fts.bm25Search(applyPre(docs, id), id, tokens, terms, k + 1,
      statsOpt)
      .select(col("doc_id").as("id"), col("rank").as("rank"))
    val bm25Trimmed = bm25.filter(col("rank") <= k)

    // ANN branch
    val ann = Similarity.bruteForceKnn(applyPre(vectors, vecId), vecId, vec,
      queryVec, k + 1)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("vec_id").asc)))
      .select(col("vec_id").as("id"), col("rank"))
    val annTrimmed = ann.filter(col("rank") <= k)

    val fused = Similarity.rrfFuse(bm25Trimmed, annTrimmed, "id", "rank",
      rrfK, k)
    new Result(fused, bm25.count() > k, ann.count() > k)
  }

  /** Subject/title-term boost re-rank (reference fused.go:464-507): results
    * whose boost column matches any term get score × boostFactor, then
    * deterministic re-sort.
    */
  def boostRerank(fused: DataFrame, boostText: Column, terms: Seq[String],
      boostFactor: Double = 1.5): DataFrame = {
    val hit = terms.map(t => lower(boostText).contains(t.toLowerCase))
      .reduceOption(_ || _).getOrElse(lit(false))
    fused.withColumn("rrf_score",
      when(hit, col("rrf_score") * boostFactor).otherwise(col("rrf_score")))
      .orderBy(col("rrf_score").desc, col("id").asc)
  }
}
