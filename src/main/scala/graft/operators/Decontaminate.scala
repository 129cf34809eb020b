package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark decontamination: remove (or flag) training documents that
  * share a word n-gram with an evaluation/benchmark set — the standard
  * leakage guard in pretraining pipelines (GPT-3 appendix C / PaLM /
  * Dolma all use 8-13-gram overlap against eval sets).
  *
  * Beyond the reference's own inventory (prompt: "operations a
  * large-scale training-data pipeline would need"); tokenization matches
  * the dedup family ([[TextFunctions.tokens]]) so one ETL token pass
  * serves both.
  *
  * Scale shape (the part that must survive 100 TB): the benchmark side is
  * SMALL by construction (eval sets are a few MB even when the corpus is
  * 100 TB), so its distinct n-grams are BROADCAST; corpus documents
  * explode to (doc_id, ngram) and stream through the broadcast hash join
  * map-side — the corpus is scanned exactly once and never shuffled. The
  * only rows that reach a shuffle are actual contamination hits (the
  * per-doc match-count groupBy), which are rare in a healthy corpus.
  * Short documents (< n tokens) contribute their whole text as a single
  * "gram", mirroring [[TextFunctions.shingles]] semantics, so short eval
  * questions still match verbatim copies.
  */
object Decontaminate {

  // compiled shingle expression (nulls for zero-token docs — explode
  // drops them); identical output to
  // array_distinct(shingles(tokens(text), n))
  private def grams(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.HashingExpressions.wordShingles(
      TextFunctions.rawTokens(text), n)

  /** Distinct word n-grams of the benchmark set: one row per n-gram.
    * Intended to be broadcast — callers hand this to
    * [[contaminatedDocs]] which wraps it in `broadcast()`.
    */
  def benchmarkNgrams(bench: DataFrame, text: Column, n: Int): DataFrame =
    bench.select(explode(grams(text, n)).as("ngram")).distinct()

  /** Corpus documents sharing ≥1 n-gram with the benchmark set, with the
    * count of distinct overlapping n-grams (the triage signal: 1 shared
    * gram may be an idiom, 40 is a verbatim copy).
    *
    * Returns (doc_id, n_matched_ngrams).
    */
  def contaminatedDocs(corpus: DataFrame, id: Column, text: Column,
      benchGrams: DataFrame, n: Int = 8): DataFrame =
    graft.sources.Tables.spread(
      corpus.select(id.as("doc_id"), text.as("__text")))
      .select(col("doc_id"), explode(grams(col("__text"), n)).as("ngram"))
      .join(broadcast(benchGrams), Seq("ngram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched_ngrams"))

  /** The corpus with contaminated documents removed — broadcast anti-join
    * on the (small) contaminated id set, preserving the corpus schema.
    */
  def cleanCorpus(corpus: DataFrame, id: Column, text: Column,
      benchGrams: DataFrame, n: Int = 8): DataFrame = {
    val bad = contaminatedDocs(corpus, id, text, benchGrams, n)
      .select(col("doc_id").as("__bad_id"))
    corpus.join(broadcast(bad), id === col("__bad_id"), "left_anti")
  }
}
