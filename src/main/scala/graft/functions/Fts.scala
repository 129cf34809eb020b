package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text-search emulation. The reference's deep search is SQLite FTS5
  * (`messages_fts MATCH '"term"* ...'` — quoted, prefix-star, AND;
  * reference: internal/query/sqlite.go:1319-1345) over a unicode61
  * tokenizer. Spark has no inverted index; the documented approximation
  * contract (SURVEY §2.9) is:
  *
  *   - a `tokens` array column precomputed at ETL time
  *     ([[TextFunctions.tokens]], diacritics folded at ingest),
  *   - match = AND over query terms of "some token has this prefix",
  *   - ranking = BM25 (k1=1.2, b=0.75) computed from corpus stats.
  *
  * Scale: corpus stats (N, avgdl, per-term df) are one aggregate pass and a
  * scalar broadcast — no shuffle of the corpus; the match predicate is a
  * codegen'd higher-order `exists` over the token array (columnar scan),
  * which at 100 TB is a full scan per query — the honest trade Spark makes
  * vs an FTS index, mitigated by partition pruning on any date/source
  * filters applied first.
  */
object Fts {

  /** FTS5-style prefix AND-match: every term must prefix-match some token.
    * Empty terms are dropped (startsWith("") is vacuously true — a blank
    * term must not match the archive) and a query with NO surviving
    * terms matches NOTHING, the same empty-phrase policy
    * [[prefixPhraseMatch]] documents: match-all semantics for an absent
    * query belongs to the caller's guard, not the term compiler.
    */
  def prefixMatch(tokens: Column, terms: Seq[String]): Column = {
    val ts = terms.filter(_.nonEmpty)
    if (ts.isEmpty) lit(false)
    else ts.map(term => exists(tokens, t => t.startsWith(term.toLowerCase)))
      .reduce(_ && _)
  }

  /** Exact-term AND-match (quoted FTS terms). Same empty-query policy as
    * [[prefixMatch]]: no surviving terms matches nothing.
    */
  def termMatch(tokens: Column, terms: Seq[String]): Column = {
    val ts = terms.filter(_.nonEmpty)
    if (ts.isEmpty) lit(false)
    else ts.map(term => array_contains(tokens, term.toLowerCase))
      .reduce(_ && _)
  }

  /** FTS5 prefix-PHRASE match — the `"foo bar"*` form every reference
    * search term compiles to (sqlite.go:1326-1333 quotes each term and
    * appends `*`): tokens of the phrase must appear ADJACENT and in
    * order, with the LAST word matched as a prefix. A single-word phrase
    * degenerates to the plain prefix match. Runs as one codegen'd
    * `exists` over candidate start positions — no explode, no shuffle.
    */
  def prefixPhraseMatch(tokens: Column, phrase: String): Column = {
    // tokenize the QUERY with the same separator class as the indexed
    // side ([^\p{L}\p{N}]+, unicode61-ish): FTS5 runs one tokenizer over
    // both, so "e-mail thread" must compile to [e, mail, thread] — a
    // whitespace-only split would leave "e-mail" unmatchable against a
    // token column that never contains punctuation
    val words =
      phrase.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
    words match {
      // a phrase with NO surviving tokens ("!!!", "...") matches NOTHING:
      // FTS5's tokenizer reduces it to an empty phrase, which never
      // matches. `lit(true)` here would make a punctuation-only term
      // vacuous-true and return the entire archive — any match-all
      // semantics for an absent query belongs to the caller's guard, not
      // the term compiler
      case Seq() => lit(false)
      case Seq(w) => exists(tokens, t => t.startsWith(w))
      case ws =>
        // an n-word prefix phrase matches iff some n-shingle STARTS WITH
        // the space-joined phrase: the join space is an exact boundary
        // for words 1..n-1 ("tables hash" does not start with "table ha")
        // and leaves the last word a prefix. Shingling runs in the
        // compiled WordShingles expression (~µs/doc — measured 5x faster
        // than a positional element_at chain over sequence());
        // shortFallback=false makes docs shorter than n yield NULL,
        // which filters false — no index arithmetic to guard.
        exists(org.apache.spark.sql.graft.HashingExpressions.wordShingles(
          tokens, ws.length, shortFallback = false),
          s => s.startsWith(ws.mkString(" ")))
    }
  }

  final case class CorpusStats(n: Long, avgdl: Double, df: Map[String, Long])

  /** One aggregate pass over the corpus for BM25 inputs: total docs, mean
    * doc length, and document frequency per query term. The df map is
    * keyed by LOWERCASED terms (matching what the df measurement itself
    * matches on), so stats built with any term casing serve a lookup with
    * any other — [[bm25]]/[[bm25Search]] normalize the same way.
    */
  def corpusStats(docs: DataFrame, tokens: Column, terms: Seq[String]): CorpusStats = {
    val lowered = terms.map(_.toLowerCase).distinct
    val aggs = Seq(
      count(lit(1)).as("n"),
      avg(size(tokens).cast("double")).as("avgdl")) ++
      lowered.zipWithIndex.map { case (term, i) =>
        sum(when(array_contains(tokens, term), 1L).otherwise(0L))
          .as(s"df_$i")
      }
    val row = docs.agg(aggs.head, aggs.tail: _*).head()
    CorpusStats(
      row.getAs[Long]("n"),
      // avg over zero rows is null — unboxing would NPE on an empty corpus
      if (row.isNullAt(row.fieldIndex("avgdl"))) 0.0
      else row.getAs[Double]("avgdl"),
      lowered.zipWithIndex.map { case (t, i) =>
        t -> (if (row.isNullAt(row.fieldIndex(s"df_$i"))) 0L
          else row.getAs[Long](s"df_$i"))
      }.toMap)
  }

  /** BM25 score column for the given terms (Robertson/Sparck-Jones idf,
    * the FTS5/Lucene formulation). Stats are driver-side scalars baked in
    * as literals — the plan stays a single scan.
    */
  def bm25(tokens: Column, terms: Seq[String], stats: CorpusStats,
      k1: Double = 1.2, b: Double = 0.75): Column = {
    val dl = size(tokens).cast("double")
    terms.map { term =>
      val t = term.toLowerCase
      val df = stats.df.getOrElse(t, 0L) // stats map is lowercase-keyed
      val idf = math.log((stats.n - df + 0.5) / (df + 0.5) + 1.0)
      val tf = size(filter(tokens, x => x === t)).cast("double")
      lit(idf) * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(stats.avgdl)))
    }.reduceOption(_ + _).getOrElse(lit(0.0))
  }

  /** Ranked BM25 search: filter by term match, score, deterministic order.
    * Returns (id, bm25_score, rank).
    */
  def bm25Search(docs: DataFrame, id: Column, tokens: Column,
      termsIn: Seq[String], limit: Int = 100,
      statsOpt: Option[CorpusStats] = None): DataFrame = {
    // dedupe terms: a repeated query word must not double its score
    // (keeps parity with InvertedIndex.bm25Search, which also dedupes)
    val terms = termsIn.map(_.toLowerCase).distinct
    // stats are corpus constants — callers serving many queries over one
    // snapshot precompute them once (corpusStats is a blocking agg pass);
    // a supplied stats object MUST describe `docs` as passed (i.e. the
    // same corpus and filtering)
    // empty/punctuation-only term lists match NOTHING — and must return
    // BEFORE corpusStats, which is a full blocking corpus aggregation
    // that would be paid just to filter everything out
    if (terms.isEmpty)
      return docs.select(id.as("doc_id"), lit(0.0).as("bm25_score"))
        .limit(0)
        .withColumn("rank", lit(1))
    val stats = statsOpt.getOrElse(corpusStats(docs, tokens, terms))
    docs.filter(terms.map(t => array_contains(tokens, t.toLowerCase))
      .reduce(_ || _))
      .select(id.as("doc_id"), bm25(tokens, terms, stats).as("bm25_score"))
      .orderBy(col("bm25_score").desc, col("doc_id").asc)
      .limit(limit)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25_score").desc, col("doc_id").asc)))
  }
}
