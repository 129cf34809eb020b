package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction — the tokenizer-TRAINING
  * primitive a data pipeline runs before any `text_token_count_bpe`-style
  * budgeting makes sense. The reference has no analogue (its text stack
  * consumes tokenizers, never learns them — internal/textutil); this is
  * one of the beyond-the-reference training-pipeline operators alongside
  * packing and decontamination.
  *
  * Algorithm (classic corpus-dictionary BPE, Sennrich et al. 2016,
  * arXiv:1508.07909 §3.2 "learn BPE operations"):
  *
  *   1. reduce the corpus to a word-frequency dictionary (merge counts
  *      are frequency-weighted per word TYPE, not per occurrence scan);
  *   2. represent each word as a symbol sequence (initially characters);
  *   3. per iteration: count all adjacent symbol pairs (overlapping, as
  *      the canonical counter does), take the most frequent — ties
  *      broken lexicographically for cross-engine determinism — and
  *      merge every non-overlapping left-to-right occurrence;
  *   4. emit the learned merge table (iteration, pair, count).
  *
  * Representation: a word's symbols are joined with DOUBLE spaces and
  * the sequence is double-space delimited at both ends
  * (`'  l  o  w  '`). A merge of pair (a, b) is then the LITERAL string
  * replacement of `' a  b '` with `' ab '`: the single leading/trailing
  * space consumes one half of each boundary's double delimiter, so the
  * invariant survives the rewrite AND consecutive occurrences of the
  * pair merge exactly like the canonical greedy scanner — with
  * single-space delimiters, `a a a a` would yield `aa a a` because the
  * first match consumes the shared middle delimiter; with double
  * delimiters it yields `aa aa` (pinned by spec). Both Spark's
  * `replace` and the DuckDB oracle's scan left-to-right without
  * re-examining replaced output, so the two engines rewrite
  * identically.
  *
  * Scale shape: everything after step 1 operates on the |vocab|-bounded
  * dictionary, never the corpus — at 100 TB the dictionary is the
  * 10⁷-10⁸-row word-type table, not the 10¹¹-row token stream. Per
  * iteration: one narrow shuffle (pair count over exploded adjacent
  * pairs, map-side combined) plus a 1-row driver collect (the argmax —
  * the same bounded scalar-per-step contract as the k-means centroid
  * draws, Similarity.scala). The iteration chain adds one literal
  * `replace` projection per step on the PERSISTED dictionary — narrow,
  * codegen'd, no lineage blow-up (the driver-side literal breaks the
  * top-1 subtree out of the next iteration's plan; an in-plan crossJoin
  * would double the lineage per step).
  *
  * Degenerate corpora: when no adjacent pair remains (every word fully
  * merged), iteration stops early and the merge table is short —
  * callers requesting more iterations than the corpus supports get the
  * honest prefix.
  */
object BpeVocab {

  /** Word-frequency dictionary: lowercased [a-z]+ word types with corpus
    * frequencies. One corpus pass, one hash shuffle.
    */
  def wordDict(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(split(lower(text), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Learn `iterations` BPE merges over the corpus. Returns
    * (iteration, pair, cnt): 1-based iteration, the merged pair as
    * "a b", and its frequency-weighted adjacent-pair count at merge
    * time.
    */
  def learnMerges(docs: DataFrame, text: Column, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = docs.sparkSession
    import spark.implicits._
    // '  l  o  w  ': char → "c  " via regexp_replace, double-space prefix
    val d0 = wordDict(docs, text)
      .select(concat(lit("  "),
        regexp_replace(col("word"), "(.)", "$1  ")).as("seq"), col("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var d = d0
      val merges = Seq.newBuilder[(Long, String, Long)]
      var exhausted = false
      for (i <- 1 to iterations if !exhausted) {
        val syms = split(trim(col("seq")), "  ")
        val pairs = zip_with(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (a, b) => concat(a, lit(" "), b))
        val top = d.select(explode(pairs).as("pair"), col("freq"))
          .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("pair").asc)
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val pair = top(0).getString(0)
          merges += ((i.toLong, pair, top(0).getLong(1)))
          d = d.withColumn("seq", call_function("replace", col("seq"),
            lit(" " + pair.replace(" ", "  ") + " "),
            lit(" " + pair.replace(" ", "") + " ")))
        }
      }
      merges.result().toDF("iteration", "pair", "cnt")
    } finally { d0.unpersist(); () }
  }

  /** Tokenize a corpus WITH a learned merge table — the apply side of
    * [[learnMerges]] (train on a sample, apply to the full corpus): each
    * document's words are rewritten through the merges in learned order
    * and the resulting subword symbols are returned per document.
    *
    * Shape: the M-replace rewrite chain runs over the DISTINCT-word map
    * — |vocab| rows, not |corpus| tokens — and joins back onto the
    * per-document word stream (measured 10× cheaper than rewriting per
    * occurrence at sf0.1; at 100 TB the gap is the corpus/vocab ratio).
    * The join side is a distinct-aggregate with statistics, so the
    * planner broadcasts it while the vocabulary fits and falls back to
    * a word-keyed shuffle join when a 10⁸-type vocabulary outgrows the
    * broadcast threshold — both plans are right at their scale.
    */
  def applyMerges(docs: DataFrame, id: Column, text: Column,
      merges: Seq[String]): DataFrame = {
    // snapshot the word stream ONCE: it feeds BOTH the distinct vocab
    // map and the join's probe side, which are separate physical
    // subtrees — without this the upstream corpus lineage (a caller's
    // quality gate + the tokenize explode) executes twice per call.
    // The frame is two narrow columns; the materialization strategy is
    // conf-selectable (graft.engine.Materialize — localCheckpoint
    // default, persist/checkpoint for recompute-on-loss clusters).
    val words = graft.engine.Materialize.snapshot(
      docs.select(id.as("doc_id"),
        explode(split(lower(text), "[^a-z]+")).as("word"))
        .filter(col("word") =!= ""))
    val seq0 = concat(lit("  "),
      regexp_replace(col("__w"), "(.)", "$1  "))
    val rewritten = merges.foldLeft(seq0) { (acc, pair) =>
      call_function("replace", acc,
        lit(" " + pair.replace(" ", "  ") + " "),
        lit(" " + pair.replace(" ", "") + " "))
    }
    val vocabMap = words.select(col("word").as("__w")).distinct()
      .select(col("__w"), split(trim(rewritten), "  ").as("__subs"))
    words.join(vocabMap, col("word") === col("__w"))
      .select(col("doc_id"), explode(col("__subs")).as("subword"))
  }
}
