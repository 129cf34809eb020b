package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Composed training-data curation pipeline — the end-to-end shape a
  * pretraining data job runs over a 100 TB corpus, built entirely from
  * the operators in this library:
  *
  *   language gate → quality threshold → exact-dup removal (keep the
  *   lowest-id copy) → per-doc token accounting.
  *
  * One scan + one window shuffle on the content fingerprint; every later
  * stage is a narrow filter, so the plan's only wide dependency is the
  * dedup — the same bound a petabyte run needs. Near-dup removal
  * ([[Dedup.nearDuplicates]]) composes after this as a second pass over
  * the survivors (candidate generation needs its own shuffle anyway).
  */
object Curation {

  /** Deterministic core (oracle-able): quality gate FIRST, then exact
    * dedup among the quality survivors — gating after picking winners
    * would drop a whole duplicate group whenever its min-id copy fails
    * the quality check (case-variant dups share a fingerprint but not a
    * quality score). Returns (doc_id, quality, n_tokens).
    */
  def curate(docs: DataFrame, id: Column, text: Column,
      minQuality: Double): DataFrame =
    docs
      // tokens projected separately so the interpreted tokenize runs
      // once per row, not once per quality sub-score (see TextFunctions)
      .select(id.as("doc_id"), text.as("__text"),
        TextFunctions.wsTokens(text).as("__toks"))
      .select(col("doc_id"), col("__text"),
        TextFunctions.qualityScoreFromTokens(col("__text"), col("__toks"))
          .as("quality"))
      .filter(col("quality") >= minQuality)
      .withColumn("__winner", min(col("doc_id")).over(
        Window.partitionBy(TextFunctions.fingerprint(col("__text")))))
      .filter(col("doc_id") === col("__winner"))
      .select(col("doc_id"), col("quality"),
        TextFunctions.tokenCount(col("__text")).cast("long").as("n_tokens"))

  /** Full pipeline with the non-oracle-able gates composed in: language
    * restriction and LSH near-dup removal over the deterministic
    * survivors.
    */
  def curateFull(docs: DataFrame, id: Column, text: Column,
      minQuality: Double, langs: Set[String],
      nearDupThreshold: Double = 0.8): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("__text"))
      .withColumn("lang", TextFunctions.langId(col("__text")))
      .filter(col("lang").isin(langs.toSeq: _*))
    val kept = curate(base, col("doc_id"), col("__text"), minQuality)
      .join(base, "doc_id")
    val nearDupLosers = Dedup.nearDuplicates(kept, col("doc_id"),
      col("__text"), nearDupThreshold)
      .select(col("id_b").as("doc_id")) // keep the lower id of each pair
      .distinct()
    kept.join(nearDupLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("quality"))
  }
}
