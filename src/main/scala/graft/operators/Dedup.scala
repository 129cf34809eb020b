package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for archive + training-data pipelines.
  *
  * The reference dedups messages by RFC822 Message-ID with a
  * normalized-content sha256 fallback and preference-ranked survivor
  * selection (reference: internal/dedup/dedup.go:166-303, 505-600,
  * 673-758). Generalized here to any (id, text) table, plus the near-dup
  * family (MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine) a
  * 100 TB pretraining pipeline needs.
  *
  * Scale design: every operator is a key-shuffle (groupBy hash/band/bucket)
  * with no global state; candidate generation is strictly
  * bucket-local so the pairwise step never goes quadratic in the corpus —
  * only in the bucket.
  */
object Dedup {

  /** Exact duplicate groups: sha2(content) → groups with >1 member.
    * One shuffle on the 256-bit key; map-side partial agg applies.
    */
  def exactGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(sha2(text, 256).as("content_hash"))
      .agg(count(lit(1)).as("dup_count"),
        min(id).as("winner_id"),
        array_sort(collect_list(id)).as("member_ids"))
      .filter(col("dup_count") > 1)

  /** Survivor selection: rank group members by a preference struct
    * (reference dedup.go:62-135 source-type order + sent-copy detection →
    * generalized to caller-supplied preference columns); emit
    * (loser_id, winner_id) pairs — the merge-job input.
    */
  def survivorPairs(df: DataFrame, id: Column, groupKey: Column,
      preference: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("__g"))
      .orderBy(preference.map(_.asc) :+ col("__id").asc: _*)
    df.select(id.as("__id"), groupKey.as("__g"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("winner_id", first(col("__id")).over(
        Window.partitionBy(col("__g"))
          .orderBy(col("__rn"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("__rn") > 1)
      .select(col("__id").as("loser_id"), col("winner_id"))
  }

  /** MinHash signatures: k independent min-hashes over word shingles.
    * Signature j = min over shingles of xxhash64(j ‖ shingle) — pure
    * builtins, fully codegen'd, no UDF.
    */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int = 3): Column = {
    val sh = array_distinct(shingles(tokens(text), shingleSize))
    array((0 until numHashes).map { j =>
      array_min(transform(sh, s => xxhash64(lit(j), s)))
    }: _*)
  }

  /** MinHash + LSH banding: docs sharing any band bucket become candidate
    * pairs (Broder/Leskovec MMDS construction). Returns distinct
    * (id_a, id_b) with id_a < id_b.
    *
    * Plan: signature (narrow) → explode bands (×bands rows) → shuffle on
    * (band, band_hash) → within-bucket self-join. At 100 TB the band join
    * is the only shuffle and bucket sizes bound the pair blowup.
    */
  def minhashCandidates(df: DataFrame, id: Column, text: Column,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = df.select(id.as("doc_id"),
      minhashSignature(text, numHashes, shingleSize).as("sig"))
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * lit(rows) + 1, lit(rows))), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs: re-rank LSH candidates with
    * the true similarity. `withTexts` must carry (id_a, id_b, text_a,
    * text_b) — join texts before calling (pairs ≪ corpus, so the join is
    * cheap).
    */
  def jaccard(textA: Column, textB: Column, shingleSize: Int = 3): Column = {
    val sa = array_distinct(shingles(tokens(textA), shingleSize))
    val sb = array_distinct(shingles(tokens(textB), shingleSize))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** Near-dup via MinHash-LSH candidates + exact Jaccard threshold. */
  def nearDuplicates(df: DataFrame, id: Column, text: Column,
      threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val docs = df.select(id.as("doc_id"), text.as("doc_text"))
    val cand = minhashCandidates(docs, col("doc_id"), col("doc_text"), numHashes, bands)
    cand
      .join(docs.select(col("doc_id").as("id_a"), col("doc_text").as("__ta")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("doc_text").as("__tb")), "id_b")
      .withColumn("jaccard", jaccard(col("__ta"), col("__tb")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over tokens: per-bit majority vote of token hashes.
    * Builtin-only construction: for each bit b, sum ±1 over tokens by
    * testing xxhash64(token) bit b; set bit if the sum is positive.
    * Near-dups then differ in ≤ k bits (Hamming).
    */
  def simhash64(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
