package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native inverted index for deep text search — the index-backed
  * answer to FTS5 that SURVEY §4 marked "no Spark equivalent". The index
  * is a Parquet table `(token, df, postings: array<long>)` sorted by
  * token:
  *
  *   - build: explode distinct tokens per doc → groupBy token →
  *     sorted postings list (one shuffle, linear in corpus);
  *   - store: range-partitioned + sorted by token, so a term or prefix
  *     lookup prunes to a handful of row groups via Parquet min/max on
  *     the sort column — query cost ∝ matched postings, NOT corpus size;
  *   - query: one scan of the matched index rows, explode postings,
  *     count distinct matched terms per doc = AND semantics.
  *
  * This is the structure that turns the "honest full scan per query"
  * trade (graft.functions.Fts) into an index lookup at 100 TB; the scan
  * path remains for ad-hoc queries over un-indexed columns.
  */
object InvertedIndex {

  /** Build the index frame from (id, tokens). */
  def build(docs: DataFrame, id: Column, toks: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(array_distinct(toks)).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))

  /** Write token-sorted so term/prefix predicates become row-group skips. */
  def write(index: DataFrame, dir: String, buckets: Int = 16): Unit =
    index.repartitionByRange(buckets, col("token"))
      .sortWithinPartitions(col("token"))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Doc ids matching ALL terms (prefix or exact): one index scan tags
    * each matched token row with the query-term indexes it satisfies;
    * exploding postings and counting distinct satisfied terms per doc
    * gives the AND. Returns a single-column (doc_id) frame.
    */
  def matchingIds(index: DataFrame, terms: Seq[String],
      prefix: Boolean): DataFrame = {
    require(terms.nonEmpty, "at least one term")
    val lower = terms.map(_.toLowerCase)
    def pred(t: String): Column =
      if (prefix) col("token").startsWith(t) else col("token") === t
    val matchedIdx = array_compact(array(lower.zipWithIndex.map {
      case (t, i) => when(pred(t), i)
    }: _*))
    index
      .filter(lower.map(pred).reduce(_ || _))
      .select(col("postings"), explode(matchedIdx).as("__term"))
      .select(explode(col("postings")).as("doc_id"), col("__term"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("__term")).as("__hits"))
      .filter(col("__hits") === lower.length)
      .select(col("doc_id"))
  }
}
