package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dev tool: decompose dedup_clusters cost — candidate multiplicity and
  * verification volume for the 32-band (2-row) high-recall banding.
  */
object DebugClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[debug] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
    }
    time("docs.count")(docs.count())
    time("avg shingles/doc")(docs.select(
      avg(size(array_distinct(graft.functions.TextFunctions.shingles(
        graft.functions.TextFunctions.tokens(col("text")), 3))))).head().get(0))
    time("cand32 RAW (multiplicity)")(
      Dedup.candidatesRaw(docs, col("doc_id"), col("text"),
        numHashes = 64, bands = 32, shingleSize = 3, maxBucket = 1000).count())
    time("cand16 RAW (multiplicity)")(
      Dedup.candidatesRaw(docs, col("doc_id"), col("text"),
        numHashes = 64, bands = 16, shingleSize = 3, maxBucket = 1000).count())
    time("cand32 distinct")(
      Dedup.minhashCandidates(docs, col("doc_id"), col("text"), bands = 32)
        .count())
    time("cand32 distinct#2")(
      Dedup.minhashCandidates(docs, col("doc_id"), col("text"), bands = 32)
        .count())
    val nd = Dedup.nearDuplicates(docs, col("doc_id"), col("text"),
      threshold = 0.5, bands = 32)
    time("nearDup32 edges")(nd.count())
    time("nearDup32 edges#2")(nd.count())
    spark.stop()
  }
}
