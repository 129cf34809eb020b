package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dev tool: measure MinHash-LSH candidate-pair counts at a scale factor. */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[debug] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
    }
    time("docs.count")(docs.count())
    val sig = Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
    time("signatures")(sig.agg(avg(element_at(col("sig"), 1).cast("double"))).head().get(0))
    val sh = docs.select(col("doc_id"), graft.functions.TextFunctions
      .shingles(graft.functions.TextFunctions.tokens(col("text")), 3).as("sh"))
    time("shingles-only")(sh.agg(avg(size(col("sh")).cast("double"))).head().get(0))
    time("candidates")(
      Dedup.minhashCandidates(docs, col("doc_id"), col("text")).count())
    spark.stop()
  }
}
