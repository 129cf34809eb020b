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
    import graft.functions.TextFunctions
    time("docs.count")(docs.count())
    val spreadDocs = graft.sources.Tables.spread(docs)
    val exploded = spreadDocs.select(col("doc_id"),
      explode(array_distinct(TextFunctions.shingles(
        TextFunctions.tokens(col("text")), 3))).as("__s"))
      .select(col("doc_id"), xxhash64(col("__s")).as("__h"))
    time("explode+basehash")(exploded.count())
    time("explode+basehash#2")(exploded.count())
    val sig = Dedup.minhashSignatures(docs, col("doc_id"), col("text"))
    time("signatures")(sig.agg(avg(element_at(col("sig"), 1).cast("double"))).head().get(0))
    time("signatures#2")(sig.agg(avg(element_at(col("sig"), 1).cast("double"))).head().get(0))
    time("candidates")(
      Dedup.minhashCandidates(docs, col("doc_id"), col("text")).count())
    time("candidates#2")(
      Dedup.minhashCandidates(docs, col("doc_id"), col("text")).count())
    val nd = Dedup.nearDuplicates(docs, col("doc_id"), col("text"), threshold = 0.5)
    time("nearDup-count")(nd.count())
    time("nearDup-count#2")(nd.count())
    time("nearDup-ordered-noop") {
      nd.orderBy(col("id_a").asc, col("id_b").asc)
        .write.format("noop").mode("overwrite").save(); "ok"
    }
    time("nearDup-ordered-noop#2") {
      nd.orderBy(col("id_a").asc, col("id_b").asc)
        .write.format("noop").mode("overwrite").save(); "ok"
    }
    spark.stop()
  }
}
