package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: is the ~150 ms/task deserialize on mbox text-write tasks
  * structural to Spark's text sink, or specific to the export pipeline's
  * write closure? Times bare 32-partition text vs parquet writes of the
  * same rows next to the export-shaped (repartition+sort) text write.
  * Usage: runMain graft.tools.TextWriteProbe <sfDir>
  */
object TextWriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.cacheAll(spark, sfDir)
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").as("value"))
    val root = java.nio.file.Files.createTempDirectory("graft_txtprobe")

    def time(label: String)(body: => Unit): Unit = {
      body
      val best = Seq.fill(3)({
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }).min
      println(f"[txt] $label%-34s $best%8.3f s")
    }

    time("text 32-part repart+sort") {
      docs.repartition(32, col("doc_id"))
        .sortWithinPartitions(col("doc_id"))
        .select(col("value"))
        .write.mode("overwrite").text(s"$root/t1")
    }
    time("text 8-part straight") {
      docs.select(col("value")).write.mode("overwrite").text(s"$root/t2")
    }
    time("parquet 32-part repart+sort") {
      docs.repartition(32, col("doc_id"))
        .sortWithinPartitions(col("doc_id"))
        .write.mode("overwrite").parquet(s"$root/t3")
    }
    spark.stop()
  }
}
