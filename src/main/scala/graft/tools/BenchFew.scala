package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: time named SparkEntry queries under the EXACT Bench config
  * (cached tables, AQE off, shuffle=8) — best-of-3 after one warm run.
  * Usage: runMain graft.tools.BenchFew <sfDir> <name>...
  */
object BenchFew {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.benchQueries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.cacheAll(spark, sfDir)
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.benchQueries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- names) {
      runOnce(name) // warm
      val best = Seq.fill(3)(runOnce(name)).min
      println(f"[bench] $name%-28s $best%8.3f s")
    }
    spark.stop()
  }
}
