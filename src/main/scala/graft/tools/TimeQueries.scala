package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: time individual SparkEntry queries (args = query names, or
  * all). Usage: runMain graft.tools.TimeQueries <sfDir> [names...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.benchQueries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = SparkEntry.benchQueries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[time] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      } catch {
        case e: Throwable =>
          println(f"[time] $name%-28s FAILED ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
