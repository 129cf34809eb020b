package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: formatted physical plans for a comma-separated query list —
  * the fastest way to count exchanges / check broadcast choices by eye.
  * Usage: runMain graft.tools.ExplainFew <sfDir> <q1,q2,...>
  */
object ExplainFew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("agg_core"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.cacheAll(spark, dir)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.benchQueries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
