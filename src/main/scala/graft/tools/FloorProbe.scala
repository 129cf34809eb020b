package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: decompose the per-query floor — DataFrame construction
  * (analysis), optimization+physical planning, and execution — under the
  * same warm-cache config Bench uses.
  * Usage: runMain graft.tools.FloorProbe <sfDir> [names...]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("pagination_offset", "filter_ilike", "agg_total_stats",
        "window_total_count", "set_except", "scalar_json", "agg_core",
        "topk", "join_semi", "agg_approx_distinct")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.cacheAll(spark, sfDir)
    // warm every probed query once (codegen/JIT)
    names.foreach { n =>
      SparkEntry.benchQueries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    for (name <- names) {
      val fn = SparkEntry.benchQueries(name)
      def best(k: Int)(f: => Unit): Double =
        (0 until k).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
      val tBuild = best(3) { fn(spark, sfDir) }
      val tPlan = best(3) {
        fn(spark, sfDir).queryExecution.executedPlan
      }
      val tAll = best(3) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      println(f"[floor] $name%-24s build=$tBuild%6.3f plan=${tPlan - tBuild}%6.3f exec=${tAll - tPlan}%6.3f total=$tAll%6.3f")
    }
    spark.stop()
  }
}
