package graft.tools

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: per-STAGE task metrics for one warm query run — names the
  * stage (via its callsite/details head), task count, summed run /
  * deserialize / GC ms — to localize which stage of a multi-job query
  * carries an anomaly (e.g. export_roundtrip's 4 s of summed task
  * deserialize, ExecDecompose r15).
  * Usage: runMain graft.tools.StageDecompose <sfDir> <query>
  */
object StageDecompose {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("export_roundtrip")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.cacheAll(spark, sfDir)
    val fn = SparkEntry.benchQueries(name)
    def run(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    run(); run() // warm

    final case class Agg(var tasks: Int = 0, var runMs: Long = 0,
      var deserMs: Long = 0, var gcMs: Long = 0, var name: String = "")
    val byStage = new ConcurrentHashMap[Int, Agg]()
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        val a = byStage.computeIfAbsent(e.stageInfo.stageId, _ => Agg())
        a.name = e.stageInfo.name.take(80)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val a = byStage.computeIfAbsent(e.stageId, _ => Agg())
        a.tasks += 1
        val m = e.taskMetrics
        if (m != null) {
          a.runMs += m.executorRunTime
          a.deserMs += m.executorDeserializeTime
          a.gcMs += m.jvmGCTime
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime(); run()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    spark.sparkContext.removeSparkListener(listener)
    println(f"[stage] $name total wall ${wall}%.3f s")
    import scala.jdk.CollectionConverters._
    byStage.asScala.toSeq.sortBy(_._1).foreach { case (sid, a) =>
      println(f"[stage] #$sid%-4d tasks=${a.tasks}%4d run=${a.runMs / 1000.0}%7.3f " +
        f"deser=${a.deserMs / 1000.0}%7.3f gc=${a.gcMs / 1000.0}%6.3f  ${a.name}")
    }
    spark.stop()
  }
}
