package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: decompose a warm query's EXECUTION wall time (the `exec`
  * column of [[FloorProbe]]) into what the cluster actually did —
  * per-job wall, task count, summed task run/deserialize/result-ser
  * time, GC — so the scheduler floor stops being a guess. The gap
  * between job wall and (task time / parallelism) is driver-side:
  * DAG submission, stage barriers, commit coordination, noop sink
  * commit.
  * Usage: runMain graft.tools.ExecDecompose <sfDir> [names...]
  */
object ExecDecompose {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("agg_rollup", "agg_total_stats", "scalar_json", "topk")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.cacheAll(spark, sfDir)

    val tasks = new AtomicInteger
    val runMs = new AtomicLong
    val deserMs = new AtomicLong
    val resSerMs = new AtomicLong
    val gcMs = new AtomicLong
    val launchOverheadMs = new AtomicLong // wall span minus run/deser per task
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val jobWallMs = new AtomicLong
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStartNs.put(e.jobId, System.nanoTime())
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = jobStartNs.remove(e.jobId)
        if (t0 != 0L) jobWallMs.addAndGet((System.nanoTime() - t0) / 1000000L)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          deserMs.addAndGet(m.executorDeserializeTime)
          resSerMs.addAndGet(m.resultSerializationTime)
          gcMs.addAndGet(m.jvmGCTime)
          val span = e.taskInfo.finishTime - e.taskInfo.launchTime
          launchOverheadMs.addAndGet(math.max(0L,
            span - m.executorRunTime - m.executorDeserializeTime -
              m.resultSerializationTime))
        }
      }
    }

    for (name <- names) {
      val fn = SparkEntry.benchQueries(name)
      def run(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      run(); run() // warm

      spark.sparkContext.addSparkListener(listener)
      // best-of-4 like Bench, but metrics accumulate over ALL 4 runs —
      // report per-run averages alongside best wall
      tasks.set(0); runMs.set(0); deserMs.set(0); resSerMs.set(0)
      gcMs.set(0); launchOverheadMs.set(0); jobs.set(0); stages.set(0)
      jobWallMs.set(0)
      val walls = (0 until 4).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      // listener bus is async (and private) — give it a beat to drain
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      val n = 4.0
      println(f"[exec] $name%-22s wall_best=${walls.min}%6.3f " +
        f"wall_avg=${walls.sum / n}%6.3f " +
        f"jobs/run=${jobs.get / n}%3.1f stages/run=${stages.get / n}%4.1f " +
        f"tasks/run=${tasks.get / n}%5.1f " +
        f"taskRun/run=${runMs.get / n / 1000}%6.3f " +
        f"deser/run=${deserMs.get / n / 1000}%6.3f " +
        f"resSer/run=${resSerMs.get / n / 1000}%6.3f " +
        f"gc/run=${gcMs.get / n / 1000}%6.3f " +
        f"taskGap/run=${launchOverheadMs.get / n / 1000}%6.3f " +
        f"jobWall/run=${jobWallMs.get / n / 1000}%6.3f")
    }
    spark.stop()
  }
}
