package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Small-files maintenance for the streaming sinks ([[VectorStreaming]]
  * lists, [[DocStreaming]] curated corpus + band sidecar): every drain
  * appends its own `batch=<tag>` partition, so a long-lived stream
  * accumulates one directory (and its files) per micro-batch — the
  * classic streaming-sink problem that turns a 100 TB index into
  * millions of tiny files and partition-discovery into the bottleneck.
  *
  * `compact` rewrites a set of batch partitions into ONE new partition,
  * crash-safely WITHOUT a transactional table format, by ordering writes
  * so every interruption point is recoverable:
  *
  *   1. write a compaction manifest (`_graft_compactions/<tag>.json`,
  *      temp + rename) naming the source tags — the underscore prefix
  *      keeps it invisible to parquet partition discovery;
  *   2. rewrite the sources' rows under `batch=<compact-tag>`, then drop
  *      an explicit completion marker inside that partition (parquet's
  *      own `_SUCCESS` lands at the sink root and cannot witness it);
  *   3. delete the source partitions.
  *
  * A crash after (1) leaves a manifest whose tag has no marker:
  * [[read]] ignores it (sources still live) and the next [[compact]]
  * clears the stale attempt. A crash after (2) leaves sources on disk
  * but the manifest is COMPLETE: [[read]] excludes the listed sources
  * (no duplicates) and the next [[compact]] finishes the deletes. So
  * readers going through [[read]] see exactly-once data at every
  * interruption point.
  *
  * Invariants callers own: compaction must not run concurrently with a
  * drain REPLAY of a source batch (run it while the stream is quiescent
  * — the same discipline as any sink maintenance), and consumers of a
  * compacted sink must read via [[read]] rather than a bare
  * `spark.read.parquet` (which would double-count lingering sources
  * after a crash-mid-delete).
  */
object SinkCompaction {

  private val manifestDirName = "_graft_compactions"

  /** Explicit completion marker INSIDE the compact partition: parquet's
    * own `_SUCCESS` lands at the sink ROOT (shared by every write), so
    * it cannot witness THIS partition's completeness. Underscore prefix
    * keeps it invisible to partition discovery.
    */
  private val doneMarker = "_GRAFT_COMPACT_DONE"

  /** Compact every current `batch=` partition of `dir` into one new
    * partition. `innerPartitions` lists partition columns nested under
    * batch (e.g. `Seq("cluster")` for the vector lists) so the rewrite
    * preserves their pruning layout. No-op when the sink has fewer than
    * `minSources` live batch partitions. Returns the number of source
    * partitions compacted.
    */
  def compact(spark: SparkSession, dir: String,
      innerPartitions: Seq[String] = Nil, minSources: Int = 2,
      targetFiles: Int = 32): Int = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return 0
    finishInterrupted(fs, root)

    val sources = liveBatchTags(fs, root)
    if (sources.size < minSources) return 0
    val tag = s"compact-${java.util.UUID.randomUUID().toString.take(8)}"

    // (1) manifest first: from here on, a completed data write makes the
    // sources dead even if their deletes never run
    writeManifest(fs, root, tag, sources)

    // (2) one rewrite, partition layout preserved; coalesce the shuffle
    // tails away by letting the write clustering do the work — rows are
    // repartitioned on the inner partition columns so each inner value
    // gets one writer instead of files × sources
    val src = spark.read.parquet(dir)
      .filter(col("batch").isin(sources.toSeq: _*))
    // with inner partitions: one writer (= one file) per inner value;
    // flat sinks: `targetFiles` writers — fewer files is the goal, ONE
    // file would funnel the whole compacted corpus through one task
    val clustered =
      if (innerPartitions.nonEmpty)
        src.repartition(innerPartitions.map(col): _*)
      else src.repartition(targetFiles)
    clustered
      .withColumn("batch", lit(tag))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch" +: innerPartitions: _*)
      .parquet(dir)
    // completion marker: only now does the manifest shadow its sources —
    // a crash anywhere before this line leaves the sources authoritative
    fs.create(new Path(root, s"batch=$tag/$doneMarker"), true).close()

    // (3) sources are now shadowed by the completed manifest — deletes
    // are pure space reclamation and safe to lose
    sources.foreach(s => fs.delete(new Path(root, s"batch=$s"), true))
    sources.size
  }

  /** Read a batch-partitioned sink with compaction manifests applied:
    * sources of COMPLETE compactions are excluded even if their
    * partitions still linger after a crash-mid-delete.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val df = spark.read.parquet(dir)
    val dead = completedSources(fs, root)
    if (dead.isEmpty) df
    // batch is a partition column: the NOT IN prunes whole directories
    else df.filter(!col("batch").isin(dead.toSeq: _*))
  }

  /** Batch tags that are live data: on disk AND not shadowed by a
    * completed compaction.
    */
  private def liveBatchTags(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Set[String] = {
    val onDisk = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch="))
      .toSet
    onDisk -- completedSources(fs, root)
  }

  /** Sources named by manifests whose compact partition finished
    * writing ([[doneMarker]] present).
    */
  private def completedSources(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Set[String] = {
    val mdir = new Path(root, manifestDirName)
    if (!fs.exists(mdir)) return Set.empty
    fs.listStatus(mdir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
      .flatMap { s =>
        val tag = s.getPath.getName.stripSuffix(".json")
        if (fs.exists(new Path(root, s"batch=$tag/$doneMarker")))
          readManifest(fs, s.getPath)
        else Nil
      }
      .toSet
  }

  /** Clear interrupted attempts (manifest without a completed data
    * write) and finish completed ones' pending deletes.
    */
  private def finishInterrupted(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Unit = {
    val mdir = new Path(root, manifestDirName)
    if (!fs.exists(mdir)) return
    fs.listStatus(mdir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".json"))
      .foreach { s =>
        val tag = s.getPath.getName.stripSuffix(".json")
        val partDir = new Path(root, s"batch=$tag")
        if (fs.exists(new Path(partDir, doneMarker))) {
          // complete: finish the space reclamation a crash skipped, then
          // retire the manifest once every source is off disk — a
          // manifest outliving its purpose would shadow any FUTURE
          // batch that happened to mint a colliding tag, silently and
          // forever
          val sources = readManifest(fs, s.getPath)
          sources.foreach(src =>
            fs.delete(new Path(root, s"batch=$src"), true))
          if (sources.forall(src => !fs.exists(new Path(root, s"batch=$src"))))
            fs.delete(s.getPath, false)
        } else {
          // interrupted: sources are still authoritative — drop the
          // partial attempt entirely
          fs.delete(partDir, true)
          fs.delete(s.getPath, false)
        }
      }
  }

  // manifest format: one JSON array of source tag strings — parsed with
  // a tolerant hand parser to avoid a JSON dependency (tags are
  // [A-Za-z0-9-]+ by construction: uuid fragments and batch ids)
  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      root: Path, tag: String, sources: Set[String]): Unit = {
    val mdir = new Path(root, manifestDirName)
    fs.mkdirs(mdir)
    val body = sources.toSeq.sorted
      .map(s => "\"" + s + "\"").mkString("[", ",", "]")
    val tmp = new Path(mdir, s".$tag.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(mdir, s"$tag.json")))
      throw new IllegalStateException(
        s"could not publish compaction manifest for $tag under $mdir")
  }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      path: Path): Seq[String] = {
    val in = fs.open(path)
    val txt =
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        buf.toString("UTF-8")
      } finally in.close()
    txt.split("[\\[\\],]").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
  }
}
