package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Dev tool: scaling probe for the dedup/similarity family. Replicates
  * the documents/embeddings tables N× (with shifted ids + a cheap textual
  * perturbation so dup structure stays sparse) and times the operators at
  * 1× and N× to check the growth curve is ~linear — the local stand-in
  * for "would this hold at 1000×?".
  * Usage: runMain graft.tools.ScaleProbe [sfDir] [factor]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val n1 = docs1.count()
    // N copies: ids shifted, texts prefixed with a copy marker token so
    // copies are near-dups of the original (realistic dedup pressure)
    val docsN = spark.range(factor).crossJoin(docs1)
      .select((col("id") * n1 * 10 + col("doc_id")).as("doc_id"),
        concat(lit("copy"), col("id").cast("string"), lit(" "), col("text")).as("text"))
      .persist()
    val nN = docsN.count()

    val emb1 = Tables.load(spark, sfDir, "embeddings")
    val embN = spark.range(factor).crossJoin(emb1)
      .select((col("id") * 1000000 + col("vec_id")).as("vec_id"),
        col("embedding"))
      .persist()
    embN.count()

    // recursive tmp cleanup — several probes below write ~the corpus
    // size per call and a probe run must not fill the shared /tmp
    def rmTree(dir: String): Unit = {
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      // Files.walk holds a directory handle until closed — a probe run
      // calls this dozens of times and unclosed streams leak fds
      val walk = Files.walk(Paths.get(dir))
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
      finally walk.close()
    }

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    println(s"[scale] docs 1x=$n1  ${factor}x=$nN")
    // warm
    Dedup.minhashCandidates(docs1, col("doc_id"), col("text")).count()
    time(s"minhash candidates 1x")(
      Dedup.minhashCandidates(docs1, col("doc_id"), col("text")).count())
    time(s"minhash candidates ${factor}x")(
      Dedup.minhashCandidates(docsN, col("doc_id"), col("text")).count())
    time(s"simhash signatures 1x")(
      Dedup.simhashSignatures(docs1, col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text"))).count())
    time(s"simhash signatures ${factor}x")(
      Dedup.simhashSignatures(docsN, col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text"))).count())
    val q = emb1.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getAs[scala.collection.Seq[Float]](0).toSeq
    time("knn brute 1x")(
      Similarity.bruteForceKnn(emb1, col("vec_id"), col("embedding"), q, 10).count())
    time(s"knn brute ${factor}x")(
      Similarity.bruteForceKnn(embN, col("vec_id"), col("embedding"), q, 10).count())
    time(s"knn lsh multitable ${factor}x")(
      Similarity.lshKnnMultiTable(embN, col("vec_id"), col("embedding"), q,
        k = 10).count())
    import graft.operators.IvfIndex
    var idxN: IvfIndex.Index = null
    time(s"ivf build nList=32 ${factor}x") {
      idxN = IvfIndex.build(embN, col("vec_id"), col("embedding"), nList = 32)
      idxN.assigned.persist().count()
    }
    time(s"ivf search nProbe=8/32 ${factor}x")(
      IvfIndex.search(idxN, q, k = 10, nProbe = 8).count())
    time(s"exact dedup ${factor}x")(
      Dedup.exactGroups(docsN, col("doc_id"), col("text")).count())

    // semantic dedup: nList must scale with the corpus (hold the mean
    // cluster size ≈ n/nList constant) — that is the documented knob that
    // keeps the within-cluster pair stage linear overall
    time("semantic dedup 1x nList=16")(
      Similarity.semanticDedup(emb1, col("vec_id"), col("embedding"),
        nList = 16, eps = 0.33).count())
    time(s"semantic dedup ${factor}x nList=${16 * factor}")(
      Similarity.semanticDedup(embN, col("vec_id"), col("embedding"),
        nList = 16 * factor, eps = 0.33).count())

    // --- round-4 additions: substring/simhash pairs, shuffle positions ---
    Dedup.winnowPairs(docs1, col("doc_id"), col("text")).count() // warm
    time("winnow pairs 1x")(
      Dedup.winnowPairs(docs1, col("doc_id"), col("text")).count())
    time(s"winnow pairs ${factor}x")(
      Dedup.winnowPairs(docsN, col("doc_id"), col("text")).count())
    def sigsOf(d: org.apache.spark.sql.DataFrame) = d.select(col("doc_id"),
      org.apache.spark.sql.graft.TextExpressions.simhash60Md5(
        graft.functions.TextFunctions.rawTokens(col("text"))).as("simhash"))
      .filter(col("simhash").isNotNull)
    time("simhash pairs 1x")(Dedup.simhashPairs(sigsOf(docs1)).count())
    time(s"simhash pairs ${factor}x")(Dedup.simhashPairs(sigsOf(docsN)).count())
    import graft.operators.Sampling
    time("shuffle positions 1x")(
      Sampling.shufflePositions(docs1, col("doc_id")).count())
    time(s"shuffle positions ${factor}x")(
      Sampling.shufflePositions(docsN, col("doc_id")).count())
    // incremental ingest: probing a 1x delta into a (factor-1)x index vs
    // re-running batch dedup over the whole (factor)x corpus — the
    // daily-ingest claim in one measurement
    val idx = docsN.filter(col("doc_id") >= n1 * 10)
    time(s"batch re-dedup ${factor}x corpus")(
      Dedup.nearDuplicates(docsN, col("doc_id"), col("text"),
        threshold = 0.8).count())
    time(s"incremental probe 1x delta vs ${factor - 1}x index")(
      Dedup.incrementalNearDuplicates(idx, docs1,
        col("doc_id"), col("text"), threshold = 0.8).count())

    // --- core relational shapes (agg-below-join, window, semi join) ---
    val li1 = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_quantity"))
    val ord1 = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val liN = spark.range(factor).crossJoin(li1)
      .select((col("id") * 100000000L + col("l_orderkey")).as("l_orderkey"),
        col("l_extendedprice"), col("l_quantity")).persist()
    val ordN = spark.range(factor).crossJoin(ord1)
      .select((col("id") * 100000000L + col("o_orderkey")).as("o_orderkey"),
        col("o_custkey"), col("o_totalprice")).persist()
    println(s"[scale] lineitem 1x=${li1.count()} ${factor}x=${liN.count()}  " +
      s"orders ${factor}x=${ordN.count()}")
    def aggBelowJoin(li: org.apache.spark.sql.DataFrame,
        ord: org.apache.spark.sql.DataFrame): Long = {
      val rollup = li.groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"),
          count(lit(1)).as("items"))
      ord.join(rollup, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)), sum(col("cents")), sum(col("items")))
        .count()
    }
    aggBelowJoin(li1, ord1) // warm
    time("agg-below-join 1x")(aggBelowJoin(li1, ord1))
    time(s"agg-below-join ${factor}x")(aggBelowJoin(liN, ordN))
    def topPerKey(ord: org.apache.spark.sql.DataFrame): Long =
      ord.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .filter(col("rn") <= 3).count()
    time("window top-3/key 1x")(topPerKey(ord1))
    time(s"window top-3/key ${factor}x")(topPerKey(ordN))

    // --- temporal joins (round 4) ---
    val ev1 = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts_ns"), col("value"))
    val evN = spark.range(factor).crossJoin(ev1)
      .select((col("id") * 1000000000L + col("event_id")).as("event_id"),
        // keep key cardinality fixed (more events PER user — the
        // realistic growth axis for per-key sequential as-of work)
        col("user_id"), col("event_type"),
        (col("ts_ns") + col("id")).as("ts_ns"), col("value")).persist()
    println(s"[scale] events 1x=${ev1.count()} ${factor}x=${evN.count()}")
    def asof(ev: org.apache.spark.sql.DataFrame): Long = {
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_ns"))
      val ref = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_ns").as("ref_ts"))
        .agg(max(col("value")).as("v"))
      graft.operators.TemporalJoins
        .asofJoinBackward(probe, ref, "user_id", "ts_ns", "ref_ts", Seq("v"))
        .count()
    }
    asof(ev1) // warm
    time("asof join 1x")(asof(ev1))
    time(s"asof join ${factor}x")(asof(evN))
    def rangeJoin(ev: org.apache.spark.sql.DataFrame): Long = {
      val iv = spark.range(25).select(col("id").as("band"),
        (col("id") * 18.0).as("lo"), (col("id") * 18.0 + 50.0).as("hi"))
      graft.operators.TemporalJoins.binnedRangeJoin(
        ev.select(col("event_id"), col("value")), "value",
        iv, "lo", "hi", binWidth = 25.0).count()
    }
    time("binned range join 1x")(rangeJoin(ev1))
    time(s"binned range join ${factor}x")(rangeJoin(evN))
    // connected components: pathological mega-component (one chain per
    // user spanning every copy) to stress the distributed loop path too
    val edges = evN.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("event_id").asc)))
    val chain = edges.as("a").join(edges.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.rn") === col("b.rn") - 1)
      .select(col("a.event_id").as("id_a"), col("b.event_id").as("id_b"))
      .persist()
    println(s"[scale] chain edges=${chain.count()}")
    time(s"connected components local ${factor}x")(
      Dedup.duplicateClusters(chain).count())
    time(s"connected components distributed ${factor}x")(
      Dedup.duplicateClusters(chain, localEdgeThreshold = 0L).count())

    // --- round-5 additions: inverted index build/probe, profiling ---
    import graft.operators.InvertedIndex
    import graft.functions.TextFunctions
    def toks(c: org.apache.spark.sql.Column) = TextFunctions.wsTokens(c)
    InvertedIndex.build(docs1, col("doc_id"), toks(col("text"))).count() // warm
    time("inverted index build 1x")(
      InvertedIndex.build(docs1, col("doc_id"), toks(col("text"))).count())
    var idxDirN: String = null
    time(s"inverted index build+write ${factor}x") {
      idxDirN = java.nio.file.Files.createTempDirectory("graft_sp_idx").toString
      InvertedIndex.write(
        InvertedIndex.build(docsN, col("doc_id"), toks(col("text"))), idxDirN)
    }
    val diskIdx = InvertedIndex.read(spark, idxDirN)
    time(s"inverted index probe ${factor}x")(
      InvertedIndex.matchingIds(diskIdx, Seq("spar", "win"), prefix = true)
        .count())
    def profile(d: org.apache.spark.sql.DataFrame): Long = {
      val cols = Seq("doc_id", "text")
      cols.map { n =>
        d.agg(lit(n).as("column_name"), count(lit(1)).as("n_rows"),
          sum(when(col(n).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(n)).as("n_distinct"))
      }.reduce(_.unionAll(_)).count()
    }
    profile(docs1) // warm
    time("profile columns 1x")(profile(docs1))
    time(s"profile columns ${factor}x")(profile(docsN))

    // --- round-6 additions: boilerplate coverage, embedding outliers ---
    def boiler(d: org.apache.spark.sql.DataFrame): Long = {
      val docs = d.select(col("doc_id"), toks(col("text")).as("toks"))
      val tris = docs.select(col("doc_id"), size(col("toks")).as("n_toks"),
        posexplode(TextFunctions.trigrams(col("toks"))).as(Seq("pos", "tg")))
      val nd = docs.select(count(lit(1)).as("__nd"))
      val set = tris.select(col("doc_id"), col("tg")).distinct()
        .groupBy(col("tg")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nd))
        .filter(col("df") >= ceil(col("__nd") * lit(0.01)))
        .select(col("tg"))
      tris.join(broadcast(set), "tg").groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_occ")).count()
    }
    boiler(docs1) // warm
    time("boilerplate coverage 1x")(boiler(docs1))
    time(s"boilerplate coverage ${factor}x")(boiler(docsN))

    def outliers(e: org.apache.spark.sql.DataFrame): Long =
      Similarity.labelOutliers(e, col("vec_id"), col("embedding"),
        pmod(col("vec_id"), lit(10)).cast("int"), k = 3).count()
    outliers(emb1) // warm
    time("embedding outliers 1x")(outliers(emb1))
    time(s"embedding outliers ${factor}x")(outliers(embN))

    // --- late round-6 additions: knn graph, ADC, importance resampling ---
    // nList scales with the corpus (mean list size held ≈ n/nList) — the
    // same knob as semantic dedup; that is what keeps the within-cluster
    // pair stage, and hence the whole graph build, linear overall
    def graph(e: org.apache.spark.sql.DataFrame, nList: Int): Long =
      Similarity.knnGraph(
        Similarity.semanticAssign(e, col("vec_id"), col("embedding"), nList),
        k = 5).count()
    graph(emb1, 16) // warm
    time("knn graph 1x nList=16")(graph(emb1, 16))
    time(s"knn graph ${factor}x nList=${16 * factor}")(
      graph(embN, 16 * factor))

    import graft.operators.Embed
    def adc(e: org.apache.spark.sql.DataFrame): Long = {
      val codes = Embed.quantizeInt8(e, col("vec_id"), col("embedding"))
        .select(col("id").as("vec_id"), col("codes"))
      Similarity.adcKnn(codes, e, col("vec_id"), col("embedding"), q,
        k = 10, candidates = 50).count()
    }
    adc(emb1) // warm
    time("adc knn (quantize+search) 1x")(adc(emb1))
    time(s"adc knn (quantize+search) ${factor}x")(adc(embN))

    def importance(d: org.apache.spark.sql.DataFrame): Long = {
      val tok = d.select(col("doc_id"),
        (pmod(col("doc_id"), lit(3)) === 0).as("is_target"),
        posexplode(toks(col("text"))).as(Seq("pos", "tok")))
      Sampling.importanceScores(tok).count()
    }
    importance(docs1) // warm
    time("importance scores 1x")(importance(docs1))
    time(s"importance scores ${factor}x")(importance(docsN))

    // --- round-7 additions: export, archive verify, deletion execute ---
    // Synthetic archive at each scale: mime text from the doc text, 2/3
    // of the blobs zlib-deflated, every 311th corrupted (truncated), so
    // the verify pass has real positives to catch at scale.
    import graft.functions.Mime
    import graft.operators.{ArchiveVerify, DeletionStaging, Export}
    def archiveOf(d: org.apache.spark.sql.DataFrame) = {
      val base = d.select(col("doc_id").as("id"),
        concat(lit("src-"), col("doc_id")).as("source_message_id"),
        pmod(col("doc_id"), lit(5)).as("source_id"),
        lit(null).cast("timestamp").as("deleted_at"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("sent_at"),
        concat(lit("Subject: d"), col("doc_id"), lit("\n\n"), col("text"))
          .as("mime"))
      val deflated = Mime.deflateUdf(col("mime").cast("binary"))
      val raw = base.select(col("id").as("message_id"),
        when(pmod(col("id"), lit(3)) < 2, lit("zlib")).otherwise(lit("none"))
          .as("compression"),
        col("mime"))
        .withColumn("raw_data",
          when(col("compression") === "zlib",
            // every 311th blob corrupted: first 4 bytes of the stream
            when(pmod(col("message_id"), lit(311)) === 0,
              substring(deflated, 1, 4)).otherwise(deflated))
            .otherwise(col("mime").cast("binary")))
        .select(col("message_id"), col("compression"), col("raw_data"))
      (base, raw)
    }
    val (m1, r1) = archiveOf(docs1)
    val (mN, rN) = archiveOf(docsN)
    val srcs = spark.range(5).select(col("id"), lit("gmail").as("source_type"))
    ArchiveVerify.auditRaw(m1, r1, srcs).count() // warm
    time("archive verify 1x")(ArchiveVerify.auditRaw(m1, r1, srcs).count())
    time(s"archive verify ${factor}x")(
      ArchiveVerify.auditRaw(mN, rN, srcs).count())

    def mboxRound(m: org.apache.spark.sql.DataFrame): Long = {
      val out = java.nio.file.Files.createTempDirectory("graft_sp_mbox").toString
      Export.writeMbox(m, col("id"),
        Export.mboxRecord(col("source_message_id"), col("sent_at"),
          col("mime")), out)
      val n = Export.readMbox(spark, out).count()
      rmTree(out) // probe writes ~the corpus size per call
      n
    }
    mboxRound(m1) // warm
    time("mbox export+readback 1x")(mboxRound(m1))
    time(s"mbox export+readback ${factor}x")(mboxRound(mN))

    // deletion execute: 1% of the corpus staged as members; the scale
    // question is the member broadcast against the full message scan
    def delExec(m: org.apache.spark.sql.DataFrame): Long = {
      val members = m.filter(pmod(col("id"), lit(100)) === 0)
        .select(col("source_message_id").as("gmail_id"), col("source_id"))
      val (marked, stats) = DeletionStaging.execute(
        m.select(col("source_message_id"), col("source_id"),
          lit(null).cast("timestamp").as("deleted_from_source_at")),
        members, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
      stats.count()
      marked.filter(col("deleted_from_source_at").isNotNull).count()
    }
    delExec(m1) // warm
    time("deletion execute 1x")(delExec(m1))
    time(s"deletion execute ${factor}x")(delExec(mN))

    // --- streaming curation: per-delivery drain cost vs history size ---
    // The claim under test: one micro-batch's cost is bounded by the
    // BATCH (plus a columnar scan of history for candidate verify), not
    // by re-shingling the curated corpus — so a fixed delta against a
    // factor× history should grow far slower than factor×.
    import graft.streaming.DocStreaming
    val delta = docs1.select((col("doc_id") + 2000000000L).as("doc_id"),
      concat(lit("delta "), col("text")).as("text"))
    val emptyIdx = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("id bigint, text string"))
    val emptyBIdx = Dedup.indexedBandTable(emptyIdx, col("id"), col("text"))
    def drainAgainst(hist: org.apache.spark.sql.DataFrame,
        label: String): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_sp_cur").toString
      val cur = s"$tmp/curated"; val bands = s"$tmp/bands"
      // seed the stream's own history directly in its sink layout
      hist.select(col("doc_id"), col("text"), lit("seed").as("batch"))
        .write.partitionBy("batch").parquet(cur)
      Dedup.indexedBandTable(hist, col("doc_id"), col("text"))
        .withColumn("batch", lit("seed"))
        .write.partitionBy("batch").parquet(bands)
      time(label)(DocStreaming.curateBatch(spark, delta, emptyIdx,
        emptyBIdx, cur, bands, "probe-b1", minQuality = 0.0,
        threshold = 0.8))
      rmTree(tmp) // history + sidecar are corpus-sized per call
    }
    drainAgainst(docs1, "curation drain, 1x delta vs 1x history (warm)")
    drainAgainst(docs1, "curation drain, 1x delta vs 1x history")
    drainAgainst(docsN, s"curation drain, 1x delta vs ${factor}x history")

    // sink compaction: fold `factor` batch partitions of the 10x corpus
    // into one — the maintenance pass must stay a single linear rewrite
    {
      import graft.streaming.SinkCompaction
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_sp_cpt").toString
      val sink = s"$tmp/sink" // createTempDirectory pre-creates tmp —
                              // parquet's default ErrorIfExists would throw
      docsN.withColumn("batch",
          concat(lit("s-b"), pmod(col("doc_id"), lit(factor + 1))))
        .write.partitionBy("batch").parquet(sink)
      time(s"sink compaction, ${factor} of ${factor + 1} batches of ${factor}x docs")(
        SinkCompaction.compact(spark, sink))
      time("sink reclamation")(SinkCompaction.reclaim(spark, sink))
      rmTree(tmp)
    }

    // --- concurrent maintenance: drains + compaction + readers together ---
    // The lease serializes compact/reclaim, but the r8 probe matrix never
    // ran compaction WHILE drains and readers were live. Here 6 drain
    // batches of the factor× corpus append concurrently with TWO racing
    // maintenance threads (compact + reclaim; the lease must let exactly
    // one in at a time — refusals are the correct outcome for the loser)
    // and a polling reader. Invariants probed: a reader never sees fewer
    // rows than the batches fully appended before its read began
    // (manifest-first planning + the read retry on manifest change), and
    // the quiesced sink holds exactly every appended row — compaction
    // neither loses nor double-counts under live traffic.
    {
      import graft.streaming.SinkCompaction
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_sp_cmt").toString
      val sink = s"$tmp/sink"
      val nBatches = 6
      val slices = (0 until nBatches).map { k =>
        docsN.filter(pmod(col("doc_id"), lit(nBatches)) === k)
          .select(col("doc_id").as("id"), col("text").as("v"))
      }
      val sliceCounts = slices.map(_.count())
      val completed = new java.util.concurrent.atomic.AtomicLong(0L)
      val writersDone = new java.util.concurrent.atomic.AtomicBoolean(false)
      val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
      val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
      val readerViolations = new java.util.concurrent.atomic.AtomicInteger(0)
      val reads = new java.util.concurrent.atomic.AtomicInteger(0)
      // any exception OTHER than a lease refusal must fail the probe, not
      // silently kill its thread — a dead maintenance/reader thread would
      // let the conservation check "pass" without the concurrency scenario
      // ever running
      val unexpected =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      def maintenanceLoop(doReclaim: Boolean): Thread = {
        val t = new Thread(() => {
          while (!writersDone.get()) {
            try {
              if (doReclaim) SinkCompaction.reclaim(spark, sink)
              else { SinkCompaction.compact(spark, sink); compactions.incrementAndGet() }
            } catch {
              case _: IllegalStateException => refusals.incrementAndGet()
              case scala.util.control.NonFatal(e) => unexpected.add(e); ()
            }
            Thread.sleep(100)
          }
        })
        t.start(); t
      }
      val reader = new Thread(() => {
        while (!writersDone.get()) {
          try {
            val lowWater = completed.get()
            val c = SinkCompaction.read(spark, sink).count()
            reads.incrementAndGet()
            if (c < lowWater) readerViolations.incrementAndGet()
          } catch { case scala.util.control.NonFatal(e) => unexpected.add(e); () }
          Thread.sleep(50)
        }
      })
      time(s"concurrent drain+compact+read, $nBatches batches of ${factor}x docs")({
        // first batch lands before maintenance/readers start — both need
        // an existing sink dir
        slices.head.withColumn("batch", lit("s-b0"))
          .write.partitionBy("batch").parquet(sink)
        completed.set(sliceCounts.head)
        val threads = Seq(maintenanceLoop(false), maintenanceLoop(true))
        reader.start()
        (1 until nBatches).foreach { k =>
          slices(k).withColumn("batch", lit(s"s-b$k"))
            .write.mode("append").partitionBy("batch").parquet(sink)
          completed.addAndGet(sliceCounts(k))
        }
        writersDone.set(true)
        (threads :+ reader).foreach(_.join())
        // quiesce: one final exclusive fold + conservation check
        SinkCompaction.compact(spark, sink)
        val fin = SinkCompaction.read(spark, sink).count()
        val expect = sliceCounts.sum
        require(fin == expect, s"rows not conserved: $fin != $expect")
        require(readerViolations.get() == 0,
          s"${readerViolations.get()} reader(s) saw fewer rows than committed")
        require(unexpected.isEmpty, {
          val first = unexpected.peek()
          s"${unexpected.size()} unexpected error(s) in probe threads, " +
            s"first: $first"
        })
        // a run where EVERY compact attempt lost the lease race to the
        // reclaim thread still exercised the contention scenario — only
        // a maintenance thread that never attempted anything (dead or
        // never scheduled) voids the probe; thread deaths are caught by
        // the unexpected-errors check above
        require(compactions.get() > 0 || refusals.get() > 0,
          "no compaction attempt ran under live traffic — the probe " +
            "never exercised its scenario")
        s"rows=$fin reads=${reads.get()} compactions=${compactions.get()} " +
          s"lease_refusals=${refusals.get()} violations=0"
      })
      rmTree(tmp)
    }

    // split-safe mbox reassembly: ONE oversized shard (the foreign-mbox
    // shape the wholetext path cannot hold in a task) read through line
    // splits + the record-group shuffle — growth must be ~linear
    {
      def writeOneShard(m: org.apache.spark.sql.DataFrame): String = {
        val out = java.nio.file.Files
          .createTempDirectory("graft_sp_mrs").toString
        Export.writeMbox(m, col("id"),
          Export.mboxRecord(col("source_message_id"), col("sent_at"),
            col("mime")), out, shards = 1)
        out
      }
      val o1 = writeOneShard(m1)
      Export.readMboxReassemble(spark, o1).count() // warm
      time("mbox reassemble read, single oversized shard, 1x")(
        Export.readMboxReassemble(spark, o1).count())
      rmTree(o1)
      val oN = writeOneShard(mN)
      time(s"mbox reassemble read, single oversized shard, ${factor}x")(
        Export.readMboxReassemble(spark, oN).count())
      rmTree(oN)
    }
    spark.stop()
  }
}
