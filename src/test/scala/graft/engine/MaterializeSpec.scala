package graft.engine

import org.apache.spark.storage.StorageLevel
import graft.SparkTestBase
import graft.model._

/** The page-materialization strategy conf (spark.graft.page.materialize)
  * must change ONLY executor-loss behavior, never results: every mode
  * returns identical rows from the list/search surfaces, and the
  * consistency-critical snapshot path refuses to honor `persist`
  * (recompute-on-loss could observe a moved source — Materialize doc).
  */
class MaterializeSpec extends SparkTestBase {
  import Fixtures._

  private def conf = spark.conf

  private def withMode[A](mode: Option[String])(body: => A): A = {
    mode.fold(conf.unset(Materialize.ConfKey))(
      conf.set(Materialize.ConfKey, _))
    try body finally conf.unset(Materialize.ConfKey)
  }

  private lazy val v = vault(spark,
    messages = (1L to 20L).map(i => msg(i, s"subject $i",
      f"2024-01-${(i % 28) + 1}%02d 10:00:00", size = 100 + i,
      senderId = Some(i % 3))),
    recipients = (1L to 20L).map(i => MrRow(i, i % 3, "from", None)),
    participants = (0L to 2L).map(i => PRow(i, Some(s"p$i@x.com"),
      Some(s"P $i"), None, Some("x.com"))),
    labels = Seq(LblRow(1, "INBOX")),
    messageLabels = (1L to 20L).filter(_ % 2 == 0).map(MlRow(_, 1)))

  private def page(): Seq[String] = {
    val eng = new MsgEngine(v)
    eng.listMessages(MessageFilter(pagination = Pagination(limit = 8)))
      .collect().map(r => s"${r.getAs[Long]("id")}|${r.getAs[String]("from_email")}")
      .toSeq
  }

  test("all three modes return identical pages") {
    val base = withMode(None)(page())
    assert(base.nonEmpty)
    assert(withMode(Some("persist"))(page()) === base)
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    assert(withMode(Some("checkpoint"))(page()) === base)
    assert(withMode(Some("localCheckpoint"))(page()) === base)
  }

  test("bounded honors persist; snapshot refuses it (fail-honest)") {
    withMode(Some("persist")) {
      val df = v.messages.filter(org.apache.spark.sql.functions.col("id") <= 5)
      val b = Materialize.bounded(df)
      assert(b.storageLevel !== StorageLevel.NONE, "bounded should persist")
      val s = Materialize.snapshot(df)
      // persist maps to localCheckpoint on the snapshot path: the frame
      // must NOT carry a recomputable cache level
      assert(s.storageLevel === StorageLevel.NONE)
      assert(s.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
        "snapshot under persist conf must still truncate lineage")
      assert(s.count() === b.count())
      b.unpersist()
    }
  }

  test("persist mode bounds retained frames: the ring evicts the oldest") {
    // persist pins frames in the CacheManager by strong reference —
    // without the retention ring a long-lived engine would grow cache
    // entries unboundedly, one per page query (code-review finding r10)
    withMode(Some("persist")) {
      spark.conf.set(Materialize.RetainConfKey, "2")
      try {
        import org.apache.spark.sql.functions.lit
        val frames = (1 to 4).map { i =>
          Materialize.bounded(v.messages.filter(lit(i) === lit(i))
            .limit(i)) // distinct plans: no CacheManager key collision
        }
        assert(frames(0).storageLevel === StorageLevel.NONE,
          "oldest frame must be evicted once the cap is exceeded")
        assert(frames(1).storageLevel === StorageLevel.NONE)
        assert(frames(2).storageLevel !== StorageLevel.NONE)
        assert(frames(3).storageLevel !== StorageLevel.NONE)
        // evicted frames still RETURN correct rows (lineage intact —
        // persist-mode eviction only drops the cache, never the data)
        assert(frames(0).count() === 1)
        frames.foreach(_.unpersist())
      } finally spark.conf.unset(Materialize.RetainConfKey)
    }
  }

  test("releaseGraceMs defers ring eviction; the frame releases after the grace") {
    // an in-flight query reading an evicted checkpoint frame has no
    // lineage to recompute from — concurrent engines set the shared
    // grace knob so eviction retires instead of releasing immediately
    withMode(Some("persist")) {
      spark.conf.set(Materialize.RetainConfKey, "1")
      spark.conf.set("spark.graft.memo.releaseGraceMs", "300")
      try {
        import org.apache.spark.sql.functions.lit
        val first = Materialize.bounded(
          v.messages.filter(lit(101) === lit(101)).limit(1))
        val second = Materialize.bounded(
          v.messages.filter(lit(102) === lit(102)).limit(2))
        // first is past the cap but inside its grace: still cached
        assert(first.storageLevel !== StorageLevel.NONE,
          "grace must defer the release")
        Thread.sleep(350)
        // a later materialization drains the due retiree
        val third = Materialize.bounded(
          v.messages.filter(lit(103) === lit(103)).limit(3))
        assert(first.storageLevel === StorageLevel.NONE,
          "retiree must release once the grace elapses")
        Seq(second, third).foreach(_.unpersist())
      } finally {
        spark.conf.unset(Materialize.RetainConfKey)
        spark.conf.unset("spark.graft.memo.releaseGraceMs")
      }
    }
  }

  test("ring eviction releases ONLY the artifact, never nested localCheckpoint bases") {
    // the r11 concurrent-engines soak bug: release() walked the evicted
    // page's whole analyzed plan and unpersisted every LogicalRDD in it —
    // including the engine's own localCheckpointed star tables, which
    // have no lineage to recompute from. One page eviction then killed
    // every later query (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
    withMode(Some("persist")) {
      spark.conf.set(Materialize.RetainConfKey, "1")
      try {
        import org.apache.spark.sql.functions.lit
        val base = v.messages.localCheckpoint(true)
        val p1 = Materialize.bounded(base.filter(lit(201) === lit(201)).limit(3))
        val p2 = Materialize.bounded(base.filter(lit(202) === lit(202)).limit(4))
        // p1 is evicted; its release must not touch base's blocks
        assert(base.count() === 20,
          "nested localCheckpoint base must survive a ring eviction")
        Seq(p1, p2).foreach(_.unpersist())
        base.unpersist()
      } finally spark.conf.unset(Materialize.RetainConfKey)
    }
  }

  test("unknown mode is rejected, not defaulted") {
    withMode(Some("bogus")) {
      intercept[IllegalArgumentException] {
        Materialize.bounded(v.messages.limit(1))
      }
    }
  }
}
