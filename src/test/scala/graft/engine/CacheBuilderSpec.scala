package graft.engine

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.functions._

/** ETL + incremental build + engine extensions (detail/domains/gmail-ids/
  * texts-contacts) behavior tests.
  */
class CacheBuilderSpec extends SparkTestBase {
  import Fixtures._

  private def sourceVault(upTo: Int) = Fixtures.vault(spark,
    messages = (1 to upTo).map(i =>
      msg(i.toLong, s"subject $i", f"2024-${i % 12 + 1}%02d-10 10:00:00",
        size = 100L * i,
        msgType = if (i % 3 == 0) Some("imessage") else Some("email"),
        senderId = if (i % 3 == 0) Some(1L) else None)),
    recipients = (1 to upTo).flatMap(i => Seq(
      MrRow(i.toLong, (i % 2 + 1).toLong, "from", None),
      MrRow(i.toLong, 3L, "to", None))),
    participants = Seq(
      PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com")),
      PRow(2, Some("b@y.org"), Some("B"), None, Some("y.org")),
      PRow(3, Some("c@z.net"), Some("C"), None, Some("z.net"))),
    labels = Seq(LblRow(1, "INBOX")),
    messageLabels = (1 to upTo).map(i => MlRow(i.toLong, 1L)),
    attachments = Seq(AttRow(1, 1, "f.bin", "application/octet-stream", 10, "h")),
    sources = Seq(SrcRow(1, "acct@x.com", Some("gmail"))))

  test("full build then incremental append via watermark") {
    val out = java.nio.file.Files.createTempDirectory("graft_cache").toString

    val n1 = CacheBuilder.build(spark, sourceVault(6), out)
    assert(n1 == 6)
    assert(!CacheBuilder.needsBuild(spark, sourceVault(6), out))

    // grow the source → freshness gate trips → incremental exports only new ids
    assert(CacheBuilder.needsBuild(spark, sourceVault(9), out))
    val n2 = CacheBuilder.build(spark, sourceVault(9), out)
    assert(n2 == 3)

    val rebuilt = MsgVault.open(spark, out)
    assert(rebuilt.messages.count() == 9)
    // hive partition column present and prunable
    assert(rebuilt.messages.select(col("year")).distinct().count() >= 1)
    // junction shards merged transparently
    assert(rebuilt.recipients.count() == 18)
    // watermark recorded
    assert(CacheBuilder.readState(out).map(_.lastMessageId).contains(9L))

    // schema-version bump forces rebuild
    assert(!CacheBuilder.needsBuild(spark, sourceVault(9), out))
  }

  test("full rebuild truncates stale incremental partitions under session-dynamic overwrite") {
    // regression: the full-rebuild write relied on the session-default
    // partitionOverwriteMode; with dynamic set globally it only replaced
    // the batch=full partitions it emitted, leaving the old batch=w*
    // dirs in place — every pre-rebuild message then read TWICE
    val out = java.nio.file.Files.createTempDirectory("graft_cache_dyn").toString
    assert(CacheBuilder.build(spark, sourceVault(4), out) == 4)
    assert(CacheBuilder.build(spark, sourceVault(6), out) == 2) // batch=w4
    // force a full rebuild (lost state) with dynamic overwrite session-wide
    java.nio.file.Files.delete(java.nio.file.Paths.get(out, "_last_sync.json"))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try assert(CacheBuilder.build(spark, sourceVault(6), out) == 6)
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(MsgVault.open(spark, out).messages.count() == 6,
      "stale incremental partitions must not survive a full rebuild")
  }

  test("all-deleted tail advances the watermark — no eternal rebuild loop") {
    val out = java.nio.file.Files.createTempDirectory("graft_cache_wd").toString
    CacheBuilder.build(spark, sourceVault(6), out)
    // ids 7..8 arrive but are dedup losers (deleted) — nothing to export,
    // yet the watermark MUST advance: needsBuild keys on max id over ALL
    // rows, so a stale watermark would re-trigger a full-scan no-op build
    // on every scheduled cycle forever
    val withDeletedTail = Fixtures.vault(spark,
      messages = (1 to 6).map(i =>
        msg(i.toLong, s"subject $i", "2024-01-10 10:00:00")) ++
        Seq(msg(7L, "loser 7", "2024-02-10 10:00:00",
          deletedAt = Some("2024-02-11 10:00:00")),
          msg(8L, "loser 8", "2024-02-10 10:00:00",
            deletedAt = Some("2024-02-11 10:00:00"))),
      recipients = (1 to 8).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    assert(CacheBuilder.needsBuild(spark, withDeletedTail, out))
    assert(CacheBuilder.build(spark, withDeletedTail, out) == 0L)
    assert(CacheBuilder.readState(out).map(_.lastMessageId).contains(8L))
    assert(!CacheBuilder.needsBuild(spark, withDeletedTail, out)) // converged
    // the star itself is unchanged
    assert(MsgVault.open(spark, out).messages.count() == 6)
  }

  test("re-running a crashed incremental overwrites its own shard (idempotent retry)") {
    val out = java.nio.file.Files.createTempDirectory("graft_cache_retry").toString
    CacheBuilder.build(spark, sourceVault(6), out)
    CacheBuilder.build(spark, sourceVault(9), out) // increment w6: ids 7-9
    val once = MsgVault.open(spark, out)
    assert(once.messages.count() == 9 && once.recipients.count() == 18)
    // simulate "crashed before the state write, operator re-runs": rewind
    // the state to the pre-increment watermark and build again — the
    // batch=w6 shard must be REPLACED, not appended a second time
    CacheBuilder.writeStateForTest(out, 6L)
    CacheBuilder.build(spark, sourceVault(9), out)
    val twice = MsgVault.open(spark, out)
    assert(twice.messages.count() == 9, "retried increment duplicated messages")
    assert(twice.recipients.count() == 18, "retried increment duplicated junction rows")
    assert(CacheBuilder.readState(out).map(_.lastMessageId).contains(9L))
  }

  test("empty full rebuild fails before writing, with a clear message") {
    val out = java.nio.file.Files.createTempDirectory("graft_cache_empty").toString
    val allDeleted = Fixtures.vault(spark,
      messages = Seq(msg(1L, "gone", "2024-01-10 10:00:00",
        deletedAt = Some("2024-01-11 10:00:00"))),
      recipients = Seq(MrRow(1L, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    val e = intercept[IllegalArgumentException] {
      CacheBuilder.build(spark, allDeleted, out)
    }
    assert(e.getMessage.contains("0 live messages"))
    // nothing half-written, no state
    assert(!new java.io.File(s"$out/messages").exists())
    assert(CacheBuilder.readState(out).isEmpty)
  }

  test("undated rows are excluded from export and stay PENDING below the watermark") {
    // reference build_cache.go:308 (COPY WHERE sent_at IS NOT NULL) +
    // :156 (the id watermark is MAX(id) over DATED rows): an undated
    // message must not land in a null year partition, and must export on
    // the build after it gains a sent_at instead of being skipped forever
    val out = java.nio.file.Files.createTempDirectory("graft_cache_nd").toString
    val undated6 = Fixtures.vault(spark,
      messages = (1 to 5).map(i =>
        msg(i.toLong, s"subject $i", "2024-01-10 10:00:00")) :+
        msg(6L, "undated", "2024-02-10 10:00:00").copy(sent_at = null),
      recipients = (1 to 6).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    assert(CacheBuilder.build(spark, undated6, out) == 5)
    assert(CacheBuilder.readState(out).map(_.lastMessageId).contains(5L),
      "watermark must not advance past the undated row")
    val star1 = MsgVault.open(spark, out)
    assert(star1.messages.count() == 5)
    assert(star1.messages.filter(col("year").isNull).isEmpty,
      "no null year partition may exist")
    // junction rows of the undated message are NOT shipped dangling
    assert(star1.recipients.count() == 5)

    // the row gains a date upstream → the freshness gate trips and the
    // increment exports exactly it
    val dated6 = Fixtures.vault(spark,
      messages = (1 to 6).map(i =>
        msg(i.toLong, s"subject $i", "2024-01-10 10:00:00")),
      recipients = (1 to 6).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    assert(CacheBuilder.needsBuild(spark, dated6, out))
    assert(CacheBuilder.build(spark, dated6, out) == 1)
    val star2 = MsgVault.open(spark, out)
    assert(star2.messages.count() == 6)
    // the late-dated message's junction rows appear EXACTLY once — the
    // reference's raw full export + `message_id > watermark` increment
    // would carry them twice here (join fan-out); the uniform semi-join
    // closes that corner
    assert(star2.recipients.count() == 6)
    assert(CacheBuilder.readState(out).map(_.lastMessageId).contains(6L))
  }

  test("an undated row BELOW a dated id in its batch is passed over (reference semantics)") {
    // build_cache.go:156's MAX(id)-over-dated watermark moves past an
    // undated row when a higher dated id shares its batch — mirrored
    // exactly; the pending behavior holds only for undated TAILS
    // (previous test). r13 review pinned this second case.
    val out = java.nio.file.Files.createTempDirectory("graft_cache_nd2").toString
    val v = Fixtures.vault(spark,
      messages = Seq(
        msg(1L, "dated", "2024-01-10 10:00:00"),
        msg(2L, "undated mid", "2024-02-10 10:00:00").copy(sent_at = null),
        msg(3L, "dated later", "2024-03-10 10:00:00")),
      recipients = (1 to 3).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    assert(CacheBuilder.build(spark, v, out) == 2)
    assert(CacheBuilder.readState(out).map(_.lastMessageId).contains(3L),
      "the dated max advances the watermark past the undated row")
    // the row gains a date — but its id sits below the watermark: no
    // freshness trip, no export (the reference behaves identically)
    val dated = Fixtures.vault(spark,
      messages = Seq(
        msg(1L, "dated", "2024-01-10 10:00:00"),
        msg(2L, "undated mid", "2024-02-10 10:00:00"),
        msg(3L, "dated later", "2024-03-10 10:00:00")),
      recipients = (1 to 3).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    assert(!CacheBuilder.needsBuild(spark, dated, out))
    assert(MsgVault.open(spark, out).messages.count() == 2)
  }

  test("staleness: an incremental build must NOT erase a pending deletion signal") {
    // the gate compares the STAR against the input's deletion state
    // (exact, timestamp-free), so a bare incremental — which applies no
    // deletions — cannot clear a pending signal no matter what it
    // stamps; the reference's timestamp heuristic loses exactly this on
    // a bare `build-cache` run
    val out = java.nio.file.Files.createTempDirectory("graft_cache_ls").toString
    CacheBuilder.build(spark, sourceVault(6), out)
    // a deletion lands AFTER the build (future-stamped fixture), and new
    // mail arrives too
    def withDeleteAnd(upTo: Int) = Fixtures.vault(spark,
      messages = (1 to upTo).map { i =>
        val m = msg(i.toLong, s"subject $i", "2024-01-10 10:00:00")
        if (i == 2)
          m.copy(deleted_from_source_at = Some(ts("2031-01-01 00:00:00")))
        else m
      },
      recipients = (1 to upTo).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    // operator runs a bare incremental (no staleness consult) on the
    // grown source: the increment exports, the signal SURVIVES
    assert(CacheBuilder.build(spark, withDeleteAnd(8), out) == 2L)
    val st = CacheBuilder.staleness(spark, withDeleteAnd(8), out)
    assert(st.needsBuild && st.fullRebuild,
      "the deletion signal must survive an incremental build")

    // dedup-hide on a row with an OLD dfs stamp still trips the gate
    // (the corrected disjointness leg; the reference's dfs-IS-NULL
    // guard would miss it)
    val out2 = java.nio.file.Files.createTempDirectory("graft_cache_ls2").toString
    val oldDfs = Fixtures.vault(spark,
      messages = (1 to 4).map { i =>
        val m = msg(i.toLong, s"s$i", "2024-01-10 10:00:00")
        // id 2 was source-deleted long ago (pre-build stamp)
        if (i == 2)
          m.copy(deleted_from_source_at = Some(ts("2020-01-01 00:00:00")))
        else m
      },
      recipients = (1 to 4).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    CacheBuilder.build(spark, oldDfs, out2)
    val hidLate = Fixtures.vault(spark,
      messages = (1 to 4).map { i =>
        val m = msg(i.toLong, s"s$i", "2024-01-10 10:00:00")
        if (i == 2) m.copy(
          deleted_from_source_at = Some(ts("2020-01-01 00:00:00")),
          deleted_at = Some(ts("2031-01-01 00:00:00"))) // the late hide
        else m
      },
      recipients = (1 to 4).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    val st2 = CacheBuilder.staleness(spark, hidLate, out2)
    assert(st2.needsBuild && st2.fullRebuild &&
      st2.reasons.exists(_.contains("dedup-hidden")))
  }

  test("staleness: post-build deletions and dedup-hides force a FULL rebuild") {
    // reference tui.go:262-316: an already-exported row that is
    // source-deleted or dedup-hidden AFTER the build is stale in parquet;
    // only a full rebuild updates/removes it
    val out = java.nio.file.Files.createTempDirectory("graft_cache_st").toString
    CacheBuilder.build(spark, sourceVault(6), out)
    assert(!CacheBuilder.needsBuild(spark, sourceVault(6), out))

    // a deletion stamped AFTER the build (fixture uses a far-future
    // stamp so the test is independent of wall-clock)
    val withLateDeletes = Fixtures.vault(spark,
      messages = (1 to 6).map { i =>
        val m = msg(i.toLong, s"subject $i", "2024-01-10 10:00:00")
        if (i == 2) m.copy(deleted_at = Some(ts("2031-01-01 00:00:00")))
        else if (i == 3)
          m.copy(deleted_from_source_at = Some(ts("2031-01-01 00:00:00")))
        else m
      },
      recipients = (1 to 6).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    val st = CacheBuilder.staleness(spark, withLateDeletes, out)
    assert(st.needsBuild && st.fullRebuild)
    assert(st.reasons.exists(_.contains("deletions")) &&
      st.reasons.exists(_.contains("dedup-hidden")))
    // the forced rebuild drops the dedup loser and carries the
    // source-deletion stamp into the star
    CacheBuilder.build(spark, withLateDeletes, out, forceFull = true)
    val star = MsgVault.open(spark, out)
    assert(star.messages.count() == 5, "dedup loser must leave the star")
    assert(star.messages
      .filter(col("id") === 3 && col("deleted_from_source_at").isNotNull)
      .count() == 1, "source-deletion stamp must reach the star")
    // the input the star was rebuilt FROM reads fresh: the applied
    // deletions no longer count as stale (star-compare has no
    // timestamp-aging caveats)
    val st2 = CacheBuilder.staleness(spark, withLateDeletes, out)
    assert(!st2.needsBuild,
      "an APPLIED deletion must not keep tripping the gate")
    // while an input claiming id 3 was never deleted reports stale the
    // OTHER way — the star carries a dfs stamp that input lacks (the
    // un-delete leg; the reference's timestamp heuristic misses this
    // direction entirely)
    val st3 = CacheBuilder.staleness(spark, sourceVault(6), out)
    assert(st3.needsBuild && st3.fullRebuild &&
      st3.reasons.exists(_.contains("deletions")))
  }

  test("an EMPTIED archive full-rebuilds to a readable empty star and converges") {
    // r13 fourth review round: refusing the forced rebuild would loop
    // the gate's verdict forever while the star kept serving deleted
    // rows; the first-build-empty case stays loud
    val out = java.nio.file.Files.createTempDirectory("graft_cache_em").toString
    CacheBuilder.build(spark, sourceVault(3), out)
    val allGone = Fixtures.vault(spark,
      messages = (1 to 3).map(i =>
        msg(i.toLong, s"s$i", "2024-01-10 10:00:00",
          deletedAt = Some("2031-01-01 00:00:00"))),
      recipients = (1 to 3).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    val st = CacheBuilder.staleness(spark, allGone, out)
    assert(st.fullRebuild && st.reasons.exists(_.contains("dedup-hidden")))
    assert(CacheBuilder.build(spark, allGone, out, forceFull = true) == 0L)
    // the empty star stays READABLE (schema-complete empty tables)
    assert(MsgVault.open(spark, out).messages.count() == 0L)
    // and the gate converges
    assert(!CacheBuilder.needsBuild(spark, allGone, out))
    // a FIRST build on an empty input still fails loudly
    val fresh = java.nio.file.Files.createTempDirectory("graft_cache_em2").toString
    intercept[IllegalArgumentException] {
      CacheBuilder.build(spark, allGone, fresh)
    }

    // an operator-deleted state file must NOT turn the emptied-archive
    // rebuild back into the eternal first-build refusal — the table
    // files on disk prove a prior cache existed (r13 fifth review)
    java.nio.file.Files.delete(java.nio.file.Paths.get(out, "_last_sync.json"))
    assert(CacheBuilder.build(spark, allGone, out, forceFull = true) == 0L)
    assert(MsgVault.open(spark, out).messages.count() == 0L)

    assert(!CacheBuilder.needsBuild(spark, allGone, out))

    // the signed "no dated rows" watermark floor: an archive emptied
    // down to an UNDATED row records Long.MinValue (not a clamped 0),
    // so an id-0 row dated later still compares greater and exports —
    // and the Option-guarded new-ids leg keeps the empty state fresh
    // instead of phantom "new messages" (r13 fifth review)
    val out2 = java.nio.file.Files.createTempDirectory("graft_cache_em3").toString
    def oneRow(sentAt: Option[String]) = Fixtures.vault(spark,
      messages = Seq(sentAt.fold(
        msg(0L, "zero", "2024-01-10 10:00:00").copy(sent_at = null))(
        ts0 => msg(0L, "zero", ts0))),
      recipients = Seq(MrRow(0L, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    CacheBuilder.build(spark,
      Fixtures.vault(spark,
        messages = Seq(msg(1L, "seed", "2024-01-10 10:00:00")),
        recipients = Seq(MrRow(1L, 1L, "from", None)),
        participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com")))),
      out2)
    // the archive shrinks to a single UNDATED id-0 row: forced empty
    // rebuild records the MinValue floor
    assert(CacheBuilder.build(spark, oneRow(None), out2, forceFull = true) == 0L)
    assert(CacheBuilder.readState(out2).map(_.lastMessageId)
      .contains(Long.MinValue))
    assert(!CacheBuilder.needsBuild(spark, oneRow(None), out2))
    // the row gains a date: id 0 > MinValue trips the gate and exports
    assert(CacheBuilder.needsBuild(spark, oneRow(Some("2024-01-10 10:00:00")), out2))
    assert(CacheBuilder.build(spark,
      oneRow(Some("2024-01-10 10:00:00")), out2) == 1L)
    assert(MsgVault.open(spark, out2).messages.count() == 1L)
  }

  test("deepRestoreCheck sees a restored dedup-hidden row the cheap legs cannot") {
    val out = java.nio.file.Files.createTempDirectory("graft_cache_rs").toString
    def v(hideTwo: Boolean) = Fixtures.vault(spark,
      messages = (1 to 3).map { i =>
        val m = msg(i.toLong, s"s$i", "2024-01-10 10:00:00")
        if (i == 2 && hideTwo) m.copy(deleted_at = Some(ts("2024-02-01 00:00:00")))
        else m
      },
      recipients = (1 to 3).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    CacheBuilder.build(spark, v(hideTwo = true), out) // id 2 never exported
    // upstream RESTORES id 2 (deleted_at cleared): no deletion state
    // remains, its id sits below the watermark — invisible to the
    // cheap legs (and to the reference's heuristic)
    assert(!CacheBuilder.staleness(spark, v(hideTwo = false), out).needsBuild)
    val deep = CacheBuilder.staleness(spark, v(hideTwo = false), out,
      deepRestoreCheck = true)
    assert(deep.needsBuild && deep.fullRebuild &&
      deep.reasons.exists(_.contains("restored")))
    CacheBuilder.build(spark, v(hideTwo = false), out, forceFull = true)
    assert(MsgVault.open(spark, out).messages.count() == 3L)
    assert(!CacheBuilder.staleness(spark, v(hideTwo = false), out,
      deepRestoreCheck = true).needsBuild)
  }

  test("staleness: a row that arrives AND is source-deleted between builds trips the gate") {
    // r13 advisor find: the row's dfs stamp hides it from the new-ids
    // watermark leg (maxDated skips dfs-stamped rows, tui.go:236-239),
    // and it was never exported so the star inner-join legs miss it —
    // yet a rebuild's export (deleted_at IS NULL AND sent_at IS NOT
    // NULL) carries it, stamp visible on detail surfaces. The gate must
    // see the divergence from the star a rebuild would produce.
    val out = java.nio.file.Files.createTempDirectory("graft_cache_ad").toString
    CacheBuilder.build(spark, sourceVault(6), out)
    assert(!CacheBuilder.needsBuild(spark, sourceVault(6), out))
    // id 7 arrives and is source-deleted before any build runs
    val arrivedDeleted = Fixtures.vault(spark,
      messages = (1 to 6).map(i =>
        msg(i.toLong, s"subject $i", "2024-01-10 10:00:00")) :+
        msg(7L, "ghost", "2024-02-10 10:00:00",
          deletedFromSourceAt = Some("2024-02-11 10:00:00")),
      recipients = (1 to 7).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    val st = CacheBuilder.staleness(spark, arrivedDeleted, out)
    assert(st.needsBuild && st.fullRebuild &&
      st.reasons.exists(_.contains("deletions")),
      "arrive-and-source-delete between builds must force a rebuild")
    // the rebuild exports it, stamp and all, and the gate converges
    CacheBuilder.build(spark, arrivedDeleted, out, forceFull = true)
    val star = MsgVault.open(spark, out)
    assert(star.messages
      .filter(col("id") === 7 && col("deleted_from_source_at").isNotNull)
      .count() == 1, "rebuilt star must carry the arrived-deleted row")
    assert(!CacheBuilder.needsBuild(spark, arrivedDeleted, out))
  }

  test("boundedRestoreCheck catches a recent restore at O(new+window), advances coverage only when clean") {
    val out = java.nio.file.Files.createTempDirectory("graft_cache_br").toString
    def v(hidden: Set[Int]) = Fixtures.vault(spark,
      messages = (1 to 10).map { i =>
        val m = msg(i.toLong, s"s$i", "2024-01-10 10:00:00")
        if (hidden(i)) m.copy(deleted_at = Some(ts("2024-02-01 00:00:00")))
        else m
      },
      recipients = (1 to 10).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    // ids 2 (old) and 9 (recent) are dedup-hidden at build time
    CacheBuilder.build(spark, v(Set(2, 9)), out)
    // clean check covers to the watermark and records it
    assert(CacheBuilder.boundedRestoreCheck(spark, v(Set(2, 9)), out,
      recentWindow = 3) == 0L)
    assert(CacheBuilder.readRestoreCheckFloor(out) == 10L)
    // id 9 is RESTORED upstream (recent: within the window below the
    // watermark). The cheap staleness legs can't see it; the bounded
    // check probes only (floor=7, 10] + (covered=10, 10] — a fraction
    // of the corpus — and finds it
    assert(!CacheBuilder.staleness(spark, v(Set(2)), out).needsBuild)
    assert(CacheBuilder.boundedRestoreCheck(spark, v(Set(2)), out,
      recentWindow = 3) == 1L)
    // detection must NOT advance coverage — the next check still sees
    // the restore until a rebuild incorporates it
    assert(CacheBuilder.boundedRestoreCheck(spark, v(Set(2)), out,
      recentWindow = 3) == 1L)
    CacheBuilder.build(spark, v(Set(2)), out, forceFull = true)
    assert(CacheBuilder.boundedRestoreCheck(spark, v(Set(2)), out,
      recentWindow = 3) == 0L)
    // the honesty bound, demonstrated: restoring OLD id 2 (below the
    // coverage floor, outside the window) is invisible to the bounded
    // check — the exhaustive deep check still sees it
    assert(CacheBuilder.boundedRestoreCheck(spark, v(Set.empty), out,
      recentWindow = 3) == 0L)
    assert(CacheBuilder.staleness(spark, v(Set.empty), out,
      deepRestoreCheck = true).needsBuild)
  }

  test("staleness: un-delete and re-delete stamp changes both trip the gate") {
    // the exact compare is on VALUES, not null-ness (r13 fourth review
    // round): a star holding a stale dfs stamp — older, newer, or one
    // that was cleared upstream — must rebuild; the reference's
    // timestamp heuristic catches the re-delete but not the un-delete
    def v(dfs: Option[String]) = Fixtures.vault(spark,
      messages = Seq(
        msg(1L, "s1", "2024-01-10 10:00:00"),
        msg(2L, "s2", "2024-01-10 10:00:00",
          deletedFromSourceAt = dfs)),
      recipients = (1 to 2).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    val out = java.nio.file.Files.createTempDirectory("graft_cache_ud").toString
    CacheBuilder.build(spark, v(Some("2030-01-01 00:00:00")), out)
    // matching stamp → fresh
    assert(!CacheBuilder.needsBuild(spark, v(Some("2030-01-01 00:00:00")), out))
    // UN-deleted upstream (stamp cleared) → the star still hides it
    // under hideDeletedFromSource → rebuild
    val un = CacheBuilder.staleness(spark, v(None), out)
    assert(un.fullRebuild && un.reasons.exists(_.contains("deletions")))
    CacheBuilder.build(spark, v(None), out, forceFull = true)
    assert(!CacheBuilder.needsBuild(spark, v(None), out))
    // RE-deleted with a NEW stamp → value mismatch vs the star → rebuild
    val re = CacheBuilder.staleness(spark, v(Some("2031-06-01 00:00:00")), out)
    assert(re.fullRebuild && re.reasons.exists(_.contains("deletions")))
    CacheBuilder.build(spark, v(Some("2031-06-01 00:00:00")), out,
      forceFull = true)
    // stamp value now agrees — and an OLD-vs-NEW mismatch also trips
    assert(!CacheBuilder.needsBuild(spark,
      v(Some("2031-06-01 00:00:00")), out))
    assert(CacheBuilder.staleness(spark,
      v(Some("2032-01-01 00:00:00")), out).fullRebuild)
  }

  test("conversation_participants exports with the star and drives member counts") {
    // the reference's own TODO (duckdb_text.go:135) closed: membership
    // junction in the input → exported with the dims → reopened star
    // serves TRUE member counts, including members with zero messages
    // in the window; a star built WITHOUT it falls back to the
    // reference's sender-derived count
    val out = java.nio.file.Files.createTempDirectory("graft_cache_cp").toString
    val texts = Fixtures.vault(spark,
      messages = (1 to 4).map(i =>
        msg(i.toLong, s"t$i", "2024-01-10 10:00:00",
          msgType = Some("sms"), convId = 1L, senderId = Some(1L))),
      recipients = (1 to 4).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(
        PRow(1, None, Some("A"), Some("+1"), None),
        PRow(2, None, Some("B"), Some("+2"), None),
        PRow(3, None, Some("C"), Some("+3"), None)),
      conversations = Seq(ConvRow(1, "c1", Some("chat"), Some("group"))),
      // member 3 never sends — must still count
      conversationParticipants = Some(Seq(
        CpRow(1L, 1L), CpRow(1L, 2L), CpRow(1L, 3L))))
    CacheBuilder.build(spark, texts, out)
    val star = MsgVault.open(spark, out)
    assert(star.conversationParticipants.isDefined)
    assert(star.conversationParticipants.get.count() == 3)
    val eng = new MsgEngine(star)
    val row = eng.listConversations().collect().head
    assert(row.getAs[Long]("participant_count") == 3L,
      "junction star must count the silent member")
    // legacy star (no junction): sender-derived fallback — one sender
    val out2 = java.nio.file.Files.createTempDirectory("graft_cache_cp2").toString
    CacheBuilder.build(spark,
      texts.copy(conversationParticipants = None), out2)
    val old = MsgVault.open(spark, out2)
    assert(old.conversationParticipants.isEmpty)
    val row2 = new MsgEngine(old).listConversations().collect().head
    assert(row2.getAs[Long]("participant_count") == 1L,
      "legacy star must keep the sender-derived count")

    // a rebuild from a junction-LESS input must DELETE the prior
    // export (r14 review find) — leaving it would serve pre-rebuild
    // membership through the presence probe forever
    CacheBuilder.build(spark,
      texts.copy(conversationParticipants = None), out, forceFull = true)
    assert(MsgVault.open(spark, out).conversationParticipants.isEmpty,
      "stale conversation_participants must not survive a junction-less rebuild")

    // per-CONVERSATION fallback (r14 review find): junction present but
    // holding no rows for a conversation that has messages → the
    // sender-derived count, not 0
    val out3 = java.nio.file.Files.createTempDirectory("graft_cache_cp3").toString
    val twoConvs = Fixtures.vault(spark,
      messages = Seq(
        msg(1L, "t1", "2024-01-10 10:00:00", msgType = Some("sms"),
          convId = 1L, senderId = Some(1L)),
        msg(2L, "t2", "2024-01-10 11:00:00", msgType = Some("sms"),
          convId = 2L, senderId = Some(2L))),
      recipients = (1 to 2).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(
        PRow(1, None, Some("A"), Some("+1"), None),
        PRow(2, None, Some("B"), Some("+2"), None),
        PRow(3, None, Some("C"), Some("+3"), None)),
      conversations = Seq(ConvRow(1, "c1", Some("one"), Some("group")),
        ConvRow(2, "c2", Some("two"), Some("direct"))),
      // membership known only for conversation 1
      conversationParticipants = Some(Seq(
        CpRow(1L, 1L), CpRow(1L, 2L), CpRow(1L, 3L))))
    CacheBuilder.build(spark, twoConvs, out3)
    val rows3 = new MsgEngine(MsgVault.open(spark, out3))
      .listConversations().collect()
      .map(r => r.getAs[Long]("conversation_id") ->
        r.getAs[Long]("participant_count")).toMap
    assert(rows3(1L) == 3L, "junction-known conversation uses membership")
    assert(rows3(2L) == 1L,
      "junction-unknown conversation falls back to the sender count, not 0")
  }

  test("star subset (create-subset analogue): most-recent-N live, consistent, openable") {
    import graft.operators.StarSubset
    val out = java.nio.file.Files.createTempDirectory("graft_subset_spec")
      .resolve("star").toString
    val src = Fixtures.vault(spark,
      messages = (1 to 8).map { i =>
        val m = msg(i.toLong, s"s$i", f"2024-01-${10 + i}%02d 10:00:00",
          senderId = Some((i % 3 + 1).toLong))
        if (i == 8) m.copy(deleted_at = Some(ts("2024-02-01 00:00:00")))
        else if (i == 7)
          m.copy(deleted_from_source_at = Some(ts("2024-02-01 00:00:00")))
        else m
      },
      recipients = (1 to 8).map(i =>
        MrRow(i.toLong, (i % 2 + 1).toLong, "from", None)),
      participants = Seq(
        PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com")),
        PRow(2, Some("b@y.org"), Some("B"), None, Some("y.org")),
        PRow(3, Some("c@z.net"), Some("C"), None, Some("z.net")),
        // member-only participant: dropped by the subset's closure
        // (senders ∪ recipients of selected — subset.go:297-316)
        PRow(4, Some("d@w.io"), Some("D"), None, Some("w.io"))),
      labels = Seq(LblRow(1, "INBOX"), LblRow(2, "NEVER")),
      messageLabels = Seq(MlRow(5L, 1L), MlRow(1L, 1L)),
      attachments = Seq(
        AttRow(1, 5, "f.bin", "application/pdf", 10, "h1"),
        AttRow(2, 1, "g.bin", "application/pdf", 9, "h2")),
      conversationParticipants = Some(Seq(CpRow(1L, 1L), CpRow(1L, 4L))))
    val res = StarSubset.copySubset(spark, src, out, rows = 4)
    // live = ids 1-6 (7 is source-deleted, 8 dedup-hidden); most
    // recent 4 by sent_at = 3,4,5,6
    assert(res.messages == 4)
    val sub = MsgVault.open(spark, out)
    assert(sub.messages.select(col("id")).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(3L, 4L, 5L, 6L))
    // only message 5's label reference and attachment survive; label 2
    // (unreferenced) does not copy
    assert(sub.labels.count() == 1 && sub.messageLabels.count() == 1)
    assert(sub.attachments.count() == 1)
    // participants = senders {1,2,3} ∪ from-recipients {1,2} = {1,2,3};
    // the membership junction keeps only copied conversations AND
    // copied participants → (1,1) survives, (1,4) drops
    assert(res.participants == 3)
    assert(sub.conversationParticipants.isDefined &&
      sub.conversationParticipants.get.count() == 1)
    assert(StarSubset.integrityViolations(sub).isEmpty)
    // the full engine surface runs against the subset directly
    assert(new MsgEngine(sub).listMessages(MessageFilter()).count() == 4)
    // and the staleness gate reads it as a normal fresh star
    assert(!CacheBuilder.needsBuild(spark, sub, out))
    // destination-exists refusal (subset.go:40-44)
    intercept[IllegalArgumentException] {
      StarSubset.copySubset(spark, src, out, rows = 4)
    }
  }

  test("a cache missing a required table forces a FULL rebuild (self-heal)") {
    // reference build_cache.go:196-204: incrementing over a cache that
    // lost a table would silently drop every pre-loss row of that table
    val out = java.nio.file.Files.createTempDirectory("graft_cache_mt").toString
    CacheBuilder.build(spark, sourceVault(6), out)
    // lose the labels table (e.g. a partial copy/restore)
    val lbl = new org.apache.hadoop.fs.Path(s"$out/labels")
    lbl.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(lbl, true)
    val st = CacheBuilder.staleness(spark, sourceVault(6), out)
    assert(st.needsBuild && st.fullRebuild)
    assert(st.reasons.exists(_.contains("missing cache tables")))
    CacheBuilder.build(spark, sourceVault(6), out, forceFull = true)
    assert(MsgVault.open(spark, out).labels.count() == 1)
    assert(!CacheBuilder.needsBuild(spark, sourceVault(6), out))
  }

  test("engine over a built cache answers the flagship aggregate") {
    val out = java.nio.file.Files.createTempDirectory("graft_cache2").toString
    CacheBuilder.build(spark, sourceVault(6), out)
    val engine = new MsgEngine(MsgVault.open(spark, out))
    val rows = engine.aggregate(ViewType.Senders).collect()
    assert(rows.map(_.getString(0)).toSet == Set("a@x.com", "b@y.org"))
  }

  test("messageDetail returns participant lists, labels, attachments") {
    val engine = new MsgEngine(sourceVault(6))
    val d = engine.messageDetail(1L).collect()
    assert(d.length == 1)
    val row = d(0)
    val from = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("from")
    assert(from.map(_.getAs[String]("email")) == Seq("b@y.org"))
    assert(row.getAs[scala.collection.Seq[String]]("labels").toSeq == Seq("INBOX"))
    assert(row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("attachments").length == 1)
  }

  test("searchByDomains matches any participant role, email-only, any case") {
    val engine = new MsgEngine(sourceVault(6))
    // z.net is only ever a 'to' recipient; i%3==0 rows are imessage and
    // the surface is email-only (sqlite.go:1163) → 4 of 6 surface
    assert(engine.searchByDomains(Seq("z.net")).count() == 4)
    // case-insensitive on BOTH sides (sqlite.go:1155-1171)
    assert(engine.searchByDomains(Seq("Z.NET")).count() == 4)
    assert(engine.searchByDomains(Seq("nowhere.invalid")).count() == 0)
  }

  test("gmailIdsByFilter: gmail sources only, recency-ordered source_message_id out") {
    val engine = new MsgEngine(sourceVault(3))
    val ids = engine.gmailIdsByFilter(MessageFilter()).collect().map(_.getString(0))
    // sent_at DESC, id DESC (sqlite.go:1121-1135) — months 2,3,4 here
    assert(ids.toSeq == Seq("src-3", "src-2", "src-1"))
  }

  test("aggregateTextContacts: chat messages grouped by resolved contact") {
    val engine = new MsgEngine(sourceVault(9))
    // TextViewContacts keys by ADDRESS (phone else email —
    // duckdb_text.go:196-207; participant 1 has no phone → email)
    val out = engine.aggregateTextContacts().collect()
    // chat msgs are i%3==0 (3,6,9) all with sender_id=1
    assert(out.length == 1)
    assert(out(0).getString(0) == "a@x.com")
    assert(out(0).getLong(1) == 3)
    // TextViewContactNames keys by the display-name chain
    val names = engine.aggregateTextContactNames().collect()
    assert(names.length == 1)
    assert(names(0).getString(0) == "A")
  }

  test("streamBuild: checkpoint-driven incremental append (exactly-once per file)") {
    import org.apache.spark.sql.functions.col
    val src = java.nio.file.Files.createTempDirectory("graft_sb_src").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sb_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sb_ckpt").toString

    sourceVault(4).messages.write.parquet(s"$src/batch1")
    // file source needs a flat dir of files: point at the part files
    val flat = java.nio.file.Files.createTempDirectory("graft_sb_flat").toString
    def copyParts(from: String, tag: String): Unit = {
      val dir = new java.io.File(from)
      dir.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex
        .foreach { case (f, i) =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(flat, s"$tag-$i.parquet"))
        }
    }
    copyParts(s"$src/batch1", "a")
    CacheBuilder.streamBuild(spark, flat, out, ckpt)
    assert(spark.read.parquet(s"$out/messages").count() == 4)

    // new file arrives → re-run with the SAME checkpoint → only new rows
    sourceVault(6).messages.filter(col("id") > 4).write.parquet(s"$src/batch2")
    copyParts(s"$src/batch2", "b")
    CacheBuilder.streamBuild(spark, flat, out, ckpt)
    val after = spark.read.parquet(s"$out/messages")
    assert(after.count() == 6)
    assert(after.select(col("id")).distinct().count() == 6) // no re-ingest dups
  }

  test("streamBuild refuses a sink holding legacy un-namespaced batch tags") {
    // A pre-namespacing sink (bare batch=b<id>) whose last batch crashed
    // before the checkpoint commit would, after upgrade, replay under the
    // NEW <streamId>-b<id> tag and leave the old copy as a silent
    // duplicate — streamBuild must refuse with a migration message, not
    // proceed.
    val src = java.nio.file.Files.createTempDirectory("graft_sb_leg_src").toString
    val out = java.nio.file.Files.createTempDirectory("graft_sb_leg_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sb_leg_ck").toString
    sourceVault(2).messages.write.mode("overwrite").parquet(src)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out, "messages", "batch=b7"))
    val e = intercept[IllegalArgumentException] {
      CacheBuilder.streamBuild(spark, src, out, ckpt)
    }
    assert(e.getMessage.contains("batch=b7"))
    assert(e.getMessage.contains("legacy"))
  }

  test("gzip JSONL sink/source roundtrips rows; PERMISSIVE nulls corrupt lines") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val docs = Seq(
      (1L, "plain text", "en", "web", 10L),
      (2L, "line\nbreak \"quoted\" \\ slash", "en", "web", 26L),
      (3L, "unicode café 日本語", "fr", "books", 15L),
      (4L, null.asInstanceOf[String], "de", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(2).write.mode("overwrite")
      .option("compression", "gzip").json(s"$dir/out")
    val schema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    val back = spark.read.schema(schema).json(s"$dir/out")
    // full row fidelity — embedded newlines/quotes are escaped inside the
    // JSON string, so line-oriented JSONL survives them
    val a = docs.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val b = back.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(a == b)
    // PERMISSIVE: a corrupt line becomes a null row, not a failed ingest
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/mixed.jsonl"),
      "{\"doc_id\": 9, \"text\": \"ok\", \"lang\": \"en\", \"source\": \"w\", \"n_chars\": 2}\nnot json at all\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val mixed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(s"$dir/mixed.jsonl")
    assert(mixed.count() == 2)
    assert(mixed.filter(col("doc_id").isNull).count() == 1)
    assert(mixed.filter(col("doc_id") === 9 && col("text") === "ok").count() == 1)
  }

  test("boundedContentCheck: an in-place subject rewrite trips the gate") {
    // the reference's sync_runs.messages_updated direction (tui.go:319-349)
    // as a bounded probe: same id, same deletion state, CONTENT rewritten
    val out = java.nio.file.Files.createTempDirectory("graft_content").toString
    CacheBuilder.build(spark, sourceVault(6), out)

    def edited(editId: Long, newSubject: String, newSize: Long) =
      Fixtures.vault(spark,
        messages = (1 to 6).map { i =>
          if (i.toLong == editId)
            msg(i.toLong, newSubject, f"2024-${i % 12 + 1}%02d-10 10:00:00",
              size = newSize,
              msgType = if (i % 3 == 0) Some("imessage") else Some("email"),
              senderId = if (i % 3 == 0) Some(1L) else None)
          else
            msg(i.toLong, s"subject $i", f"2024-${i % 12 + 1}%02d-10 10:00:00",
              size = 100L * i,
              msgType = if (i % 3 == 0) Some("imessage") else Some("email"),
              senderId = if (i % 3 == 0) Some(1L) else None)
        },
        recipients = (1 to 6).flatMap(i => Seq(
          MrRow(i.toLong, (i % 2 + 1).toLong, "from", None),
          MrRow(i.toLong, 3L, "to", None))),
        participants = Seq(
          PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com")),
          PRow(2, Some("b@y.org"), Some("B"), None, Some("y.org")),
          PRow(3, Some("c@z.net"), Some("C"), None, Some("z.net"))),
        labels = Seq(LblRow(1, "INBOX")),
        messageLabels = (1 to 6).map(i => MlRow(i.toLong, 1L)),
        attachments =
          Seq(AttRow(1, 1, "f.bin", "application/octet-stream", 10, "h")),
        sources = Seq(SrcRow(1, "acct@x.com", Some("gmail"))))

    // clean source: no divergence at any window
    assert(CacheBuilder.boundedContentCheck(spark, sourceVault(6), out,
      recentWindow = 3) == 0)
    assert(CacheBuilder.boundedContentCheck(spark, sourceVault(6), out) == 0)

    // subject rewrite inside the recent window trips the bounded probe —
    // while the timestamp-free staleness gate (by design, the documented
    // divergence this leg closes) sees nothing
    val subjEdit = edited(5L, "subject 5 REWRITTEN", 500L)
    assert(!CacheBuilder.staleness(spark, subjEdit, out).needsBuild)
    assert(CacheBuilder.boundedContentCheck(spark, subjEdit, out,
      recentWindow = 3) == 1)

    // size_estimate rewrite trips too (second fingerprint field)
    val sizeEdit = edited(6L, "subject 6", 999999L)
    assert(CacheBuilder.boundedContentCheck(spark, sizeEdit, out,
      recentWindow = 3) == 1)

    // honesty bound: a rewrite BELOW the window floor is invisible to the
    // bounded probe; the exhaustive form (recentWindow <= 0) sees it
    val oldEdit = edited(1L, "subject 1 REWRITTEN", 100L)
    assert(CacheBuilder.boundedContentCheck(spark, oldEdit, out,
      recentWindow = 3) == 0)
    assert(CacheBuilder.boundedContentCheck(spark, oldEdit, out) == 1)

    // a rebuild clears the divergence
    CacheBuilder.build(spark, subjEdit, out, forceFull = true)
    assert(CacheBuilder.boundedContentCheck(spark, subjEdit, out) == 0)
  }

  test("aggregateTextSources / aggregateTextTime: chat-only buckets") {
    val engine = new MsgEngine(sourceVault(9))
    // TextViewSources keys by source TYPE, not account identifier
    // (duckdb_text.go:220-225)
    val bySrc = engine.aggregateTextSources().collect()
    assert(bySrc.length == 1)
    assert(bySrc(0).getString(0) == "gmail" && bySrc(0).getLong(1) == 3)
    // chat msgs 3,6,9 → months 2024-04, 2024-07, 2024-10 (i%12+1)
    val byTime = engine.aggregateTextTime().collect().map(_.getString(0)).toSeq
    assert(byTime == Seq("2024-04", "2024-07", "2024-10"))
  }
}
