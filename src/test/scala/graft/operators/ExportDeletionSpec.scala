package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Export framing/sanitization (reference cmd/export_eml.go,
  * internal/export/attachments.go) and the staged-deletion lifecycle
  * (internal/deletion/manifest.go state machine + executor effects).
  */
class ExportDeletionSpec extends SparkTestBase {

  // --- mboxrd framing -------------------------------------------------------

  test("mbox write/read roundtrips payloads exactly, including From-lines") {
    import spark.implicits._
    val rows = Seq(
      (1L, "id-a", "Subject: a\n\nplain body"),
      (2L, "id-b", "Subject: b\n\nFrom the start\n>From quoted\n>>From deep"),
      (3L, "id-c", "Subject: c\n\nbody ending in newline\n"),
      (4L, "id-d", ""), // empty payload
      (5L, "id-e", "From immediately"))
      .toDF("id", "src", "mime")
      .withColumn("sent_at", to_timestamp(lit("2024-01-02 03:04:05")))
    val out = java.nio.file.Files.createTempDirectory("graft_mbox_spec").toString
    Export.writeMbox(rows, col("id"),
      Export.mboxRecord(col("src"), col("sent_at"), col("mime")), out)
    val back = Export.readMbox(spark, out)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows.collect().foreach { r =>
      assert(back(r.getAs[String]("src")) == r.getAs[String]("mime"),
        s"payload for ${r.getAs[String]("src")} did not roundtrip")
    }
  }

  test("CRLF payloads roundtrip exactly — quoted From-lines unquote despite \\r") {
    import spark.implicits._
    val mime = "Subject: crlf\r\n\r\nFrom the top\r\n>From quoted\r\nbody\r\n"
    val rows = Seq((1L, "id-crlf", mime)).toDF("id", "src", "mime")
      .withColumn("sent_at", to_timestamp(lit("2024-01-02 03:04:05")))
    val out = java.nio.file.Files.createTempDirectory("graft_mbox_crlf").toString
    Export.writeMbox(rows, col("id"),
      Export.mboxRecord(col("src"), col("sent_at"), col("mime")), out)
    val back = Export.readMbox(spark, out).collect()
    assert(back.head.getString(1) == mime,
      s"CRLF payload corrupted: ${back.head.getString(1).replace("\r", "\\r")}")
  }

  test("null sent_at exports with the epoch envelope; null mime rows are skipped") {
    import spark.implicits._
    val rows = Seq(
      (1L, "id-nodate", Some("Subject: x\n\nbody")),
      (2L, "id-nomime", Option.empty[String]))
      .toDF("id", "src", "mime")
      .withColumn("sent_at",
        when(col("id") === 1L, lit(null).cast("timestamp")))
    val out = java.nio.file.Files.createTempDirectory("graft_mbox_null").toString
    // must not crash the write task
    Export.writeMbox(rows, col("id"),
      Export.mboxRecord(col("src"), col("sent_at"), col("mime")), out)
    val back = Export.readMbox(spark, out).collect()
    assert(back.length == 1) // the null-mime row is skipped, not fatal
    assert(back.head.getString(0) == "id-nodate")
    assert(back.head.getString(1) == "Subject: x\n\nbody")
  }

  test("caller-sized shard count roundtrips exactly (reader memory knob)") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (i, s"id-$i", s"Subject: s$i\n\nbody $i"))
      .toDF("id", "src", "mime")
      .withColumn("sent_at", to_timestamp(lit("2024-01-02 03:04:05")))
    val out = java.nio.file.Files.createTempDirectory("graft_mbox_sh").toString
    Export.writeMbox(rows, col("id"),
      Export.mboxRecord(col("src"), col("sent_at"), col("mime")), out,
      shards = 5)
    val parts = new java.io.File(out).listFiles
      .filter(f => f.getName.startsWith("shard-") && f.length > 0)
    assert(parts.length <= 5, s"expected ≤5 shards, got ${parts.length}")
    val back = Export.readMbox(spark, out).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == (1L to 40L).map(i =>
      (s"id-$i", s"Subject: s$i\n\nbody $i")).toSet)
  }

  test("normalizeShardNames: concatenation order survives the part-%05d digit rollover") {
    import java.nio.file.Files
    // simulate a >100k-shard export: hand-written part files whose Spark
    // names straddle the 5-digit rollover, contents in task order
    val out = Files.createTempDirectory("graft_mbox_big")
    val inOrder = Seq(
      "part-00007-aaaa.txt" -> "From a 1\nbody-a\n\n",
      "part-99999-bbbb.txt" -> "From b 1\nbody-b\n\n",
      "part-100000-cccc.txt" -> "From c 1\nbody-c\n\n",
      "part-100001-dddd.txt" -> "From d 1\nbody-d\n\n")
    inOrder.foreach { case (n, c) =>
      Files.write(out.resolve(n), c.getBytes("UTF-8")); ()
    }
    // the defect being fixed: raw names do NOT sort in task order
    assert(inOrder.map(_._1).sorted != inOrder.map(_._1))
    assert(Export.normalizeShardNames(spark, out.toString) == 4)
    val renamed = new java.io.File(out.toString).listFiles.map(_.getName).sorted
    assert(renamed.toSeq == (0 to 3).map(i => f"shard-$i%09d.mbox"))
    // filename-ordered concatenation is the task-ordered mbox
    val cat = renamed.map(f =>
      new String(Files.readAllBytes(out.resolve(f)), "UTF-8")).mkString
    assert(Export.parseMboxText(cat).map(_._1) == Seq("a", "b", "c", "d"))
  }

  test("normalizeShardNames: resumes a crashed partial pass via its rename plan") {
    import java.nio.file.Files
    // a crash mid-pass (some distributed rename tasks done, others not)
    // leaves a NON-prefix set of shard files PLUS the plan the pass
    // published before its first rename; the resume must replay the
    // recorded assignment — restarting at rank 0 would silently
    // overwrite shard-000000000.mbox
    val out = Files.createTempDirectory("graft_mbox_resume")
    Files.write(out.resolve("shard-000000000.mbox"),
      "From a 1\nbody-a\n\n".getBytes("UTF-8"))
    Files.write(out.resolve("shard-000000002.mbox"),
      "From c 1\nbody-c\n\n".getBytes("UTF-8"))
    Files.write(out.resolve("part-00001-bbbb.txt"),
      "From b 1\nbody-b\n\n".getBytes("UTF-8"))
    Files.write(out.resolve("part-00003-dddd.txt"),
      "From d 1\nbody-d\n\n".getBytes("UTF-8"))
    Files.write(out.resolve("_rename_plan"),
      ("4\n" +
        "part-00000-aaaa.txt\tshard-000000000.mbox\n" +
        "part-00001-bbbb.txt\tshard-000000001.mbox\n" +
        "part-00002-cccc.txt\tshard-000000002.mbox\n" +
        "part-00003-dddd.txt\tshard-000000003.mbox\n").getBytes("UTF-8"))
    assert(Export.normalizeShardNames(spark, out.toString) == 2)
    val renamed = new java.io.File(out.toString).listFiles.map(_.getName).sorted
    assert(renamed.toSeq == (0 to 3).map(i => f"shard-$i%09d.mbox"),
      "plan retired, surviving parts slotted into their recorded ranks")
    val cat = renamed.map(f =>
      new String(Files.readAllBytes(out.resolve(f)), "UTF-8")).mkString
    assert(Export.parseMboxText(cat).map(_._1) == Seq("a", "b", "c", "d"))
  }

  test("normalizeShardNames: plan-less shard+part mixtures are refused, not guessed") {
    import java.nio.file.Files
    // a COMPLETED pass (plan retired) plus a second export's part files
    // is indistinguishable from a crash by position alone — positional
    // refill would interleave the two exports' buckets silently; only a
    // recorded plan makes a mixture resumable
    val bad = Files.createTempDirectory("graft_mbox_badresume")
    Files.write(bad.resolve("shard-000000000.mbox"), "x".getBytes("UTF-8"))
    Files.write(bad.resolve("part-00000-aaaa.txt"), "y".getBytes("UTF-8"))
    intercept[IllegalArgumentException](
      Export.normalizeShardNames(spark, bad.toString))
    // a part file the plan never recorded (second export into a
    // mid-rename dir) is refused too
    val bad2 = Files.createTempDirectory("graft_mbox_badplan")
    Files.write(bad2.resolve("part-00000-zzzz.txt"), "y".getBytes("UTF-8"))
    Files.write(bad2.resolve("_rename_plan"),
      "1\npart-00000-aaaa.txt\tshard-000000000.mbox\n".getBytes("UTF-8"))
    intercept[IllegalArgumentException](
      Export.normalizeShardNames(spark, bad2.toString))
    // a TRUNCATED plan (count header says more entries than survive a
    // copy-based rename) is refused loudly, never silently resumed
    val bad3 = Files.createTempDirectory("graft_mbox_truncplan")
    Files.write(bad3.resolve("part-00000-aaaa.txt"), "y".getBytes("UTF-8"))
    Files.write(bad3.resolve("_rename_plan"),
      "2\npart-00000-aaaa.txt\tshard-000000000.mbox\n".getBytes("UTF-8"))
    intercept[IllegalArgumentException](
      Export.normalizeShardNames(spark, bad3.toString))
  }

  // tricky payload set for the split-safe reader: records larger than a
  // split, trailing newlines, interior blank lines, quoted From-lines,
  // CRLF — every way a record can straddle or confuse a line split
  private def splitStressRows = {
    import spark.implicits._
    (1L to 120L).map { i =>
      val body = i % 6 match {
        case 0 => s"Subject: s$i\n\n" + ("x" * 80 + "\n") * 40 // multi-split record
        case 1 => s"Subject: s$i\n\nends in newline\n"
        case 2 => s"Subject: s$i\n\nends in blank line\n\n"
        case 3 => s"Subject: s$i\n\nFrom the top\n>From quoted\n>>From deep"
        case 4 => s"Subject: s$i\r\n\r\nFrom crlf\r\nbody\r\n"
        case _ => s"Subject: s$i\n\nplain $i"
      }
      (i, s"id-$i", body)
    }.toDF("id", "src", "mime")
      .withColumn("sent_at", to_timestamp(lit("2024-01-02 03:04:05")))
  }

  test("readMboxReassemble is exact across forced sub-record line splits") {
    val rows = splitStressRows
    val out = java.nio.file.Files.createTempDirectory("graft_mbox_split").toString
    Export.writeMbox(rows, col("id"),
      Export.mboxRecord(col("src"), col("sent_at"), col("mime")), out,
      shards = 2) // two shards, each far larger than the forced split
    val expected = rows.collect()
      .map(r => r.getAs[String]("src") -> r.getAs[String]("mime")).toSet
    val whole = Export.readMbox(spark, out).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(whole == expected)
    // force ~2 kB splits: every 6k-char record spans several splits
    val re = Export.readMboxReassemble(spark, out, splitMaxBytes = 2048)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(re == expected,
      "split-safe reassembly must equal the wholetext parse exactly")
  }

  test("readMbox dispatches to the split-safe path for oversized shards") {
    val rows = splitStressRows
    val out = java.nio.file.Files.createTempDirectory("graft_mbox_disp").toString
    Export.writeMbox(rows, col("id"),
      Export.mboxRecord(col("src"), col("sent_at"), col("mime")), out,
      shards = 2)
    val expected = rows.collect()
      .map(r => r.getAs[String]("src") -> r.getAs[String]("mime")).toSet
    // a 1 kB per-task bound forces the reassemble route (shards are
    // tens of kB) — result must be identical to the fast path
    val got = Export.readMbox(spark, out, maxInTaskShardBytes = 1024)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expected)
  }

  test("envelope ids containing whitespace are folded, not truncated") {
    import spark.implicits._
    val rows = Seq((1L, "id with spaces", "Subject: s\n\nbody"))
      .toDF("id", "src", "mime")
      .withColumn("sent_at", to_timestamp(lit("2024-01-02 03:04:05")))
    val out = java.nio.file.Files.createTempDirectory("graft_mbox_ws").toString
    Export.writeMbox(rows, col("id"),
      Export.mboxRecord(col("src"), col("sent_at"), col("mime")), out)
    val back = Export.readMbox(spark, out).collect()
    assert(back.length == 1)
    assert(back.head.getString(0) == "id_with_spaces") // folded, complete
    assert(back.head.getString(1) == "Subject: s\n\nbody")
  }

  test("parseMboxText: quoting depth reduces by exactly one level") {
    val txt = "From a 2024\nbody\n>From was-quoted\n>>From deeper\n\n"
    val Seq((id, mime)) = Export.parseMboxText(txt)
    assert(id == "a")
    assert(mime == "body\nFrom was-quoted\n>From deeper")
  }

  test("parseMboxText: empty input and no-final-newline tolerance") {
    assert(Export.parseMboxText("") == Nil)
    assert(Export.parseMboxText("From x 1\npayload\n\n") ==
      Seq(("x", "payload")))
  }

  // --- eml filename (export_eml.go:70-85) ----------------------------------

  test("emlFilename sanitizes separators, falls back on empty and dot") {
    import spark.implicits._
    val out = Seq("a/b", "a\\b", "INBOX/Sent", "", ".", "..", "plain")
      .toDF("s")
      .select(Export.emlFilename(col("s"))).as[String].collect()
    assert(out.toSeq == Seq("a_b.eml", "a_b.eml", "INBOX_Sent.eml",
      "message.eml", "message.eml", "...eml", "plain.eml"))
  }

  // --- content-hash validation + zip naming (attachments.go) ----------------

  test("isValidSha256Hex accepts 64 hex of either case, rejects the rest") {
    import spark.implicits._
    val ok = "a" * 64
    val cases = Seq(ok, ok.toUpperCase, "z" * 64, "a" * 63, "a" * 65, "")
    val got = cases.toDF("h").select(Export.isValidSha256Hex(col("h")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, true, false, false, false, false))
  }

  test("attachmentZipManifest: suffixes in id order, invalid rows keep no name") {
    import spark.implicits._
    val h = "b" * 64
    val att = Seq(
      (10L, "r:1.pdf", h, 5L), // -> r_1.pdf
      (20L, "r:1.pdf", h, 5L), // collision -> r_1_2.pdf
      (30L, "r:1.pdf", "bad", 5L), // invalid: no name, no slot consumed
      (40L, "r:1.pdf", h, 5L), // -> r_1_3.pdf (30 did not take a slot)
      (50L, "", h, 5L), // empty name -> content hash
      (60L, "noext", h, 5L))
      .toDF("id", "fn", "hash", "sz")
    val got = Export.attachmentZipManifest(att, col("id"), col("fn"),
      col("hash"), col("sz"))
      .collect().map(r => r.getAs[Long]("attachment_id") ->
        Option(r.getAs[String]("zip_name"))).toMap
    assert(got(10L).contains("r_1.pdf"))
    assert(got(20L).contains("r_1_2.pdf"))
    assert(got(30L).isEmpty)
    assert(got(40L).contains("r_1_3.pdf"))
    assert(got(50L).contains(h))
    assert(got(60L).contains("noext"))
  }

  test("attachment names take the basename BEFORE sanitizing (Go Base order)") {
    import spark.implicits._
    val h = "c" * 64
    val att = Seq(
      (1L, "dir/sub/file.pdf", h, 1L), // basename, not dir_sub_file.pdf
      (2L, "trailing/slashes///", h, 1L), // Base drops trailing slashes
      (3L, "mixed/dir/we:ird.pdf", h, 1L), // base then ':' sanitized
      (4L, "///", h, 1L)) // Go Base("///") = "/" -> sanitized "_", NOT the hash
      .toDF("id", "fn", "hash", "sz")
    val got = Export.attachmentZipManifest(att, col("id"), col("fn"),
      col("hash"), col("sz"))
      .collect().map(r => r.getAs[Long]("attachment_id") ->
        r.getAs[String]("zip_name")).toMap
    assert(got(1L) == "file.pdf")
    assert(got(2L) == "slashes")
    assert(got(3L) == "we_ird.pdf")
    assert(got(4L) == "_")
  }

  // --- output path guard ----------------------------------------------------

  test("validateOutputPath rejects absolute, traversal, drive paths") {
    assert(Export.validateOutputPath("out/x.zip").isRight)
    assert(Export.validateOutputPath("x.zip").isRight)
    assert(Export.validateOutputPath("/etc/cron.d/evil").isLeft)
    assert(Export.validateOutputPath("../../.ssh/authorized_keys").isLeft)
    assert(Export.validateOutputPath("a/../../escape").isLeft)
    assert(Export.validateOutputPath("C:stuff").isLeft)
    assert(Export.validateOutputPath("\\\\server\\share").isLeft)
    assert(Export.validateOutputPath("a/../inside").isRight) // normalizes to "inside"
  }

  // --- deletion staging lifecycle -------------------------------------------

  private def mkCandidates(n: Int, sourceType: String = "gmail") = {
    import spark.implicits._
    (1 to n).map(i => (s"g-$i", i.toLong % 2, sourceType, 100L + i,
      java.sql.Timestamp.valueOf(s"2024-01-0${i % 9 + 1} 00:00:00")))
      .toDF("gmail_id", "source_id", "source_type", "size_estimate", "sent_at")
  }

  test("stage writes members + header summary + pending status") {
    val base = java.nio.file.Files.createTempDirectory("graft_del1").toString
    DeletionStaging.stage(spark, base, "m1", "test batch", mkCandidates(5))
    val h = DeletionStaging.headers(spark, base).collect()
    assert(h.length == 1)
    assert(h.head.getAs[Long]("message_count") == 5L)
    assert(h.head.getAs[Long]("total_size_bytes") == (101L to 105L).sum)
    assert(h.head.getAs[Long]("n_accounts") == 2L)
    val st = DeletionStaging.currentStatus(spark, base).collect()
    assert(st.head.getAs[String]("status") == DeletionStaging.Pending)
    assert(DeletionStaging.members(spark, base, "m1").count() == 5L)
  }

  test("re-staging the same manifest id is idempotent (no duplicate header)") {
    val base = java.nio.file.Files.createTempDirectory("graft_del_re").toString
    DeletionStaging.stage(spark, base, "m1", "first", mkCandidates(3))
    // crashed-and-retried stage: same id, fresh candidate set
    DeletionStaging.stage(spark, base, "m1", "retry", mkCandidates(4))
    val h = DeletionStaging.headers(spark, base).collect()
    assert(h.length == 1, s"duplicate headers after re-stage: ${h.length}")
    assert(h.head.getAs[Long]("message_count") == 4L) // the retry's truth
    assert(DeletionStaging.members(spark, base, "m1").count() == 4L)
  }

  test("stage refuses empty and non-gmail candidate sets") {
    val base = java.nio.file.Files.createTempDirectory("graft_del2").toString
    intercept[IllegalArgumentException] {
      DeletionStaging.stage(spark, base, "m-empty", "x", mkCandidates(0))
    }
    intercept[IllegalArgumentException] {
      DeletionStaging.stage(spark, base, "m-imap", "x",
        mkCandidates(3, sourceType = "imap"))
    }
  }

  test("status machine: legal path walks, illegal edges throw") {
    val base = java.nio.file.Files.createTempDirectory("graft_del3").toString
    DeletionStaging.stage(spark, base, "m1", "x", mkCandidates(2))
    // pending -> completed is illegal (must pass through in_progress)
    intercept[IllegalArgumentException] {
      DeletionStaging.transition(spark, base, "m1", DeletionStaging.Completed)
    }
    DeletionStaging.transition(spark, base, "m1", DeletionStaging.InProgress)
    DeletionStaging.transition(spark, base, "m1", DeletionStaging.Failed)
    // FAILED IS TERMINAL (executor.go:152 refuses failed manifests;
    // MoveManifest refuses from=failed, manifest.go:351-356 — the
    // resume path re-enters an IN_PROGRESS manifest, no transition)
    intercept[IllegalArgumentException] {
      DeletionStaging.transition(spark, base, "m1", DeletionStaging.InProgress)
    }
    val st = DeletionStaging.currentStatus(spark, base).collect()
    assert(st.head.getAs[String]("status") == DeletionStaging.Failed)
    // in_progress -> cancelled is legal (cancel-deletion cancels
    // in-progress batches, manifest.go:386-407); cancelled is terminal
    DeletionStaging.stage(spark, base, "m2", "x", mkCandidates(2))
    DeletionStaging.transition(spark, base, "m2", DeletionStaging.InProgress)
    DeletionStaging.transition(spark, base, "m2", DeletionStaging.Cancelled)
    intercept[IllegalArgumentException] {
      DeletionStaging.transition(spark, base, "m2", DeletionStaging.InProgress)
    }
    // the full happy path still walks to completed, which is terminal
    DeletionStaging.stage(spark, base, "m3", "x", mkCandidates(2))
    DeletionStaging.transition(spark, base, "m3", DeletionStaging.InProgress)
    DeletionStaging.transition(spark, base, "m3", DeletionStaging.Completed)
    intercept[IllegalArgumentException] {
      DeletionStaging.transition(spark, base, "m3", DeletionStaging.InProgress)
    }
    // unknown manifests are refused
    intercept[IllegalArgumentException] {
      DeletionStaging.transition(spark, base, "nope", DeletionStaging.Cancelled)
    }
  }

  test("execute marks members SOURCE-deleted, reports missing ids as failed") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_del4").toString
    // candidates: g-1 (source 1), g-2 (source 0), g-3 (source 1)
    DeletionStaging.stage(spark, base, "m1", "x", mkCandidates(3))
    // archive has g-1 in BOTH sources (only source 1 is staged),
    // g-2 (already source-deleted), not g-3
    val messages = Seq(
      ("g-1", 1L, null.asInstanceOf[java.sql.Timestamp]),
      ("g-1", 9L, null.asInstanceOf[java.sql.Timestamp]), // other source
      ("g-2", 0L, java.sql.Timestamp.valueOf("2023-01-01 00:00:00")),
      ("g-other", 1L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("source_message_id", "source_id", "deleted_from_source_at")
    val ts = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val (marked, stats) = DeletionStaging.execute(messages,
      DeletionStaging.members(spark, base, "m1"), ts)
    val del = marked.collect().map(r =>
      (r.getString(0), r.getLong(1)) ->
        Option(r.getAs[java.sql.Timestamp]("deleted_from_source_at"))).toMap
    // the column is deleted_from_source_at, NOT deleted_at — a remote
    // deletion records "gone from the source server"
    // (store/messages.go:797-801); the row stays visible in default
    // views until hideDeletedFromSource
    assert(del(("g-1", 1L)).contains(ts)) // newly marked
    // SAME id, DIFFERENT source: must NOT be touched (per-account rule)
    assert(del(("g-1", 9L)).isEmpty)
    // re-execution OVERWRITES an existing stamp — the reference UPDATE
    // is unconditional (store/messages.go:834-836)
    assert(del(("g-2", 0L)).contains(ts))
    assert(del(("g-other", 1L)).isEmpty) // non-member: untouched
    assert(marked.count() == 4) // no row multiplication
    val st = stats.head()
    assert(st.getAs[Long]("succeeded") == 2L) // g-1@1, g-2@0 found
    assert(st.getAs[Long]("failed") == 1L) // g-3 missing from archive
  }

  test("racing same-seq status events resolve conservatively (cancel wins)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_del5").toString
    DeletionStaging.stage(spark, base, "m1", "x", mkCandidates(2))
    // simulate two movers that both read seq=0 and both appended seq=1
    Seq(("m1", 1L, DeletionStaging.InProgress),
      ("m1", 1L, DeletionStaging.Cancelled))
      .toDF("manifest_id", "seq", "status")
      .write.mode("append").parquet(s"$base/status")
    val st = DeletionStaging.currentStatus(spark, base).collect()
    assert(st.head.getAs[String]("status") == DeletionStaging.Cancelled,
      "a cancel racing an execute-start must resolve to cancelled")
  }
}
