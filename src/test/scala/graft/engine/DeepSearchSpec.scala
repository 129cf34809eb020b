package graft.engine

import graft.SparkTestBase
import graft.functions.Mime
import graft.model._
import graft.operators.VectorIndex
import org.apache.spark.sql.functions._

/** Deep FTS search + bodies ETL + vector index lifecycle + embedding
  * preprocessing.
  */
class DeepSearchSpec extends SparkTestBase {
  import Fixtures._
  import spark.implicits._

  private def v = Fixtures.vault(spark,
    messages = Seq(
      msg(1, "quarterly report", "2024-01-01 10:00:00"),
      msg(2, "lunch plans", "2024-02-01 10:00:00"),
      msg(3, "report follow-up", "2024-03-01 10:00:00")),
    recipients = (1 to 3).map(i => MrRow(i.toLong, 1L, "from", None)),
    participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))

  private def bodiesDir = {
    val out = java.nio.file.Files.createTempDirectory("graft_bodies").toString
    val bodies = Seq(
      (1L, "The Quarterly numbers look great, revenue doubled."),
      (2L, "Târget café at noon?"), // diacritics fold: Târget → target
      (3L, "Following up on the quarterly revenue numbers.")).toDF("message_id", "body_text")
    CacheBuilder.buildBodies(spark, bodies, out)
    out
  }

  test("buildBodies tokenizes with diacritic folding; searchDeep prefix-ANDs body+subject") {
    val bodies = spark.read.parquet(s"$bodiesDir/message_bodies")
    val engine = new MsgEngine(v)

    // prefix match on body tokens: "revenu" hits 1 and 3
    val hits = engine.searchDeep("revenu", bodies).collect()
    assert(hits.map(_.getAs[Long]("id")).toSeq == Seq(3L, 1L)) // sent_at desc

    // AND across terms: revenue ∧ doubled → only 1
    assert(engine.searchDeep("revenue doubled", bodies).collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(1L))

    // diacritic folding at ETL: query "target" matches "Târget"
    assert(engine.searchDeep("target", bodies).collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(2L))

    // ...and the QUERY side folds too (unicode61 folds both sides):
    // searching WITH diacritics matches the folded token column
    assert(engine.searchDeep("câfé", bodies).collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(2L))

    // subject fallback: term matching only the subject still hits
    assert(engine.searchDeep("lunch", bodies).collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(2L))

    // metadata operator + text term combine
    assert(engine.searchDeep("quarterly after:2024-02-15", bodies).collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(3L))

    // pagination: offset skips the newest hit
    assert(engine.searchDeep("quarterly", bodies,
      MessageFilter(pagination = Pagination(limit = 1, offset = 1))).collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(1L))
  }

  test("prefixPhraseMatch: adjacency, order, last-word prefix, short-doc guard") {
    import graft.functions.Fts
    val df = Seq(
      (1L, Seq("the", "quarterly", "revenue", "report")),
      (2L, Seq("revenue", "quarterly")), // right words, wrong order
      (3L, Seq("quarterly", "numbers", "revenue")), // not adjacent
      (4L, Seq("quarterly", "revenues")), // last word as PREFIX matches
      (5L, Seq("quarterly"))) // shorter than the phrase — guard, not crash
      .toDF("id", "tokens")
    def ids(phrase: String) = df
      .filter(Fts.prefixPhraseMatch(col("tokens"), phrase))
      .collect().map(_.getLong(0)).toSet
    assert(ids("quarterly revenue") == Set(1L, 4L))
    assert(ids("quarterly revenues") == Set(4L)) // full last word still prefix
    assert(ids("revenue report") == Set(1L))
    assert(ids("quarterly") == Set(1L, 2L, 3L, 4L, 5L)) // single word = prefix
    assert(ids("the quarterly revenue rep") == Set(1L)) // 4-word phrase
    // the query runs through the SAME tokenizer as the indexed side:
    // punctuation separates words ("quarterly-revenue" ≡ [quarterly,
    // revenue]), so punctuated phrases still match a token column that
    // never contains punctuation
    assert(ids("quarterly-revenue") == Set(1L, 4L))
    assert(ids("quarterly.revenue!") == Set(1L, 4L))
    // a phrase that tokenizes to NOTHING matches NOTHING — FTS5's empty
    // phrase semantics; lit(true) here once returned the whole archive
    // for a punctuation-only term
    assert(ids("!!!") == Set.empty)
    assert(ids("...") == Set.empty)
  }

  test("prefixMatch/termMatch: empty or blank term lists match NOTHING") {
    // same empty-query policy as prefixPhraseMatch: lit(true) here once
    // meant a blank query (or a Seq("") — startsWith("") is vacuously
    // true) returned the entire archive from the AND-match compilers
    import graft.functions.Fts
    val df = Seq((1L, Seq("alpha", "beta"))).toDF("id", "tokens")
    assert(df.filter(Fts.prefixMatch(col("tokens"), Seq.empty)).isEmpty)
    assert(df.filter(Fts.prefixMatch(col("tokens"), Seq(""))).isEmpty)
    assert(df.filter(Fts.termMatch(col("tokens"), Seq.empty)).isEmpty)
    assert(df.filter(Fts.termMatch(col("tokens"), Seq(""))).isEmpty)
    // non-empty terms still AND with blanks dropped
    assert(df.filter(Fts.prefixMatch(col("tokens"), Seq("alp", ""))).count() == 1)
  }

  test("punctuation-only terms return no FTS hits, only subject matches") {
    val bodies = spark.read.parquet(s"$bodiesDir/message_bodies")
    val engine = new MsgEngine(v)
    // "!!!" survives the parser as a text term but tokenizes to an empty
    // phrase: the FTS side must contribute NOTHING (not everything); no
    // fixture subject contains "!!!" so the result is empty
    assert(engine.searchDeep("!!!", bodies).collect().isEmpty)
    assert(engine.searchDeep("...", bodies).collect().isEmpty)
  }

  test("searchDeep: quoted phrase matches adjacent body tokens, prefix on last word") {
    val bodies = spark.read.parquet(s"$bodiesDir/message_bodies")
    val engine = new MsgEngine(v)
    // "quarterly revenue" adjacent only in body 3 ("quarterly revenue
    // numbers"); body 1 has "quarterly numbers ... revenue doubled" — the
    // words present but not adjacent
    assert(engine.searchDeep("\"quarterly revenue\"", bodies).collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(3L))
    // last word of the quoted phrase is a prefix: "revenue num" → body 3
    assert(engine.searchDeep("\"revenue num\"", bodies).collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(3L))
  }

  test("searchDeep visibility: dedup losers always hidden; HideDeleted also hides source-deleted") {
    // reference pin: duckdb_test.go:478-512 TestDuckDBEngine_SearchHideDeleted
    // — the deep path respects q.HideDeleted (one source-deleted message
    // drops from 5 hits to 4). Our plumbing routes the same gate through
    // MessageFilter.hideDeletedFromSource (liveMessages at
    // FilterCompiler.scala compile); dedup losers (deleted_at) are hidden
    // under BOTH settings (store/live_messages.go:17-19).
    val vv = Fixtures.vault(spark,
      messages = Seq(
        msg(1, "report one", "2024-01-01 10:00:00"),
        msg(2, "report two", "2024-02-01 10:00:00",
          deletedFromSourceAt = Some("2024-06-01 00:00:00")),
        msg(3, "report three", "2024-03-01 10:00:00",
          deletedAt = Some("2024-06-01 00:00:00")), // dedup loser
        msg(4, "report four", "2024-04-01 10:00:00")),
      recipients = (1 to 4).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    val bodies = {
      val out = java.nio.file.Files.createTempDirectory("graft_bodies_hd").toString
      CacheBuilder.buildBodies(spark,
        (1 to 4).map(i => (i.toLong, s"shared revenue body $i"))
          .toDF("message_id", "body_text"), out)
      spark.read.parquet(s"$out/message_bodies")
    }
    val engine = new MsgEngine(vv)
    // default: the source-deleted row (2) surfaces, the dedup loser (3)
    // never does — reference Search without HideDeleted returns all 5
    assert(engine.searchDeep("revenue", bodies).collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(4L, 2L, 1L)) // sent_at desc
    // HideDeleted: the source-deleted row drops too
    assert(engine.searchDeep("revenue", bodies,
      MessageFilter(hideDeletedFromSource = true)).collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(4L, 1L))
  }

  test("search keyset pages equal search offset pages (fast + deep)") {
    val many = Fixtures.vault(spark,
      messages = (1 to 15).map(i =>
        msg(i.toLong, s"report $i", f"2024-01-${i % 5 + 1}%02d 10:00:00")),
      recipients = (1 to 15).map(i => MrRow(i.toLong, 1L, "from", None)),
      participants = Seq(PRow(1, Some("a@x.com"), Some("A"), None, Some("x.com"))))
    val engine = new MsgEngine(many)

    def ids(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getAs[Long]("id")).toSeq
    def cursorOf(rows: Array[org.apache.spark.sql.Row]) = Some(
      (rows.last.getAs[java.sql.Timestamp]("sent_at"),
        rows.last.getAs[Long]("id")))

    // fast path: page 2 via cursor == rows 6..10 of the offset ordering
    val fastAll = engine.searchFast("report").collect()
    val fastP1 = engine.searchFastAfter("report", limit = 5).collect()
    assert(ids(fastP1) == ids(fastAll).take(5).map(Seq(_)).flatten)
    val fastP2 = engine.searchFastAfter("report",
      cursor = cursorOf(fastP1), limit = 5).collect()
    assert(ids(fastP2) == ids(fastAll).slice(5, 10))

    // deep path: same equivalence over the body-token matcher
    val manyBodies = {
      val out = java.nio.file.Files.createTempDirectory("graft_bodies2").toString
      CacheBuilder.buildBodies(spark,
        (1 to 15).map(i => (i.toLong, s"revenue details $i"))
          .toDF("message_id", "body_text"), out)
      spark.read.parquet(s"$out/message_bodies")
    }
    val deepAll = engine.searchDeep("revenue", manyBodies,
      MessageFilter(pagination = Pagination(limit = 15))).collect()
    val deepP1 = engine.searchDeepAfter("revenue", manyBodies, limit = 6).collect()
    assert(ids(deepP1) == ids(deepAll).take(6))
    val deepP2 = engine.searchDeepAfter("revenue", manyBodies,
      cursor = cursorOf(deepP1), limit = 6).collect()
    assert(ids(deepP2) == ids(deepAll).slice(6, 12))
  }

  test("findSimilar with an unknown seed returns empty, not a crash") {
    val vecs = Seq((1L, Seq(1.0f, 0.0f))).toDF("message_id", "embedding")
    assert(VectorIndex.findSimilar(vecs, seedId = 999L, k = 3).collect().isEmpty)
  }

  test("findSimilar with a NULL stored embedding returns empty, not a driver NPE") {
    val vecs = Seq[(Long, Seq[Float])]((1L, null), (2L, Seq(1.0f, 0.0f)))
      .toDF("message_id", "embedding")
    assert(VectorIndex.findSimilar(vecs, seedId = 1L, k = 3).collect().isEmpty)
  }

  test("vector index: generation lifecycle + fingerprint gate + findSimilar") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vec").toString
    val gen0 = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("message_id", "embedding")

    assert(VectorIndex.needsRebuild(dir, "fp-a"))
    assert(VectorIndex.buildGeneration(gen0, dir, "fp-a") == 0L)
    assert(!VectorIndex.needsRebuild(dir, "fp-a"))
    assert(VectorIndex.needsRebuild(dir, "fp-b"))

    val active = VectorIndex.active(spark, dir).get
    val sim = VectorIndex.findSimilar(active, seedId = 1L, k = 2).collect()
    assert(sim.map(_.getLong(0)).toSeq == Seq(2L, 3L)) // seed excluded, cosine order
    assert(VectorIndex.buildGeneration(gen0, dir, "fp-b") == 1L)
    assert(VectorIndex.readState(dir).get.active == 1L)
  }

  test("vector index: building lifecycle is observable via collectStats") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vecstats").toString
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("message_id", "embedding")

    // no index at all → disabled view (reference CollectStats nil backend)
    assert(!VectorIndex.collectStats(spark, dir).enabled)

    // first build in flight: building summary, no active yet (the normal
    // first-run state, stats.go:103-106)
    val id0 = VectorIndex.beginGeneration(dir, model = "stub-embed", dimension = 2)
    assert(id0 == 0L)
    val mid = VectorIndex.collectStats(spark, dir, pendingBuilding = 3)
    assert(mid.enabled && mid.active.isEmpty)
    assert(mid.building.exists(b => b.id == 0L && b.model == "stub-embed" &&
      b.dimension == 2 && b.done == 0L && b.total == 3L))
    assert(mid.pending_embeddings_total == 3L)

    // complete → active carries the building metadata; marker cleared
    assert(VectorIndex.completeGeneration(vecs, dir, "fp-a") == 0L)
    assert(VectorIndex.readBuilding(dir).isEmpty)
    val done = VectorIndex.collectStats(spark, dir)
    assert(done.building.isEmpty)
    val a = done.active.get
    assert(a.id == 0L && a.model == "stub-embed" && a.dimension == 2 &&
      a.fingerprint == "fp-a" && a.state == "active" &&
      a.message_count == 3L && a.activated_at.nonEmpty)

    // rebuild: previous generation stays live while the next is building
    val id1 = VectorIndex.beginGeneration(dir, model = "stub-embed", dimension = 2)
    assert(id1 == 1L)
    val during = VectorIndex.collectStats(spark, dir, pendingBuilding = 2)
    assert(during.active.exists(_.id == 0L))
    assert(during.building.exists(b => b.id == 1L && b.total == 2L))
    assert(VectorIndex.active(spark, dir).get.count() == 3L)
  }

  test("resolveActive: the four-way serving contract (generations.go:27-49)") {
    import graft.operators.VectorIndex.IndexResolution._
    val dir = java.nio.file.Files.createTempDirectory("graft_vecres").toString
    val vecs = Seq((1L, Seq(1.0f, 0.0f))).toDF("message_id", "embedding")

    // nothing at all → NotEnabled
    assert(VectorIndex.resolveActive(dir) == NotEnabled)
    assert(VectorIndex.resolveActive(dir, "fp-a") == NotEnabled)

    // build in flight, no active yet → Building ("try again soon",
    // distinct from not-configured)
    VectorIndex.beginGeneration(dir, model = "m", dimension = 2)
    assert(VectorIndex.resolveActive(dir, "fp-a") == Building)

    // active + matching fingerprint → Ready; empty fingerprint skips
    // the staleness check (the reference's unconstrained mode)
    VectorIndex.completeGeneration(vecs, dir, "fp-a")
    assert(VectorIndex.resolveActive(dir, "fp-a")
      .isInstanceOf[Ready])
    assert(VectorIndex.resolveActive(dir).isInstanceOf[Ready])

    // active under a DIFFERENT config fingerprint → Stale, never served
    assert(VectorIndex.resolveActive(dir, "fp-b") == Stale("fp-a", "fp-b"))

    // a rebuild in flight does NOT shadow the live generation — active
    // still resolves (generations.go checks building only when no
    // active exists)
    VectorIndex.beginGeneration(dir, model = "m", dimension = 2)
    assert(VectorIndex.resolveActive(dir, "fp-a").isInstanceOf[Ready])

    // the throwing serve face: Ready serves the generation's vectors;
    // Stale/NotEnabled refuse with the reference's error story
    assert(VectorIndex.serveActive(spark, dir, "fp-a").count() == 1L)
    val stale = intercept[IllegalStateException] {
      VectorIndex.serveActive(spark, dir, "fp-b")
    }
    assert(stale.getMessage.contains("stale"))
    val offDir = java.nio.file.Files.createTempDirectory("graft_vecres2").toString
    assert(intercept[IllegalStateException] {
      VectorIndex.serveActive(spark, offDir)
    }.getMessage.contains("not enabled"))

    // and the composed engine surface refuses the same way BEFORE any
    // search work (handlers.go:429-438 resolve-then-search order)
    assert(intercept[IllegalStateException] {
      new MsgEngine(v).findSimilarMessages(dir, "fp-b", seedId = 1L,
        limit = 5, maxPage = 0, structured = None)
    }.getMessage.contains("stale"))
  }

  test("embedding preprocessing strips quoted replies and signatures") {
    val body = "Here is my reply.\n\nOn Mon, Jan 1, 2024 someone wrote:\n> old text\n> more old"
    val out = Mime.preprocessForEmbedding("Re: plans", body, 8000)
    assert(out == "Subject: Re: plans\n\nHere is my reply.")

    val sig = "Main point.\n-- \nAlice\nalice@x.com"
    assert(Mime.preprocessForEmbedding(null, sig, 8000) == "Main point.")

    // rune-aware truncation (no surrogate splitting)
    val emoji = "ab😀cd"
    val t = Mime.preprocessForEmbedding(null, emoji, 3)
    assert(t == "ab😀")
  }

  test("embedding preprocessing REMOVES quote blocks — text after them survives (r13 parity)") {
    // preprocess.go:15-29 removes matching blocks/lines; it does NOT cut
    // the body at the first marker. The author's text after a quoted
    // block must survive (the pre-r13 cut-at-marker version dropped it).
    val interleaved = "Top reply.\n\nOn Jan 2 Bob wrote:\n> quoted a\n>> nested\n" +
      "My inline answer.\n\n> stray quote line\nClosing thought."
    assert(Mime.preprocessForEmbedding(null, interleaved, 8000) ==
      "Top reply.\n\nMy inline answer.\n\nClosing thought.")

    // "From:" / "Original Message" lines are NOT markers in the
    // reference — they stay
    val fwd = "See below.\nFrom: Carol <c@x.com>\nbody of forward"
    assert(Mime.preprocessForEmbedding(null, fwd, 8000) == fwd)

    // quote lines without the space after '>' and nested '>>' both strip
    assert(Mime.preprocessForEmbedding(null, ">no space\n>>nested\nkeep", 8000)
      == "keep")

    // maxChars <= 0 disables truncation (preprocess.go:56-58)
    val long = "x" * 50
    assert(Mime.preprocessForEmbedding(null, long, 0) == long)
    assert(Mime.preprocessForEmbedding(null, long, -1) == long)

    // signature delimiter with trailing spaces ("--  ") still matches
    // (the reference's \s* arm); a "--" with no preceding newline does
    // not (reSigDelim requires \n--)
    assert(Mime.preprocessForEmbedding(null, "a\n--  \nsig", 8000) == "a")
    assert(Mime.preprocessForEmbedding(null, "-- \nnot a sig tail", 8000)
      == "-- \nnot a sig tail")
  }
}
