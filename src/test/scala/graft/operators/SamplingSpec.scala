package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.TextFunctions

/** Sampling / mixing / packing / clustering operators (PipelineQueries'
  * backing implementations).
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  // --- qualityWeightedSample ------------------------------------------------

  test("qualityWeightedSample: keep rate tracks the score, clamped at both ends") {
    val n = 4000L
    val ids = spark.range(n).toDF("id")
    def keptAt(score: Double): Long =
      Sampling.qualityWeightedSample(
        ids.withColumn("q", lit(score)), col("id"), col("q")).count()
    // clamp floor: score 0 still keeps ~10%; ceiling: score 1 keeps ~90%
    val atZero = keptAt(0.0); val atOne = keptAt(1.0)
    assert(math.abs(atZero - n * 0.1) < n * 0.03, s"floor keep=$atZero")
    assert(math.abs(atOne - n * 0.9) < n * 0.03, s"ceil keep=$atOne")
    // monotone in between, and deterministic across invocations
    val mid = keptAt(0.5)
    assert(atZero < mid && mid < atOne)
    assert(mid == keptAt(0.5))
    // a kept id stays kept when its score rises (same draw, higher bar)
    val kept03 = Sampling.qualityWeightedSample(
      ids.withColumn("q", lit(0.3)), col("id"), col("q"))
      .collect().map(_.getLong(0)).toSet
    val kept07 = Sampling.qualityWeightedSample(
      ids.withColumn("q", lit(0.7)), col("id"), col("q"))
      .collect().map(_.getLong(0)).toSet
    assert(kept03.subsetOf(kept07))
  }

  test("qualityWeightedSample: NULL score keeps the floor rate, never drops the row class") {
    // a scorer that misses a doc (left-join gap) must leave it the
    // floor-rate audit trace, not silently remove it via NULL-comparison
    val n = 4000L
    val ids = spark.range(n).toDF("id")
      .withColumn("q", when(col("id") % 2 === 0, lit(0.5)))
    val kept = Sampling.qualityWeightedSample(ids, col("id"), col("q"))
    val keptNull = kept.filter(col("q").isNull).count()
    assert(math.abs(keptNull - (n / 2) * 0.1) < n * 0.03,
      s"null-scored rows must keep ~floor rate, kept=$keptNull")
  }

  // --- duplicateClusters ----------------------------------------------------

  test("duplicateClusters groups transitively, labels by min id") {
    // chain 1-2-3 (1,3 never directly paired), island 7-9, singleton edge 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 9L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 9L -> 7L, 20L -> 20L, 21L -> 20L))
  }

  test("duplicateClusters converges on a long path and a star") {
    // path 0-1-...-9 exercises pointer-halving (diameter 9), star 100-{101..105}
    val path = (0L until 9L).map(i => (i, i + 1))
    val star = (101L to 105L).map(i => (100L, i))
    val got = Dedup.duplicateClusters((path ++ star).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 9L).foreach(v => assert(got(v) == 0L))
    (100L to 105L).foreach(v => assert(got(v) == 100L))
  }

  test("duplicateClusters on empty edge set returns empty") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.duplicateClusters(empty).isEmpty)
  }

  test("duplicateClusters distributed path matches the local fast path") {
    // threshold 0 forces the iterative path; same graphs as above
    val edges = (Seq((1L, 2L), (2L, 3L), (7L, 9L), (20L, 21L)) ++
      (0L until 9L).map(i => (i + 30L, i + 31L))).toDF("id_a", "id_b")
    val local = Dedup.duplicateClusters(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.duplicateClusters(edges, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
    assert(local(3L) == 1L && local(39L) == 30L)
  }

  test("duplicateClusters distributed path fails loudly at maxIter") {
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.duplicateClusters(path, maxIter = 1, localEdgeThreshold = 0L)
    }
  }

  // --- hash sampling ----------------------------------------------------------

  test("hashBucket matches an independent md5 computation and is stable") {
    val ids = Seq(0L, 1L, 42L, 123456789L).toDF("id")
    val got = ids.select(col("id"), Sampling.hashBucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def expected(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000
    }
    got.foreach { case (id, b) => assert(b == expected(id), s"id=$id") }
  }

  test("stratifiedSample applies per-stratum rates deterministically") {
    val docs = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "zz"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(docs, col("id"), col("lang"),
      Map("en" -> 0.5), defaultRate = 0.1)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5 buckets are uniform: expect ~500 of 1000 en, ~100 of 1000 zz
    assert(byLang("en") > 400 && byLang("en") < 600, byLang)
    assert(byLang("zz") > 50 && byLang("zz") < 160, byLang)
    // deterministic: re-running selects the identical subset
    val again = Sampling.stratifiedSample(docs, col("id"), col("lang"),
      Map("en" -> 0.5), defaultRate = 0.1)
    assert(kept.select("id").except(again.select("id")).isEmpty &&
      again.select("id").except(kept.select("id")).isEmpty)
  }

  test("mixtureWeights shares sum to 1 and weights invert shares") {
    val docs = Seq(("a", 100), ("a", 300), ("b", 200), ("c", 400))
      .toDF("lang", "n")
    val w = Sampling.mixtureWeights(docs, col("lang"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toList.sortBy(_._1)
    assert(w.map(_._2) == List(400L, 200L, 400L))
    assert(math.abs(w.map(_._3).sum - 1.0) < 1e-9)
    // uniform target share is 1/3 of 1000 tokens; weight = target/actual
    assert(math.abs(w.head._4 - (1000.0 / 3 / 400)) < 1e-6)
  }

  // --- packing ---------------------------------------------------------------

  test("packChunks splits at the token budget per shard, in order") {
    val docs = Seq(
      ("s1", 1L, 300), ("s1", 2L, 300), ("s1", 3L, 300), // 300+300 | 300
      ("s2", 4L, 100), ("s2", 5L, 100), ("s2", 6L, 700), // all < budget crossing
      ("s3", 7L, 2000), ("s3", 8L, 100)) // oversized doc → raw gap, dense ids
      .toDF("src", "id", "n")
    val got = Sampling.packChunks(docs, col("src"), col("id"), col("n"), 512)
      .orderBy("part", "chunk_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toList
    assert(got == List(
      ("s1", 0L, 2L, 600L, 1L, 2L), // docs 1,2: before=0,300 < 512
      ("s1", 1L, 1L, 300L, 3L, 3L), // doc 3: before=600 → chunk 1
      ("s2", 0L, 3L, 900L, 4L, 6L), // before=0,100,200 all < 512
      ("s3", 0L, 1L, 2000L, 7L, 7L), // oversized doc overshoots budget
      ("s3", 1L, 1L, 100L, 8L, 8L))) // raw chunk 3 → dense id 1, no gap
  }

  // --- text signals -----------------------------------------------------------

  test("bigrams and repetition fractions") {
    val df = Seq("a b a b", "x y z", "w").toDF("text")
      .select(TextFunctions.wsTokens(col("text")).as("t"))
      .select(TextFunctions.bigrams(col("t")).as("b"),
        TextFunctions.dupWordFraction(col("t")).as("dw"),
        TextFunctions.dupBigramFraction(col("t")).as("db"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) == Seq("a b", "b a", "a b"))
    assert(math.abs(rows(0).getDouble(1) - 0.5) < 1e-9) // 2 distinct of 4
    assert(math.abs(rows(0).getDouble(2) - (1.0 - 2.0 / 3)) < 1e-6)
    assert(rows(1).getSeq[String](0) == Seq("x y", "y z"))
    assert(rows(1).getDouble(1) == 0.0 && rows(1).getDouble(2) == 0.0)
    assert(rows(2).getSeq[String](0).isEmpty && rows(2).getDouble(2) == 0.0)
    // a ZERO-token doc (tokens() drops punctuation-only content) scores
    // 0.0 on BOTH fractions — 0/0 once made dupWordFraction NULL, which
    // silently dropped empty docs from `frac <= threshold` gates
    val empty = Seq("!!!").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("t"))
      .select(TextFunctions.dupWordFraction(col("t")).as("dw"),
        TextFunctions.dupBigramFraction(col("t")).as("db"))
      .collect().head
    assert(empty.getDouble(0) == 0.0 && empty.getDouble(1) == 0.0)
  }

  test("temperatureWeights: α=1 is identity, α=0.5 flattens toward small strata") {
    val df = Seq.tabulate(90)(i => ("big", 100)) ++ Seq.tabulate(10)(i => ("small", 100))
    val docs = df.toDF("lang", "nt")
    val id = Sampling.temperatureWeights(docs, col("lang"), col("nt"), alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(id("big") == 1.0 && id("small") == 1.0)
    val flat = Sampling.temperatureWeights(docs, col("lang"), col("nt"), alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // shares 0.9/0.1 → p ∝ (0.9^.5, 0.1^.5) ≈ (0.948683, 0.316228)
    // → probs ≈ (0.75, 0.25): big downweighted, small upweighted 2.5×
    assert(math.abs(flat("big")._1 - 0.9) < 1e-6)
    assert(math.abs(flat("big")._2 - 0.75) < 1e-3)
    assert(math.abs(flat("small")._2 - 0.25) < 1e-3)
    assert(flat("big")._3 < 1.0 && flat("small")._3 > 2.0)
    // probabilities sum to 1
    assert(math.abs(flat.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("splitAssign: total cover, disjoint, stable, ~90/5/5") {
    val df = (0L until 2000L).toDF("id")
    val split = Sampling.splitAssign(col("id"),
      Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05))
    val counts = df.groupBy(split.as("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L) // every row in exactly one split
    assert(counts("train") > 1700 && counts("valid") > 50 && counts("test") > 50)
    // deterministic: same assignment on a re-run
    val again = df.groupBy(split.as("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(col("id"), Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("importanceScores: hand-computed likelihood ratios and means") {
    // target doc 1: "a b"; raw doc 2: "a c"
    // totals: n_r=4, n_t=2; counts: a(2,1) b(1,1) c(1,0)
    // ratios: a = (1·4)/(2·2) = 1.0, b = (1·4)/(1·2) = 2.0, c = 0.0
    // doc 1 mean(1.0, 2.0) = 1.5; doc 2 mean(1.0, 0.0) = 0.5
    val tok = Seq(
      (1L, true, 0, "a"), (1L, true, 1, "b"),
      (2L, false, 0, "a"), (2L, false, 1, "c"))
      .toDF("doc_id", "is_target", "pos", "tok")
    val got = Sampling.importanceScores(tok).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == ((2L, 1.5)))
    assert(got(2L) == ((2L, 0.5)))
    // target-like docs outrank target-alien ones; exact doubles, no fuzz
    assert(got(1L)._2 > got(2L)._2)
  }

  test("importanceScores: target-absent vocabulary drives the score to zero") {
    val tok = Seq(
      (1L, true, 0, "x"),
      (2L, false, 0, "y"), (2L, false, 1, "z"))
      .toDF("doc_id", "is_target", "pos", "tok")
    val got = Sampling.importanceScores(tok).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(2L) == 0.0) // y,z never occur in the target slice
    assert(got(1L) == 3.0) // x: (1·3)/(1·1) = 3 — sole target token
  }

  test("importanceScores: invariant under corpus duplication (distribution, not size)") {
    // doubling every doc doubles all counts AND both totals, so every
    // ratio (c_t·n_r)/(c_r·n_t) — and hence every original doc's score —
    // is bit-identical: the weight measures the distribution, not the
    // corpus size. A seeded random corpus, exact equality, no fuzz.
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val tok = (0L until 40L).flatMap { doc =>
      val target = rng.nextBoolean()
      (0 until (3 + rng.nextInt(5))).map(p =>
        (doc, target, p, vocab(rng.nextInt(vocab.size))))
    }.toDF("doc_id", "is_target", "pos", "tok")
    val doubled = tok.unionAll(
      tok.withColumn("doc_id", col("doc_id") + 1000L))
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
      Sampling.importanceScores(df).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val base = scores(tok)
    val dup = scores(doubled)
    assert(base.forall { case (id, v) => dup(id) == v })
    assert(base.forall { case (id, v) => dup(id + 1000L) == v })
  }

  test("scoreWithRatios: out-of-vocabulary tokens score 0, not dropped") {
    // ratio table trained on a snapshot ("a" target-heavy); a FRESH shard
    // carries tokens the snapshot never saw — they must drag the mean
    // toward 0 (ratio 0 like any target-absent token), and an all-novel
    // doc must still appear (score 0) so the downstream draw can REJECT
    // it rather than never see it
    val snapshot = Seq(
      (1L, true, 0, "a"), (2L, false, 0, "a"), (2L, false, 1, "b"))
      .toDF("doc_id", "is_target", "pos", "tok")
    val ratio = Sampling.importanceRatios(snapshot)
    val fresh = Seq(
      (10L, false, 0, "a"), (10L, false, 1, "zz"), // half known, half novel
      (11L, false, 0, "qq"), (11L, false, 1, "ww")) // all novel
      .toDF("doc_id", "is_target", "pos", "tok")
    val got = Sampling.scoreWithRatios(fresh, ratio).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // a: c_t=1 c_r=2, n_t=1 n_r=3 → ratio = 3/2 = 1.5; zz → 0
    assert(got(10L) == ((2L, 0.75))) // mean(1.5, 0) over ALL tokens
    assert(got(11L) == ((2L, 0.0))) // present, scored 0 — not vanished
  }

  test("importanceScores: empty target slice fails loudly instead of NaN-ing") {
    val tok = Seq((1L, false, 0, "a"), (2L, false, 0, "b"))
      .toDF("doc_id", "is_target", "pos", "tok")
    val e = intercept[Throwable] {
      Sampling.importanceScores(tok).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("target slice is empty")),
      s"wrong failure: $e")
  }

  test("splitAssign on a group key co-assigns every group member (leakage-safe)") {
    // 300 docs in 100 near-dup clusters of 3: the draw hashes the CLUSTER
    // label, so members can never straddle train and the eval holdout
    val df = (0L until 300L).map(i => (i, s"c${i % 100}"))
      .toDF("doc_id", "cluster")
    val assigned = df.withColumn("split", Sampling.splitAssign(col("cluster"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)))
    val perCluster = assigned.groupBy(col("cluster"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .collect()
    assert(perCluster.length == 100 && perCluster.forall(_.getLong(1) == 1L))
    // contrast: the id-hash draw DOES split at least one cluster here —
    // the leak the group-key draw exists to prevent
    val byId = df.withColumn("split", Sampling.splitAssign(col("doc_id"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)))
      .groupBy(col("cluster"))
      .agg(countDistinct(col("split")).as("n_splits"))
    assert(byId.filter(col("n_splits") > 1).count() > 0)
  }

  test("shufflePositions: dense permutation identical to a global sort") {
    val df = (0L until 777L).toDF("id")
    val got = Sampling.shufflePositions(df, col("id"))
      .orderBy(col("shuffle_pos")).collect()
    assert(got.map(_.getAs[Long]("shuffle_pos")).toSeq == (0L until 777L))
    // positions agree with the single-partition global sort it replaces
    val want = df.select(col("id"), md5(col("id").cast("string")).as("k"))
      .orderBy(col("k").asc, col("id").asc).collect().map(_.getLong(0)).toSeq
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == want)
  }

  test("canonicalizeUrl strips scheme, www, utm params, trailing slash") {
    val cases = Seq(
      "HTTPS://WWW.Example.com/A/?utm_source=x&utm_id=9" -> "example.com/a",
      "http://example.com/a?id=3&utm_campaign=c" -> "example.com/a?id=3",
      "example.com/a/b/" -> "example.com/a/b",
      "https://sub.www.example.com" -> "sub.www.example.com", // only LEADING www.
      "www.example.com/?utm_a=1&utm_b=2" -> "example.com",
      // utm strip is anchored to a real [?&] separator: a param merely
      // NAMED *utm_x and utm_ text inside a path segment both survive
      "example.com/a?myutm_x=1" -> "example.com/a?myutm_x=1",
      "example.com/utm_a=1/b" -> "example.com/utm_a=1/b",
      "example.com/a?utm_a=1&id=2&utm_b=3" -> "example.com/a?id=2")
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), TextFunctions.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"in=$in") }
  }

  test("piiMarkerCounts equals piiCounts on marker-free source text") {
    val df = Seq("mail a.b+c@ex-1.org or 10.0.3.7 and 1.2.3.4, no 1.2.3")
      .toDF("text")
    val (ne, ni) = TextFunctions.piiCounts(col("text"))
    val (me, mi) = TextFunctions.piiMarkerCounts(
      TextFunctions.redactPii(col("text")))
    val r = df.select(ne, ni, me.cast("int"), mi.cast("int")).head()
    assert(r.getInt(0) == r.getInt(2) && r.getInt(1) == r.getInt(3))
  }

  test("redactPii masks emails before IPs and counts both") {
    val df = Seq("mail a.b+c@ex-1.org or 10.0.3.7 and 1.2.3.4, no 1.2.3")
      .toDF("text")
    val (ne, ni) = TextFunctions.piiCounts(col("text"))
    val r = df.select(TextFunctions.redactPii(col("text")).as("red"),
      ne.as("ne"), ni.as("ni")).head()
    assert(r.getString(0) == "mail <EMAIL> or <IP> and <IP>, no 1.2.3")
    assert(r.getInt(1) == 1 && r.getInt(2) == 2)
  }

  test("redactPii checks octet ranges, boundaries, and adjacent IPs") {
    val cases = Seq(
      "1.2.3.4 5.6.7.8" -> "<IP> <IP>",              // adjacent: 2nd pass
      "a 1.1.1.1,2.2.2.2,3.3.3.3,4.4.4.4" -> "a <IP>,<IP>,<IP>,<IP>",
      "1.2.3.4.5 stays" -> "1.2.3.4.5 stays",        // 5 dotted octets
      "999.999.999.999 stays" -> "999.999.999.999 stays", // out of range
      "end 10.0.255.7" -> "end <IP>",                 // $ boundary
      "0.0.0.0 ok" -> "<IP> ok")                      // ^ boundary
    val df = cases.map(_._1).toDF("text")
      .select(col("text"), TextFunctions.redactPii(col("text")).as("red"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"in=$in") }
  }

  test("redactPiiFast is byte-identical to the portable 3-pass chain") {
    // adversarial corners of the equivalence argument: email whose local
    // part is itself a dotted-quad, IP hard against an email on either
    // side, adjacent IP chains (the case the portable form needs its
    // second pass for), boundary/overlap rejections, and plain text
    val cases = Seq(
      "mail a.b+c@ex-1.org or 10.0.3.7 and 1.2.3.4, no 1.2.3",
      "1.2.3.4@x.com eats the quad", "1.2.3.4x@y.com too",
      "a@10.0.0.1 keeps the quad", "a@b.co1.2.3.4 after a tld",
      "1.2.3.4 5.6.7.8", "x 1.1.1.1,2.2.2.2,3.3.3.3,4.4.4.4 y",
      "1.2.3.4.5 stays", "999.999.999.999 stays", "0.0.0.0",
      "version 10.0.3.7 in prose", "no pii at all", "", "@ . 1.2",
      "u1@e.com u2@e.com 8.8.8.8u3@e.com")
    val df = cases.toDF("text").select(
      TextFunctions.redactPii(col("text")).as("slow"),
      TextFunctions.redactPiiFast(col("text")).as("fast"))
    df.collect().zip(cases).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1),
        s"in=$in slow=${r.getString(0)} fast=${r.getString(1)}")
    }
  }

  test("redactPiiFast equals the chain on random digit/dot/at soup") {
    // randomized cross-check over strings dense in the alphabet the two
    // recipes disagree on if the equivalence argument has a hole
    val rnd = new scala.util.Random(42)
    val alpha = "01259.a@-_ ,eXcom"
    val soup = Seq.fill(300)(
      (0 until (1 + rnd.nextInt(40))).map(_ => alpha(rnd.nextInt(alpha.length)))
        .mkString)
    val df = soup.toDF("text").select(col("text"),
      TextFunctions.redactPii(col("text")).as("slow"),
      TextFunctions.redactPiiFast(col("text")).as("fast"))
    df.collect().foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"in=${r.getString(0)} slow=${r.getString(1)} fast=${r.getString(2)}")
    }
  }
}
