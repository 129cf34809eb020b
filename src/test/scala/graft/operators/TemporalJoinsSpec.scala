package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def asof(left: Seq[(Long, Long, String)],
      right: Seq[(Long, Long, Double)], tol: Long = Long.MaxValue) = {
    val l = left.toDF("k", "t", "tag")
    val r = right.toDF("k", "rt", "v")
    TemporalJoins.asofJoinBackward(l, r, "k", "t", "rt", Seq("v"), tol)
      .collect()
      .map(x => (x.getString(x.fieldIndex("tag")),
        Option(x.get(x.fieldIndex("asof_ts"))).map(_.asInstanceOf[Long]),
        Option(x.get(x.fieldIndex("v"))).map(_.asInstanceOf[Double])))
      .toSet
  }

  test("asof picks latest prior right row per key, inclusive on ties") {
    val got = asof(
      left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 10L, "c")),
      right = Seq((1L, 5L, 1.0), (1L, 10L, 2.0), (1L, 15L, 3.0),
        (2L, 11L, 9.0)))
    assert(got == Set(
      ("a", Some(10L), Some(2.0)), // same-ts right row matches (inclusive)
      ("b", Some(15L), Some(3.0)), // latest ≤ 20 is 15, not 10
      ("c", None, None)))          // right row is in the future
  }

  test("asof: a matched right row's NULL payload is honored, not skipped") {
    // regression: per-column last(..., ignoreNulls) skipped a NULL
    // payload value on the MATCHED row and carried an OLDER right row's
    // non-null value — attributing row-10's payload to row-20's match;
    // the struct carry keeps all fields from the single matched row
    val l = Seq((1L, 30L, "a")).toDF("k", "t", "tag")
    val r = Seq[(Long, Long, Option[Double])](
      (1L, 10L, Some(7.0)), (1L, 20L, None)).toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoinBackward(l, r, "k", "t", "rt", Seq("v"))
      .collect().head
    assert(out.getAs[Long]("asof_ts") == 20L,
      "the match is the latest prior right row")
    assert(out.isNullAt(out.fieldIndex("v")),
      "the matched row's NULL payload must come through as NULL")
  }

  test("asof rejects reserved payload names instead of shadowing columns") {
    val l = Seq((1L, 30L, "a")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 7.0)).toDF("k", "rt", "asof_ts")
    val e = intercept[IllegalArgumentException](
      TemporalJoins.asofJoinBackward(l, r, "k", "t", "rt", Seq("asof_ts")))
    assert(e.getMessage.contains("reserved"))
  }

  test("asof tolerance expires old matches") {
    val got = asof(
      left = Seq((1L, 100L, "a"), (1L, 200L, "b")),
      right = Seq((1L, 95L, 1.0)),
      tol = 10L)
    assert(got == Set(
      ("a", Some(95L), Some(1.0)),
      ("b", None, None))) // 105 ns gap > 10 ns tolerance
  }

  test("asof keeps every left row and all left columns") {
    val l = Seq((1L, 10L, "x", 7), (9L, 10L, "y", 8)).toDF("k", "t", "tag", "extra")
    val r = Seq((1L, 1L, 0.5)).toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoinBackward(l, r, "k", "t", "rt", Seq("v"))
    assert(out.columns.toSet == Set("k", "t", "tag", "extra", "asof_ts", "v"))
    assert(out.count() == 2) // key 9 has no right rows at all, still present
  }

  test("binned range join matches the naive inequality join") {
    val points = (0 until 200).map(i => (i.toLong, i * 0.7)).toDF("pid", "v")
    val iv = Seq(("a", 0.0, 30.0), ("b", 25.0, 60.0), ("c", 58.9, 59.1),
      ("d", 900.0, 950.0)).toDF("band", "lo", "hi")
    for (w <- Seq(5.0, 33.3, 1000.0)) { // narrower, comparable, wider than bins
      val got = TemporalJoins.binnedRangeJoin(points, "v", iv, "lo", "hi", w)
        .select("pid", "band").as[(Long, String)].collect().toSet
      val naive = points.join(iv, col("v") >= col("lo") && col("v") < col("hi"))
        .select("pid", "band").as[(Long, String)].collect().toSet
      assert(got == naive, s"binWidth=$w")
      assert(naive.exists(_._2 == "a") && naive.exists(_._2 == "b"))
      assert(!naive.exists(_._2 == "d")) // empty interval drops out
    }
  }

  test("asof matches a naive per-probe reference on random data") {
    // randomized rounds with pinned seeds: dense ts range forces heavy
    // tie/equal-timestamp traffic; tolerance exercises the expiry mask
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 8
      val left = (0 until 300).map(i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong, i.toLong))
      val right = rnd.shuffle(
        (for (k <- 0 until nKeys; t <- 0 until 50) yield (k.toLong, t.toLong))
          .toList).take(150) // unique (key, ts) by construction
        .map { case (k, t) => (k, t, k * 1000.0 + t) }
      val tol = rnd.nextInt(20).toLong
      val naive = left.map { case (k, t, id) =>
        val m = right.filter(r => r._1 == k && r._2 <= t && t - r._2 <= tol)
        val best = if (m.isEmpty) None else Some(m.maxBy(_._2))
        (id, best.map(_._2), best.map(_._3))
      }.toSet
      val got = TemporalJoins.asofJoinBackward(
        left.toDF("k", "t", "id"), right.toDF("k", "rt", "v"),
        "k", "t", "rt", Seq("v"), tol)
        .collect().map(r => (r.getLong(r.fieldIndex("id")),
          Option(r.get(r.fieldIndex("asof_ts"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("v"))).map(_.asInstanceOf[Double])))
        .toSet
      assert(got == naive, s"seed=$seed tol=$tol")
    }
  }

  test("range join matches naive on random intervals incl. degenerate") {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val points = (0 until 400).map(i => (i.toLong, rnd.nextDouble() * 100))
      val iv = (0 until 30).map { i =>
        val lo = rnd.nextDouble() * 100
        // mix: normal, empty (hi <= lo outputs nothing), tiny, huge
        val hi = rnd.nextInt(4) match {
          case 0 => lo + rnd.nextDouble() * 30
          case 1 => lo                      // empty interval
          case 2 => lo + 1e-9               // sliver
          case _ => lo + 60
        }
        (i.toLong, lo, hi)
      }
      val naive = (for {
        (pid, v) <- points; (band, lo, hi) <- iv
        if v >= lo && v < hi
      } yield (pid, band)).toSet
      val got = TemporalJoins.binnedRangeJoin(
        points.toDF("pid", "v"), "v", iv.toDF("band", "lo", "hi"),
        "lo", "hi", binWidth = 13.7)
        .select("pid", "band").as[(Long, Long)].collect().toSet
      assert(got == naive, s"seed=$seed")
    }
  }

  test("range join boundary semantics: lo inclusive, hi exclusive") {
    val points = Seq((1L, 10.0), (2L, 20.0)).toDF("pid", "v")
    val iv = Seq(("e", 10.0, 20.0)).toDF("band", "lo", "hi")
    val got = TemporalJoins.binnedRangeJoin(points, "v", iv, "lo", "hi", 7.0)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L))
  }
}
