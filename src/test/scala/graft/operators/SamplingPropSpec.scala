package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** Property-based sampling tests (SURVEY §5 tier): the deterministic-draw
  * invariants a 100 TB dataset recipe depends on — monotone containment
  * across rates (a 1% sample is a subset of the 10% sample drawn from the
  * same hash) and total/disjoint split cover for ARBITRARY valid fraction
  * vectors, not just the unit-case ones. One materialized draw feeds the
  * driver-side properties; splitAssign cases run real (tiny) Spark jobs.
  */
class SamplingPropSpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop, min: Int = 100): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  /** One materialized hash draw over 2000 ids, reused by every property. */
  private lazy val bucketOf: Map[Long, Long] =
    (0L until 2000L).toDF("id")
      .select(col("id"), Sampling.hashBucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("sampleByHash equals the threshold rule on the materialized draw") {
    val df = bucketOf.keys.toSeq.toDF("id")
    for (rate <- Seq(0.0, 0.37, 1.0)) {
      val kept = Sampling.sampleByHash(df, col("id"), rate)
        .collect().map(_.getLong(0)).toSet
      val expected =
        bucketOf.filter(_._2 < math.round(rate * 1000)).keySet
      assert(kept == expected, s"rate $rate")
    }
  }

  test("property: sampling is monotone — lower rate ⊆ higher rate") {
    val rate = Gen.choose(0.0, 1.0)
    check(Prop.forAll(rate, rate) { (r1, r2) =>
      val (lo, hi) = if (r1 <= r2) (r1, r2) else (r2, r1)
      val keepLo = bucketOf.filter(_._2 < math.round(lo * 1000)).keySet
      val keepHi = bucketOf.filter(_._2 < math.round(hi * 1000)).keySet
      keepLo.subsetOf(keepHi)
    })
  }

  /** Integer bucket widths ≥ 1 summing to exactly 1000, 2-4 splits —
    * every generated fraction vector is valid for splitAssign's require.
    */
  private val widthsGen: Gen[List[Int]] = for {
    k <- Gen.choose(2, 4)
    raw <- Gen.listOfN(k, Gen.choose(1, 50))
  } yield {
    val scaled = raw.map(w => math.max(1, w * 900 / raw.sum))
    scaled.init :+ (1000 - scaled.init.sum)
  }

  test("property: splitAssign covers every row with the interval its bucket dictates") {
    val ids = (0L until 200L)
    val df = ids.toDF("id")
    check(Prop.forAll(widthsGen) { widths =>
      val names = widths.indices.map(i => s"s$i")
      val splits = names.zip(widths.map(_ / 1000.0))
      val assigned = df
        .select(col("id"), Sampling.splitAssign(col("id"), splits).as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val cuts = widths.scanLeft(0)(_ + _).tail
      ids.forall { id =>
        val b = bucketOf(id)
        val expected = names(cuts.indexWhere(b < _) match {
          case -1 => names.length - 1 // past the last cut → final split
          case i  => i
        })
        assigned(id) == expected
      }
    }, min = 12)
  }

  test("splitAssign rejects a fraction below the bucket granularity") {
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(col("id"), Seq("train" -> 0.9996, "test" -> 0.0004))
    }
  }
}
