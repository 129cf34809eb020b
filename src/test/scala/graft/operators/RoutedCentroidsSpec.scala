package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The two-level (routed) centroid assignment — the O(n·√nList) scale
  * path added after the r11 100× probe measured the flat assignment's
  * ~30×/decade knee (nList ∝ corpus ⇒ O(n²/b) overall).
  */
class RoutedCentroidsSpec extends SparkTestBase {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  private def flatAssign(nList: Int) =
    Similarity.semanticAssign(emb, col("vec_id"), col("embedding"), nList)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def routed(nList: Int, rProbe: Int) =
    Similarity.assignRouted(
      emb.select(col("vec_id"), col("embedding")),
      Similarity.strideCentroids(
        emb.select(col("vec_id"), col("embedding")), nList),
      rProbe)
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("rProbe = nCoarse reproduces the flat argmax bit-for-bit") {
    // probing every coarse group covers every member centroid, and the
    // ranking rule is the same (score desc, index desc) at both levels
    val nList = 20
    val nCoarse = math.ceil(math.sqrt(nList.toDouble)).toInt
    assert(routed(nList, rProbe = nCoarse) == flatAssign(nList))
  }

  test("rProbe = 4 agrees with the flat argmax on nearly every real vector") {
    // the standard IVF recall trade: only boundary vectors can route
    // away from their true cluster; on real embeddings that is a thin
    // shell (cost = a missed ε-ball pair, never a wrong pair)
    val nList = 20
    val flat = flatAssign(nList)
    val rt = routed(nList, rProbe = 4)
    assert(rt.keySet == flat.keySet)
    val agree = flat.count { case (id, c) => rt(id) == c }
    val rate = agree.toDouble / flat.size
    assert(rate >= 0.9, f"routed agreement $rate%.3f below 0.9")
  }

  test("routing is deterministic across evaluations") {
    val a = routed(20, 4)
    val b = routed(20, 4)
    assert(a == b)
  }

  test("assignRoutedMulti: rProbe = nCoarse, p = 2 bit-matches semanticAssignMulti; p = 1 matches assignRouted") {
    val nList = 20
    val nCoarse = math.ceil(math.sqrt(nList.toDouble)).toInt
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cluster"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val flat2 = pairs(Similarity.semanticAssignMulti(emb, col("vec_id"),
      col("embedding"), nList, p = 2))
    val rt2 = pairs(Similarity.semanticAssignMultiRouted(emb, col("vec_id"),
      col("embedding"), nList, p = 2, rProbe = nCoarse))
    assert(rt2 == flat2) // full probe covers every member; same tie rules
    // p = 1 through the same router ≡ the single-assignment routed path
    val rt1 = pairs(Similarity.semanticAssignMultiRouted(emb, col("vec_id"),
      col("embedding"), nList, p = 1, rProbe = 4))
    assert(rt1 == routed(nList, 4).toSet)
  }

  test("IvfIndex.build(rProbe = nCoarse) reproduces the flat index; routed search matches flat at full probe") {
    val nList = 16
    val nCoarse = math.ceil(math.sqrt(nList.toDouble)).toInt
    val flatIdx = IvfIndex.build(emb, col("vec_id"), col("embedding"), nList)
    val rtIdx = IvfIndex.build(emb, col("vec_id"), col("embedding"), nList,
      rProbe = nCoarse)
    assert(rtIdx.centroids == flatIdx.centroids) // same xxhash64 draw
    def amap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cluster"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(amap(rtIdx.assigned) == amap(flatIdx.assigned))
    val q = emb.filter(col("vec_id") === 0).select(col("embedding"))
      .collect()(0).getAs[scala.collection.Seq[Float]](0).toSeq
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val flatHits = hits(IvfIndex.search(flatIdx, q, k = 10, nProbe = 12))
    assert(hits(IvfIndex.searchRouted(rtIdx, q, k = 10, nProbe = 12,
      rProbe = nCoarse)) == flatHits)
    // small rProbe probes a SUBSET of lists: every surfaced (id, score)
    // is still an exact cosine the flat search also surfaces or ranks
    val flatWide = hits(IvfIndex.search(flatIdx, q, k = 1000, nProbe = 16))
      .toMap
    val approx = hits(IvfIndex.searchRouted(flatIdx, q, k = 10, nProbe = 12,
      rProbe = 2))
    assert(approx.length <= 10)
    approx.foreach { case (id, s) => assert(flatWide(id) == s) }
  }

  test("routed expression: unfilled slots truncate; an empty probe set yields null cluster, not a sentinel") {
    import org.apache.spark.sql.graft.RoutedCentroids
    import spark.implicits._
    val coarse = Array(Array(1f, 0f), Array(0f, 1f))
    val df = Seq(Tuple1(Seq(1f, 0.1f))).toDF("v") // nearest coarse = g0
    // synthetic empty group 0 (reachable only under duplicated coarse
    // vectors in real structures; the expression must still be safe):
    // rProbe=1 probes g0 → no candidates → EMPTY array, and the
    // assignRouted get() contract turns that into a null cluster (which
    // assignRouted then DROPS, matching the SQL replay's inner-join
    // cardinality — the null never reaches a consumer)
    val empty0 = Array(Array.empty[Int], Array(0, 1))
    val r1 = df.select(
      RoutedCentroids(col("v"), coarse, coarse, empty0, 1, 1).as("a"),
      get(RoutedCentroids(col("v"), coarse, coarse, empty0, 1, 1), lit(0))
        .as("c")).collect()(0)
    assert(r1.getAs[scala.collection.Seq[Int]]("a").isEmpty)
    assert(r1.isNullAt(1))
    // p = 2 with only ONE member in the probed group → 1-element result
    // (no Int.MinValue sentinel for a downstream explode/join to eat)
    val oneEach = Array(Array(0), Array(1))
    val r2 = df.select(
      RoutedCentroids(col("v"), coarse, coarse, oneEach, 1, 2).as("a"))
      .collect()(0)
    assert(r2.getAs[scala.collection.Seq[Int]]("a").toSeq == Seq(0))
  }

  test("semanticDupes over a routed assignment: verified pairs, bounded recall loss") {
    // recall-path sanity: every reported pair still carries an exact
    // cosine above eps (the ε-ball verify is unchanged — routing can
    // only MISS pairs or find different-but-real ones, never fabricate),
    // and the routed report keeps most of the flat one's volume
    val nList = 20
    val eps = 0.33 // the dedup_semantic oracle's threshold on this data
    val flatCount = Similarity.semanticDupes(
      Similarity.semanticAssign(emb, col("vec_id"), col("embedding"), nList),
      eps).count()
    assert(flatCount > 0, "fixture must produce pairs for the test to bite")
    val rtRows = Similarity.semanticDupes(
      Similarity.assignRouted(
        emb.select(col("vec_id"), col("embedding")),
        Similarity.strideCentroids(
          emb.select(col("vec_id"), col("embedding")), nList), 4),
      eps).collect() // once: every assertion reads the local array
    rtRows.foreach(r => assert(r.getAs[Double]("max_cosine") > eps))
    assert(rtRows.length >= (flatCount * 7) / 10,
      s"routed recall collapsed: ${rtRows.length} vs flat $flatCount")
  }
}
