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
