package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopCentroids

/** TopCentroids must reproduce the greatest(struct(cosine…))/
  * reverse(array_sort) formulations it replaced, bit for bit — including
  * the (score desc, HIGHER centroid id) tie rule and null-score ranking.
  */
class TopCentroidsSpec extends SparkTestBase {

  private def oldArgmax(vec: org.apache.spark.sql.Column,
      cents: Seq[Seq[Float]]): org.apache.spark.sql.Column =
    greatest(cents.zipWithIndex.map { case (c, i) =>
      struct(Similarity.cosine(vec, typedLit(c)).as("s"), lit(i).as("i"))
    }: _*).getField("i")

  private def oldTopP(vec: org.apache.spark.sql.Column,
      cents: Seq[Seq[Float]], p: Int): org.apache.spark.sql.Column =
    transform(
      slice(reverse(array_sort(array(cents.zipWithIndex.map { case (c, i) =>
        struct(Similarity.cosine(vec, typedLit(c)).as("s"), lit(i).as("i"))
      }: _*))), 1, p),
      s => s.getField("i"))

  test("argmax equals the old greatest(struct) formulation on real vectors") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val cents = Similarity.strideCentroids(
      emb.select(col("vec_id"), col("embedding")), nList = 8)
    val both = emb.select(col("vec_id"),
      element_at(TopCentroids(col("embedding"), cents, 1), 1).as("new_c"),
      oldArgmax(col("embedding"), cents).as("old_c"))
    assert(both.filter(col("new_c") =!= col("old_c")).count() == 0)
    assert(both.count() > 0)
  }

  test("top-p equals the old reverse(array_sort) formulation, order included") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val cents = Similarity.strideCentroids(
      emb.select(col("vec_id"), col("embedding")), nList = 8)
    val both = emb.select(col("vec_id"),
      TopCentroids(col("embedding"), cents, 3).as("new_p"),
      oldTopP(col("embedding"), cents, 3).as("old_p"))
    assert(both.filter(not(col("new_p") === col("old_p"))).count() == 0)
  }

  test("tie-break: equal scores rank the HIGHER centroid id first") {
    import spark.implicits._
    // duplicate centroids → identical scores; ranking must prefer the
    // larger index (the greatest(struct)/array_sort-desc tie rule)
    val c = Seq(1.0f, 0.0f)
    val cents = Seq(c, c, Seq(0.0f, 1.0f))
    val out = Seq(Seq(1.0f, 0.0f)).toDF("v")
      .select(TopCentroids(col("v"), cents, 3).as("p"))
      .head().getSeq[Int](0)
    assert(out == Seq(1, 0, 2))
  }

  test("null scores rank below real ones; zero-norm centroid never wins") {
    import spark.implicits._
    val cents = Seq(Seq(0.0f, 0.0f), Seq(0.5f, 0.5f)) // c0 is zero-norm
    val out = Seq(Seq(1.0f, 1.0f)).toDF("v")
      .select(TopCentroids(col("v"), cents, 2).as("p"))
      .head().getSeq[Int](0)
    assert(out == Seq(1, 0))
  }

  test("bad vectors (zero norm, length mismatch) rank all centroids null-ly") {
    import spark.implicits._
    val cents = Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    // all scores null → ranking degenerates to index desc
    val zero = Seq(Seq(0.0f, 0.0f)).toDF("v")
      .select(TopCentroids(col("v"), cents, 2).as("p"))
      .head().getSeq[Int](0)
    assert(zero == Seq(1, 0))
    val wrongLen = Seq(Seq(1.0f, 2.0f, 3.0f)).toDF("v")
      .select(TopCentroids(col("v"), cents, 2).as("p"))
      .head().getSeq[Int](0)
    assert(wrongLen == Seq(1, 0))
  }

  test("null input vector yields null") {
    import spark.implicits._
    val cents = Seq(Seq(1.0f, 0.0f))
    val out = Seq(Option.empty[Seq[Float]]).toDF("v")
      .select(TopCentroids(col("v"), cents, 1).as("p"))
      .head()
    assert(out.isNullAt(0))
  }

  test("interpreted eval matches codegen (same topK entry point)") {
    import spark.implicits._
    val cents = Seq(Seq(0.3f, 0.7f), Seq(0.9f, 0.1f), Seq(0.5f, 0.5f))
    val df = Seq(Seq(0.2f, 0.8f), Seq(0.99f, 0.01f)).toDF("v")
    val viaExpr = df.select(TopCentroids(col("v"), cents, 2)).collect()
      .map(_.getSeq[Int](0))
    // drive the interpreted path directly
    val norms = org.apache.spark.sql.graft.TopCentroids
      .norms2Of(cents.map(_.toArray).toArray)
    val viaEval = df.collect().map { r =>
      org.apache.spark.sql.graft.TopCentroids.topK(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          r.getAs[Seq[Float]](0).toArray),
        cents.map(_.toArray).toArray, norms, 2, true)
        .toIntArray().toSeq
    }
    assert(viaExpr.map(_.toSeq).toSeq == viaEval.map(_.toSeq).toSeq)
  }
}
