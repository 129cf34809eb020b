package graft.queries

import graft.SparkTestBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Specs for the embedding-lifecycle queries and the boilerplate
  * detector — semantic invariants on the sf0.001 tables (the DuckDB
  * oracle certifies exact values at sf0.01; these pin the properties a
  * refactor must keep).
  */
class EmbedQueriesSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("similar_to_doc excludes the seed and is score-ordered") {
    val rows = EmbedQueries.similarToDoc(spark, dir).collect()
    assert(rows.length == 10)
    assert(!rows.map(_.getAs[Long]("vec_id")).contains(42L))
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("similar_to_doc with an unknown seed returns empty, not a crash") {
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("message_id"), col("embedding"))
    assert(graft.operators.VectorIndex.findSimilar(emb, -999L, 5).count() == 0)
  }

  test("embed_delta returns exactly the retired-vector doc ids") {
    val ids = EmbedQueries.embedDelta(spark, dir).collect()
      .map(_.getAs[Long]("doc_id"))
    assert(ids.nonEmpty && ids.forall(_ % 7 == 0))
    // result edge follows the bucketOrdered contract: (md5-bucket, id) —
    // 15-hex (60-bit) draw, same as BucketOrderSpec.md5Bucket
    def bkt(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 32).toInt
    }
    assert(ids.sameElements(ids.sortBy(i => (bkt(i), i))))
  }

  test("embed_outliers: 3 per label, distance descending within label") {
    val rows = EmbedQueries.embedOutliers(spark, dir).collect()
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    assert(byLabel.values.forall(_.length == 3))
    byLabel.values.foreach { g =>
      val d = g.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("dist2_fp"))
      assert(d.zip(d.tail).forall { case (a, b) => a >= b })
    }
  }

  test("trigrams: windows of 3, empty below 3 tokens") {
    import spark.implicits._
    val out = Seq("a b c d", "a b", "").toDF("text")
      .select(TextFunctions.trigrams(TextFunctions.wsTokens(col("text")))
        .as("tg"))
      .collect().map(_.getAs[scala.collection.Seq[String]]("tg"))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
    // a lone empty string is one whitespace token → below 3 → empty
    assert(out(2).isEmpty)
  }

  test("boilerplate coverage counts distinct covered positions") {
    val rows = PipelineQueries.boilerplateNgrams(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nOcc = r.getAs[Long]("n_occ")
      val covered = r.getAs[Long]("covered")
      // each occurrence covers 3 positions; overlaps only shrink the union
      assert(covered <= 3 * nOcc && covered >= 3)
      val frac = r.getAs[Double]("boiler_frac")
      assert(frac > 0.0 && frac <= 1.0)
    }
  }
}
