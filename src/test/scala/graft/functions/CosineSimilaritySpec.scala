package graft.functions

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CosineSimilarity

/** The custom codegen'd cosine Expression must be bit-identical to the
  * higher-order-function formulation it replaces (same index-order double
  * folds), including null/edge propagation.
  */
class CosineSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  // the TRUE higher-order-function formulation, spelled inline: it is the
  // reference this spec certifies against, and Similarity.dot itself is
  // the codegen'd DotProduct since r15 (comparing that would be circular)
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    hofDot(a, b) / (sqrt(hofDot(a, a)) * sqrt(hofDot(b, b)))

  test("bit-identical to the HOF fold on random float vectors") {
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(64)(rng.nextFloat() * 2 - 1), Seq.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        CosineSimilarity(col("a"), col("b")).as("fast"),
        hofCosine(col("a"), col("b")).as("hof"))
    val bad = df.filter(col("fast") =!= col("hof")).count()
    assert(bad == 0, s"$bad rows differ from the HOF fold")
  }

  test("bit-identical to the HOF fold on integer code arrays (byte and long)") {
    // the quantized-scan path: int8 codes vs a float query vector
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(64)((rng.nextInt(255) - 127).toByte),
        Seq.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "codes", "q")
    def check(codesCol: org.apache.spark.sql.Column): Unit = {
      val bad = df.select(
        CosineSimilarity(codesCol, col("q")).as("fast"),
        hofCosine(codesCol, col("q")).as("hof"))
        .filter(col("fast") =!= col("hof")).count()
      assert(bad == 0, s"$bad rows differ from the HOF fold")
    }
    check(col("codes")) // array<byte>
    check(transform(col("codes"), _.cast("long"))) // array<long>
  }

  test("bare NULL and array() literals analyze and yield null (HOF parity)") {
    // the zip_with+aggregate form returns NULL per row for these; the
    // Expression must not fail ANALYSIS on them
    val df = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("a")
    assert(df.select(CosineSimilarity(lit(null), col("a")).as("c"))
      .head().isNullAt(0))
    assert(df.select(CosineSimilarity(array(), col("a")).as("c"))
      .head().isNullAt(0)) // zero-length vs 2 → length mismatch → null
  }

  test("null propagation: null array, null element, length mismatch") {
    val df = Seq(
      (1L, Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f))),
      (2L, None, Some(Seq(1.0f, 2.0f))),
      (3L, Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f))))
      .toDF("id", "a", "b")
      .select(col("id"), CosineSimilarity(col("a"), col("b")).as("c"))
      .orderBy(col("id")).collect()
    assert(!df(0).isNullAt(1) && math.abs(df(0).getDouble(1) - 1.0) < 1e-15)
    assert(df(1).isNullAt(1))
    assert(df(2).isNullAt(1))

    val df2 = Seq((1L, Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 2.0f)))
      .toDF("id", "a", "b")
      .select(CosineSimilarity(col("a"), col("b")).as("c")).collect()
    assert(df2(0).isNullAt(0))
  }

  test("zero-norm vectors yield null, never NaN (would rank first in KNN)") {
    val out = Seq(
      (1L, Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)),
      (2L, Seq(1.0f, 1.0f), Seq(0.0f, 0.0f)),
      (3L, Seq[Float](), Seq[Float]()))
      .toDF("id", "a", "b")
      .select(col("id"), CosineSimilarity(col("a"), col("b")).as("c"))
      .orderBy(col("id")).collect()
    assert(out.forall(_.isNullAt(1)))
  }

  test("works with double arrays and inside whole-stage codegen pipelines") {
    val df = Seq((1L, Seq(3.0, 4.0), Seq(4.0, 3.0)))
      .toDF("id", "a", "b")
      .filter(col("id") > 0) // force a codegen stage around it
      .select((CosineSimilarity(col("a"), col("b")) * 25.0).as("c"))
      .collect()
    assert(math.abs(df(0).getDouble(0) - 24.0) < 1e-12)
  }
}
