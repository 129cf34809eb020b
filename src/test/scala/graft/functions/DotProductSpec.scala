package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DotProduct

/** The codegen'd dot-product Expression (r15: `Similarity.dot`'s
  * implementation, and the per-vector-norm half of the hoisted pair
  * cosine) must be bit-identical to the higher-order-function
  * formulation it replaces — same index-order double fold, same
  * null/edge propagation, NO zero-norm special case (0.0 is a value).
  */
class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the HOF fold on random float vectors") {
    val rng = new scala.util.Random(13)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(64)(rng.nextFloat() * 2 - 1), Seq.fill(64)(rng.nextFloat() * 2 - 1)))
    val bad = rows.toDF("id", "a", "b")
      .select(DotProduct(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(bad == 0, s"$bad rows differ from the HOF fold")
  }

  test("bit-identical on integer code arrays (byte and long)") {
    val rng = new scala.util.Random(17)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(64)((rng.nextInt(255) - 127).toByte),
        Seq.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "codes", "q")
    def check(codesCol: org.apache.spark.sql.Column): Unit = {
      val bad = df.select(DotProduct(codesCol, col("q")).as("fast"),
        hofDot(codesCol, col("q")).as("hof"))
        .filter(col("fast") =!= col("hof")).count()
      assert(bad == 0, s"$bad rows differ from the HOF fold")
    }
    check(col("codes"))
    check(transform(col("codes"), _.cast("long")))
  }

  test("null propagation: null array, null element, length mismatch; empty = 0.0") {
    val out = Seq(
      (1L, Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (2L, None, Some(Seq(1.0f, 2.0f))),
      (3L, Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f))),
      (4L, Some(Seq[Float]()), Some(Seq[Float]())))
      .toDF("id", "a", "b")
      .select(col("id"), DotProduct(col("a"), col("b")).as("d"))
      .orderBy(col("id")).collect()
    assert(out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(1), "null array must yield null")
    assert(out(2).isNullAt(1), "length mismatch must yield null")
    assert(out(3).getDouble(1) == 0.0, "empty arrays fold to 0.0, not null")

    val nullElem = Seq((1L, Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](1.0f, 2.0f)))
      .toDF("id", "a", "b")
      .select(DotProduct(col("a"), col("b")).as("d")).collect()
    assert(nullElem(0).isNullAt(0), "null element must yield null")
  }

  test("bare NULL and array() literals analyze and yield null/0.0 (HOF parity)") {
    val df = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("a")
    assert(df.select(DotProduct(lit(null), col("a")).as("d")).head().isNullAt(0))
    // zero-length vs 2 → length mismatch → null (zip_with pads with nulls)
    assert(df.select(DotProduct(array(), col("a")).as("d")).head().isNullAt(0))
  }

  test("zero vectors dot to 0.0 — a VALUE (the norm hoist relies on it)") {
    val out = Seq((1L, Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)))
      .toDF("id", "a", "b")
      .select(DotProduct(col("a"), col("a")).as("aa"),
        DotProduct(col("a"), col("b")).as("ab")).collect()
    assert(out(0).getDouble(0) == 0.0 && out(0).getDouble(1) == 0.0)
  }

  test("hoisted-norm pair cosine is bit-identical to the fused CosineSimilarity") {
    // the exact recipe knnGraph/semanticDupes now evaluate per pair:
    // na = sqrt(dot(a,a)) per vector, score = dot(a,b)/(na*nb) with the
    // zero-norm→null guard — must equal CosineSimilarity(a,b) bitwise,
    // including on zero vectors (both sides null)
    val rng = new scala.util.Random(23)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong,
        if (i % 17 == 0) Seq.fill(32)(0.0f) else Seq.fill(32)(rng.nextFloat() * 2 - 1),
        Seq.fill(32)(rng.nextFloat() * 2 - 1)))
    val na = sqrt(DotProduct(col("a"), col("a")))
    val nb = sqrt(DotProduct(col("b"), col("b")))
    val hoisted = when(na === 0.0 || nb === 0.0, lit(null).cast("double"))
      .otherwise(DotProduct(col("a"), col("b")) / (na * nb))
    val got = rows.toDF("id", "a", "b")
      .select(hoisted.as("hoisted"),
        org.apache.spark.sql.graft.CosineSimilarity(col("a"), col("b")).as("fused"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null disagreement: $r")
      if (!r.isNullAt(0))
        assert(r.getDouble(0) == r.getDouble(1), s"value disagreement: $r")
    }
    assert(got.exists(_.isNullAt(0)), "fixture must include zero-norm rows")
  }
}
