package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ClassifierWeightsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files
    .createTempDirectory("graft_clf_spec").resolve("w").toString

  test("write/load round-trips a weight table exactly") {
    val w = Array.tabulate(64)(b => b * 0.25 - 8.0)
    val path = tmp()
    ClassifierWeights.write(spark, path, w)
    assert(ClassifierWeights.load(spark, path).toSeq == w.toSeq)
  }

  test("load rejects a sparse (non-dense-bucket) weight table") {
    val path = tmp()
    // buckets 0 and 5 in a declared dim-2 table: not dense over [0, 2)
    Seq((0, 1.0, 2), (5, 2.0, 2)).toDF("bucket", "weight", "dim")
      .write.mode("overwrite").parquet(path)
    val e = intercept[IllegalArgumentException](
      ClassifierWeights.load(spark, path))
    assert(e.getMessage.contains("not dense"))
  }

  test("load rejects a truncated copy (dense prefix, wrong declared dim)") {
    val path = tmp()
    // a 1024-weight table cut to its first 3 rows stays bucket-dense —
    // only the declared dim exposes the truncation
    Seq((0, 1.0, 1024), (1, 2.0, 1024), (2, 3.0, 1024))
      .toDF("bucket", "weight", "dim")
      .write.mode("overwrite").parquet(path)
    val e = intercept[IllegalArgumentException](
      ClassifierWeights.load(spark, path))
    assert(e.getMessage.contains("truncated"))
  }

  test("file-loaded placeholder weights score identically to the inline classifier") {
    val docs = Seq("the quick brown fox", "lorem ipsum dolor sit amet",
      "a a a a a", "").toDF("text")
    val path = tmp()
    ClassifierWeights.write(spark, path, ClassifierWeights.placeholder())
    val w = ClassifierWeights.load(spark, path)
    val both = docs.select(
      ClassifierWeights.score(TextFunctions.wsTokens(col("text")), w).as("f"),
      TextFunctions.classifierScore(TextFunctions.wsTokens(col("text"))).as("i"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"file-weight score ${r.getDouble(0)} != inline ${r.getDouble(1)}"))
  }

  test("custom weights change the score the way the math says") {
    // all-zero weights → mean 0 → sigmoid 0.5 for every non-empty doc
    val docs = Seq("alpha beta gamma").toDF("text")
    val zero = docs.select(ClassifierWeights.score(
      TextFunctions.wsTokens(col("text")), Array.fill(16)(0.0)).as("s"))
      .head().getDouble(0)
    assert(zero == 0.5)
    // all-one weights → mean 1 → sigmoid(1)
    val one = docs.select(ClassifierWeights.score(
      TextFunctions.wsTokens(col("text")), Array.fill(16)(1.0)).as("s"))
      .head().getDouble(0)
    assert(math.abs(one - 1.0 / (1.0 + math.exp(-1.0))) < 1e-12)
  }
}
