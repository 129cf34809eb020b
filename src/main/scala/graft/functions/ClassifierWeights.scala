package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Loadable weight table for the hashed-feature quality classifier
  * ([[TextFunctions.classifierScore]]) — the piece that turns the
  * placeholder classifier into a deployable one: train weights offline
  * (fastText-style logistic regression over hashed token buckets), write
  * them as a `(bucket, weight, dim)` parquet, and every scoring query
  * loads them back into a literal array lookup.
  *
  * Scale shape: the weight table is `dim` rows (1k-1M) — driver-side by
  * construction, exactly like IVF centroids (IvfIndex.scala). Scoring
  * embeds the weights as an array LITERAL in the plan, so executors get
  * them with the serialized plan (for dims past a few hundred thousand,
  * swap the literal for a broadcast variable — same expression shape).
  * The scoring scan itself stays one-pass, shuffle-free, codegen'd.
  */
object ClassifierWeights {

  /** Deterministic placeholder weights — the same `((b % 201) − 100)/100`
    * ramp [[TextFunctions.classifierScore]] computes arithmetically, so a
    * pipeline wired through a weight FILE of this table scores
    * bit-identically to the inline placeholder (and to the DuckDB oracle
    * that replays the arithmetic).
    */
  def placeholder(dim: Int = 1024): Array[Double] =
    Array.tabulate(dim)(b => ((b % 201) - 100).toDouble / 100.0)

  /** Persist a weight table as `(bucket INT, weight DOUBLE, dim INT)`
    * parquet. `dim` is the declared hashing modulus, constant across
    * rows — self-describing, so a TRUNCATED copy is detectable (without
    * it, a file cut to a dense bucket prefix would pass a density check
    * and silently rehash every token at the wrong modulus).
    */
  def write(spark: SparkSession, path: String, weights: Array[Double]): Unit = {
    import spark.implicits._
    weights.zipWithIndex.map { case (w, b) => (b, w, weights.length) }
      .toSeq.toDF("bucket", "weight", "dim")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a weight table written by [[write]] (or by an offline trainer
    * honoring the same schema) into a dense array. Bounded driver collect:
    * `dim` rows by construction. Validates the row count against the
    * DECLARED dim plus density/nullability — truncation, sparsity,
    * duplicated buckets, or null weights all mean the file is not the
    * trained table and scoring against it would silently misattribute
    * buckets.
    */
  def load(spark: SparkSession, path: String): Array[Double] = {
    val rows = spark.read.parquet(path)
      .select(col("bucket").cast("int"), col("weight").cast("double"),
        col("dim").cast("int"))
      .collect()
    require(rows.nonEmpty, s"empty classifier weight table at $path")
    val dim = rows.head.getInt(2)
    require(dim > 0 && rows.forall(r => !r.isNullAt(2) && r.getInt(2) == dim),
      s"weight table at $path declares inconsistent dim values")
    require(rows.length == dim,
      s"weight table at $path has ${rows.length} rows but declares " +
        s"dim=$dim — truncated or padded copy")
    val out = new Array[Double](dim)
    val seen = new Array[Boolean](dim)
    rows.foreach { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1),
        s"weight table at $path has a null bucket/weight row")
      val b = r.getInt(0)
      require(b >= 0 && b < dim && !seen(b),
        s"weight table at $path is not dense over [0, $dim): bucket $b")
      seen(b) = true
      out(b) = r.getDouble(1)
    }
    out
  }

  /** Score with an explicit weight vector: hash each token into a bucket
    * (same md5 idiom as the inline placeholder and
    * [[graft.operators.Sampling.hashBucket]] — reproducible in any
    * engine), look its weight up in the literal array, mean-pool, squash
    * through a sigmoid. Empty token array → mean 0 → score 0.5.
    */
  def score(toks: Column, weights: Array[Double]): Column = {
    val dim = weights.length
    val bucket = (t: Column) =>
      (conv(substring(md5(t), 1, 15), 16, 10).cast("long") % dim).cast("int")
    val weight = (t: Column) => element_at(typedLit(weights), bucket(t) + 1)
    val sum = aggregate(transform(toks, weight), lit(0.0), (a, x) => a + x)
    val mean = when(size(toks) > 0, sum / size(toks).cast("double"))
      .otherwise(lit(0.0))
    lit(1.0) / (lit(1.0) + exp(-mean))
  }
}
