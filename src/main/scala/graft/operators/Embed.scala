package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Batch embedding plumbing (reference: internal/vector/embed/{queue,
  * worker,client}.go — pending rows seeded per generation, batched calls
  * to an embedding HTTP server). Spark shape: `mapPartitions` so each
  * partition opens ONE client, drains its rows in `batchSize` chunks, and
  * emits (id, embedding) — the pattern that scales batch inference to a
  * cluster (connection-per-partition, not per-row; batching amortizes
  * round trips; no driver involvement).
  *
  * The HTTP client itself is stubbed behind [[EmbedClient]] (this
  * environment has no model server or egress); [[deterministicClient]]
  * produces a stable fake so the plumbing — batching, ordering,
  * partition independence — is real and tested.
  */
object Embed {

  /** One client per partition; `embed` receives ≤ batchSize texts. */
  trait EmbedClient extends Serializable {
    def embed(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Deterministic stand-in for the HTTP client: dim floats derived from
    * the text's hash — stable across partitionings and retries.
    */
  def deterministicClient(dim: Int): EmbedClient = new EmbedClient {
    def embed(texts: Seq[String]): Seq[Array[Float]] =
      texts.map { t =>
        val h = t.## // deterministic per content
        Array.tabulate(dim)(i =>
          (((h * 31 + i) % 1000).toFloat / 1000.0f))
      }
  }

  final case class EmbeddedRow(id: Long, embedding: Array[Float])

  /** Embed (id, text) rows: per-partition client, batched calls.
    * Input is (id, text); output one row per input with its vector.
    */
  def embedAll(spark: SparkSession, rows: DataFrame,
      client: EmbedClient, batchSize: Int = 32): Dataset[EmbeddedRow] = {
    import spark.implicits._
    rows.select("id", "text").as[(Long, String)]
      .mapPartitions { it =>
        // one client per partition (the reference's worker holds one
        // HTTP connection per goroutine)
        it.grouped(batchSize).flatMap { batch =>
          val vecs = client.embed(batch.map(_._2))
          batch.iterator.zip(vecs.iterator).map { case ((id, _), v) =>
            EmbeddedRow(id, v)
          }
        }
      }
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * storage/serving compression for vector corpora (4× smaller than
    * float32, dot products stay SIMD-friendly). Per vector:
    * scale = max|v|/127, code_i = floor(v_i/scale + 0.5) ∈ [-127, 127],
    * plus the quantization MSE (the quality signal a pipeline thresholds
    * on before switching an index to int8).
    *
    * Per-row scalar arithmetic only — no shuffle, scales linearly.
    * Determinism across engines (for the differential oracle): floats
    * widen to double exactly; max/division/floor are IEEE-exact; the MSE
    * sum folds in index order on both sides. Zero vectors quantize to
    * all-zero codes with scale 0 (guarded division).
    *
    * Returns (id, scale, codes: array<long>, code_checksum, mse).
    */
  def quantizeInt8(df: DataFrame, id: Column, vec: Column): DataFrame = {
    import org.apache.spark.sql.functions._
    val vd = transform(vec, x => x.cast("double"))
    val scale = array_max(transform(vd, x => abs(x))) / lit(127.0)
    val safe = when(col("scale") === 0.0, lit(1.0)).otherwise(col("scale"))
    df.select(id.as("id"), vd.as("__v"), scale.as("scale"))
      .withColumn("codes",
        transform(col("__v"), x => floor(x / safe + lit(0.5)).cast("long")))
      .withColumn("code_checksum",
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c))
      .withColumn("mse",
        aggregate(
          zip_with(col("__v"), col("codes"),
            (x, c) => (x - c * col("scale")) * (x - c * col("scale"))),
          lit(0.0), (acc, e) => acc + e) / size(col("__v")))
      .drop("__v")
  }
}
