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
          // a short/long reply must FAIL, not zip-truncate: a server
          // skipping one failed input mid-batch would silently pair every
          // subsequent id with the previous text's vector (the resilient
          // twin already enforces this; the doc promises one row per
          // input)
          require(vecs.length == batch.length,
            s"embed returned ${vecs.length} vectors for ${batch.length} texts")
          batch.iterator.zip(vecs.iterator).map { case ((id, _), v) =>
            EmbeddedRow(id, v)
          }
        }
      }
  }

  /** Outcome row of the resilient path: embedding present on success;
    * failures carry the last error and keep flowing (the failure QUEUE —
    * the reference re-seeds failed pending_embeddings rows for the next
    * worker pass rather than aborting the batch job).
    */
  final case class EmbedOutcome(id: Long, embedding: Option[Array[Float]],
      attempts: Int, error: Option[String])

  /** [[embedAll]] with the reference worker's full client contract
    * (vector/embed/worker.go): per-batch retry with exponential backoff,
    * a short/invalid reply treated as a failure, and — after maxAttempts —
    * the batch's rows emitted as failed OUTCOMES instead of failing the
    * job: one flaky batch must not kill a 100 TB embedding run. Split the
    * result with [[succeeded]]/[[failed]]; re-running the failed side is
    * the queue-drain loop.
    */
  def embedAllResilient(spark: SparkSession, rows: DataFrame,
      client: EmbedClient, batchSize: Int = 32, maxAttempts: Int = 3,
      backoffMs: Long = 100L): Dataset[EmbedOutcome] = {
    import spark.implicits._
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    rows.select("id", "text").as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          var attempt = 0
          var result: Option[Seq[Array[Float]]] = None
          var lastErr = ""
          while (result.isEmpty && attempt < maxAttempts) {
            attempt += 1
            try {
              val vecs = client.embed(batch.map(_._2))
              if (vecs.length != batch.length)
                throw new IllegalStateException(
                  s"short reply: ${vecs.length} vectors for ${batch.length} texts")
              result = Some(vecs)
            } catch {
              case scala.util.control.NonFatal(e) =>
                lastErr = String.valueOf(e.getMessage)
                if (attempt < maxAttempts)
                  Thread.sleep(backoffMs << (attempt - 1)) // 1x, 2x, 4x…
            }
          }
          result match {
            case Some(vecs) =>
              batch.iterator.zip(vecs.iterator).map { case ((id, _), v) =>
                EmbedOutcome(id, Some(v), attempt, None)
              }
            case None =>
              batch.iterator.map { case (id, _) =>
                EmbedOutcome(id, None, attempt, Some(lastErr))
              }
          }
        }
      }
  }

  /** The enqueue/delta selection (reference enqueue.go:29-34: newly
    * synced ids join pending_embeddings per non-retired generation;
    * queue.go Claim drains them): rows of `corpus` (id, text, ...) with
    * no vector in `embedded` (message_id) yet — the set one worker pass
    * over this generation still has to embed. The reference's
    * dual-enqueue (active + building both stay current during a rebuild)
    * is this call made once per generation, against each generation's
    * own vectors. Anti-join on the id: at 100 TB the output is the daily
    * increment — the already-embedded side is only semi-joined, never
    * re-embedded.
    */
  def pendingEmbeddings(corpus: DataFrame, embedded: DataFrame): DataFrame =
    corpus.join(embedded.select(embedded("message_id").as("__e_id")),
      corpus("id") === org.apache.spark.sql.functions.col("__e_id"), "left_anti")

  def succeeded(out: Dataset[EmbedOutcome]): Dataset[EmbeddedRow] = {
    import out.sparkSession.implicits._
    out.flatMap(o => o.embedding.map(EmbeddedRow(o.id, _)))
  }

  def failed(out: Dataset[EmbedOutcome]): Dataset[EmbedOutcome] =
    out.filter((o: EmbedOutcome) => o.error.nonEmpty)

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
