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
        // one retry ladder, reused by the batch call and each downshift
        // singleton: (vectors, attemptsUsed) or (error, attemptsUsed)
        def tryEmbed(texts: Seq[String],
            attempts: Int): (Either[String, Seq[Array[Float]]], Int) = {
          var attempt = 0
          var result: Option[Seq[Array[Float]]] = None
          var lastErr = ""
          while (result.isEmpty && attempt < attempts) {
            attempt += 1
            try {
              val vecs = client.embed(texts)
              if (vecs.length != texts.length)
                throw new IllegalStateException(
                  s"short reply: ${vecs.length} vectors for ${texts.length} texts")
              result = Some(vecs)
            } catch {
              case scala.util.control.NonFatal(e) =>
                lastErr = String.valueOf(e.getMessage)
                if (attempt < attempts)
                  Thread.sleep(backoffMs << (attempt - 1)) // 1x, 2x, 4x…
            }
          }
          (result.toRight(lastErr), attempt)
        }
        it.grouped(batchSize).flatMap { batch =>
          tryEmbed(batch.map(_._2), maxAttempts) match {
            case (Right(vecs), n) =>
              batch.iterator.zip(vecs.iterator).map { case ((id, _), v) =>
                EmbedOutcome(id, Some(v), n, None)
              }
            case (Left(_), n) if batch.length > 1 =>
              // DOWNSHIFT (reference downshiftDrain, worker.go:581-690):
              // a batch that keeps failing may hold ONE poison input
              // (413 too-large, 422 unprocessable) — walking the same
              // rows one at a time preserves every non-poison row's
              // work instead of failing all of them together. Each
              // singleton gets ONE try, not the full ladder (r13
              // review find): poison detection needs one call, the
              // batch ladder already retried transients, and a full
              // per-singleton ladder would multiply a dead endpoint's
              // cost by batchSize in calls AND backoff sleeps — the
              // failed side output is the retry channel (the caller's
              // queue-drain loop re-runs it). The reference's
              // deferred-drop bookkeeping maps onto the outcome model:
              // when EVERY singleton fails the caller's failed() set is
              // the whole batch (the all-released state); a mixed
              // result marks only the poison rows.
              batch.iterator.map { case (id, text) =>
                tryEmbed(Seq(text), 1) match {
                  case (Right(v), m) => EmbedOutcome(id, Some(v.head), n + m, None)
                  case (Left(err), m) => EmbedOutcome(id, None, n + m, Some(err))
                }
              }
            case (Left(err), n) =>
              batch.iterator.map { case (id, _) =>
                EmbedOutcome(id, None, n, Some(err))
              }
          }
        }
      }
  }

  /** Input row of [[embedInputs]]: the preprocessed text plus the
    * reference's per-chunk metadata (SourceCharLen in RUNES of the
    * final text, Truncated; worker.go:481-487) and the EMPTY flag —
    * the reference drops empty-text ids from the queue with no vector
    * (worker.go:476-479), and missing/flagged rows are the caller's to
    * route the same way.
    */
  final case class EmbedInputRow(id: Long, text: String,
      source_char_len: Int, truncated: Boolean, empty: Boolean)

  /** The worker's input-assembly contract (embedBatch,
    * worker.go:446-487), as one distributed pass over
    * (id, subject, body_text, body_html) rows:
    *
    *   1. body = body_text, falling back to StripHTML(body_html) when
    *      the plaintext is empty — "HTML-only messages would otherwise
    *      get subject-only embeddings" (worker.go:466-470). The check is
    *      the reference's EXACT `body == ""` — a whitespace-only
    *      plaintext part (e.g. "\n") blocks the fallback there too and
    *      embeds subject-only; mirrored rather than "improved" with a
    *      trim (r13 third review round considered and kept);
    *   2. text = Preprocess(subject, body, maxChars) (quote/signature
    *      strips per [[graft.functions.Mime.preprocessForEmbedding]]);
    *   3. source_char_len counts RUNES of the truncated text, never
    *      bytes (the reference's explicit comment, worker.go:481-485);
    *   4. whitespace-only text flags `empty` instead of embedding.
    */
  def embedInputs(spark: SparkSession, msgs: DataFrame,
      maxChars: Int = 8000, stripQuotes: Boolean = true,
      stripSignatures: Boolean = true): Dataset[EmbedInputRow] = {
    import spark.implicits._
    msgs.select(
      org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.col("subject"),
      org.apache.spark.sql.functions.col("body_text"),
      org.apache.spark.sql.functions.col("body_html"))
      .as[(Long, String, String, String)]
      .map { case (id, subject, bodyText, bodyHtml) =>
        val bt = if (bodyText == null) "" else bodyText
        val bh = if (bodyHtml == null) "" else bodyHtml
        val body =
          if (bt.isEmpty && bh.nonEmpty) graft.functions.Mime.stripHtml(bh)
          else bt
        val full = graft.functions.Mime.preprocessForEmbedding(
          subject, body, 0, stripQuotes, stripSignatures)
        val runes = full.codePointCount(0, full.length)
        val truncated = maxChars > 0 && runes > maxChars
        val text =
          if (truncated) full.substring(0, full.offsetByCodePoints(0, maxChars))
          else full
        EmbedInputRow(id, text, text.codePointCount(0, text.length),
          truncated, text.trim.isEmpty)
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
