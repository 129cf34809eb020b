package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

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
}
