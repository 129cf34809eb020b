package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EmbedQuantizeSpec extends SparkTestBase {
  import spark.implicits._

  test("quantizeInt8: codes bounded, max element hits ±127, dequant error ≤ scale/2") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(2.0f, 1.0f, -2.0f, 0.5f))
    ).toDF("vec_id", "emb")
    val out = Embed.quantizeInt8(df, col("vec_id"), col("emb"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Long](2), r.getDouble(4))).toMap
    val (s1, c1, mse1) = out(1L)
    assert(math.abs(s1 - 1.0 / 127.0) < 1e-12)
    // -1.0 is the max-abs element → code -127; 0.5 → 64 (floor(63.5+0.5))
    assert(c1 == Seq(64L, -127L, 32L, 0L))
    assert(c1.forall(c => c >= -127 && c <= 127))
    // per-element error ≤ scale/2 ⇒ mse ≤ scale²/4
    assert(mse1 <= s1 * s1 / 4 + 1e-18)
    val (s2, c2, _) = out(2L)
    assert(c2 == Seq(127L, 64L, -127L, 32L))
    assert(math.abs(s2 - 2.0 / 127.0) < 1e-12)
  }

  test("quantizeInt8: zero vector → scale 0, all-zero codes, zero mse") {
    val df = Seq((9L, Array(0.0f, 0.0f))).toDF("vec_id", "emb")
    val r = Embed.quantizeInt8(df, col("vec_id"), col("emb")).head()
    assert(r.getDouble(1) == 0.0)
    assert(r.getSeq[Long](2) == Seq(0L, 0L))
    assert(r.getLong(3) == 0L && r.getDouble(4) == 0.0)
  }

  test("pendingEmbeddings selects only rows the generation hasn't embedded") {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "text")
    val embedded = Seq((1L, Array(0.1f)), (3L, Array(0.2f)))
      .toDF("message_id", "embedding")
    val pending = Embed.pendingEmbeddings(corpus, embedded)
    assert(pending.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
    assert(pending.columns.toSeq == Seq("id", "text")) // corpus shape kept
    // drained generation → empty delta; empty generation → whole corpus
    val all = Seq((1L, Array(0f)), (2L, Array(0f)), (3L, Array(0f)), (4L, Array(0f)))
      .toDF("message_id", "embedding")
    assert(Embed.pendingEmbeddings(corpus, all).isEmpty)
    assert(Embed.pendingEmbeddings(corpus, all.limit(0)).count() == 4L)
  }

  test("embedAllResilient: transient failures retry with backoff and recover") {
    EmbedQuantizeSpec.callCount.set(0)
    // fails the first 2 calls in the JVM, then succeeds — exercises the
    // retry loop (local mode shares the static across tasks)
    val flaky = new Embed.EmbedClient {
      def embed(texts: Seq[String]): Seq[Array[Float]] = {
        if (EmbedQuantizeSpec.callCount.incrementAndGet() <= 2)
          throw new RuntimeException("503 from embedding server")
        texts.map(t => Array(t.length.toFloat))
      }
    }
    val rows = (1 to 5).map(i => (i.toLong, "x" * i)).toDF("id", "text")
      .coalesce(1) // one partition ⇒ deterministic call sequence
    val out = Embed.embedAllResilient(spark, rows, flaky,
      batchSize = 10, maxAttempts = 3, backoffMs = 1L).collect()
    assert(out.length == 5 && out.forall(_.error.isEmpty))
    assert(out.forall(_.attempts == 3))
    assert(out.map(o => o.id -> o.embedding.get.head).toMap ==
      (1 to 5).map(i => i.toLong -> i.toFloat).toMap)
  }

  test("embedAllResilient: persistent failure lands in the failed side output") {
    val dead = new Embed.EmbedClient {
      def embed(texts: Seq[String]): Seq[Array[Float]] =
        throw new RuntimeException("connection refused")
    }
    val rows = (1 to 4).map(i => (i.toLong, s"t$i")).toDF("id", "text")
      .coalesce(1) // deterministic batching: two 2-row batches
    val out = Embed.embedAllResilient(spark, rows, dead,
      batchSize = 2, maxAttempts = 2, backoffMs = 1L)
    assert(Embed.succeeded(out).count() == 0)
    val failures = Embed.failed(out).collect()
    assert(failures.length == 4)
    // 2 batch attempts + ONE downshift-singleton try per row (the
    // singleton walk probes for poison, it does not re-run the ladder —
    // a dead endpoint must not cost batchSize extra ladders); the
    // all-failed downshift is the reference's "nothing embedded →
    // endpoint-wide" verdict, reported per row
    assert(failures.forall(f => f.attempts == 3 &&
      f.error.get.contains("connection refused")))
  }

  test("embedAllResilient: downshift isolates a poison input, the rest of its batch embeds") {
    // reference downshiftDrain (worker.go:581-690): a batch that keeps
    // failing may hold ONE poison row — singleton walk preserves the
    // other rows' work instead of failing the whole batch with it
    val poison = new Embed.EmbedClient {
      def embed(texts: Seq[String]): Seq[Array[Float]] = {
        if (texts.exists(_.contains("POISON")))
          throw new RuntimeException("413 payload too large (non-retryable)")
        texts.map(t => Array(t.length.toFloat))
      }
    }
    val rows = Seq((1L, "aa"), (2L, "POISON-doc"), (3L, "cccc"))
      .toDF("id", "text").coalesce(1)
    val out = Embed.embedAllResilient(spark, rows, poison,
      batchSize = 3, maxAttempts = 2, backoffMs = 1L).collect()
    val byId = out.map(o => o.id -> o).toMap
    assert(byId(1L).embedding.exists(_.head == 2.0f))
    assert(byId(3L).embedding.exists(_.head == 4.0f))
    assert(byId(2L).embedding.isEmpty &&
      byId(2L).error.exists(_.contains("413")))
  }

  test("embedInputs assembles the worker's exact input contract") {
    // worker.go:446-487: plaintext body preferred; HTML-only falls back
    // to StripHTML; runes not bytes; whitespace-only flags empty
    val msgs = Seq(
      (1L, "s1", "plain body", "<p>html</p>"), // plain wins
      (2L, "s2", "", "<p>html <b>only</b></p>"), // HTML fallback
      (3L, "", "", ""), // nothing → empty
      (4L, "s4", "😀😀😀😀", ""), // runes: 4 emoji = 4, not 8 UTF-16 units
      (5L, null.asInstanceOf[String], "x" * 50, "")) // truncation flag
      .toDF("id", "subject", "body_text", "body_html")
    val out = Embed.embedInputs(spark, msgs, maxChars = 30)
      .collect().map(r => r.id -> r).toMap
    assert(out(1L).text == "Subject: s1\n\nplain body" && !out(1L).empty)
    assert(out(2L).text == "Subject: s2\n\nhtml only")
    assert(out(3L).empty && out(3L).text == "")
    assert(out(4L).source_char_len == "Subject: s4\n\n".length + 4)
    assert(out(5L).truncated && out(5L).source_char_len == 30 &&
      out(5L).text == "x" * 30)
    assert(!out(1L).truncated && !out(4L).truncated)
  }

  test("embedAllResilient: a short reply is a failure, not silent row loss") {
    val short = new Embed.EmbedClient {
      def embed(texts: Seq[String]): Seq[Array[Float]] =
        texts.drop(1).map(_ => Array(1.0f)) // one vector short
    }
    val rows = Seq((1L, "a"), (2L, "b")).toDF("id", "text").coalesce(1)
    val out = Embed.embedAllResilient(spark, rows, short,
      batchSize = 2, maxAttempts = 2, backoffMs = 1L).collect()
    assert(out.forall(_.error.exists(_.contains("short reply"))))
  }

  test("ngramDocFreq counts each doc once and orders (freq desc, ngram asc)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon other"),
      (3L, "alpha beta gamma delta epsilon"),
      // repeats the gram INSIDE one doc — still counts once for doc 4
      (4L, "alpha beta gamma delta epsilon pad alpha beta gamma delta epsilon"),
      (5L, "short doc")
    ).toDF("doc_id", "text")
    val top = Curation.ngramDocFreq(docs, col("doc_id"), col("text"),
      n = 5, topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head == ("alpha beta gamma delta epsilon", 4L))
    // remaining entries are ngram-ascending within equal freq
    assert(top.map(_._2).sorted.reverse.toSeq == top.map(_._2).toSeq)
  }
}

object EmbedQuantizeSpec {
  // shared with the flaky-client closure: local mode runs tasks in-JVM,
  // so a static counter gives a deterministic cross-call failure script
  val callCount = new java.util.concurrent.atomic.AtomicInteger(0)
}
