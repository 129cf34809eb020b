package graft.operators

import graft.SparkTestBase
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** The real HTTP embeddings client against a local fixture server
  * (reference client semantics: internal/vector/embed/client.go) — and
  * the end-to-end EmbedQuantizeSpec-style run of the resilient batch
  * pipeline with the REAL client class instead of the deterministic
  * stub.
  */
class HttpEmbedClientSpec extends SparkTestBase {

  private val dim = 4

  /** Deterministic per-text vector so assertions don't depend on order. */
  private def vecFor(t: String): Seq[Float] =
    (0 until dim).map(i => (math.abs(t.hashCode % 97) + i).toFloat)

  private def embeddingJson(texts: Seq[String],
      shuffleIdx: Boolean = false): String = {
    val idx = texts.indices
    val order = if (shuffleIdx) idx.reverse else idx
    val data = order.map { i =>
      s"""{"index":$i,"embedding":[${vecFor(texts(i)).mkString(",")}]}"""
    }.mkString(",")
    s"""{"data":[$data],"model":"fixture"}"""
  }

  private def parseInputs(body: String): Seq[String] = {
    // fixture-grade parse: input is always a flat array of JSON strings
    val m = """"input":\[(.*?)\],"model"""".r.findFirstMatchIn(body)
    m.map(_.group(1).split("\",\"").map(_.stripPrefix("\"")
      .stripSuffix("\"")).toSeq).getOrElse(Nil)
  }

  /** One-route fixture server; handler decides status/body per call. */
  private def withServer(handler: (Int, String) => (Int, String,
      Map[String, String]))(f: (String, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    server.createContext("/v1/embeddings", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        val n = calls.incrementAndGet()
        val (code, resp, headers) = handler(n, body)
        headers.foreach { case (k, v) =>
          ex.getResponseHeaders.set(k, v)
        }
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/v1", calls)
    finally server.stop(0)
  }

  private def client(endpoint: String, retries: Int = 3) =
    HttpEmbedClient(endpoint, model = "fixture", dimension = dim,
      apiKey = "test-key", maxRetries = retries, backoffUnitMs = 1L)

  test("happy path: vectors placed by index even when served out of order") {
    withServer((_, body) =>
      (200, embeddingJson(parseInputs(body), shuffleIdx = true), Map.empty)) {
      (ep, calls) =>
        val texts = Seq("alpha", "beta", "gamma")
        val out = client(ep).embed(texts)
        assert(out.map(_.toSeq) == texts.map(vecFor))
        assert(calls.get() == 1)
    }
  }

  test("empty input makes no HTTP call") {
    withServer((_, _) => (200, "{}", Map.empty)) { (ep, calls) =>
      assert(client(ep).embed(Nil).isEmpty)
      assert(calls.get() == 0)
    }
  }

  test("5xx retries then succeeds; bearer token is sent") {
    var sawAuth = false
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    server.createContext("/v1/embeddings", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        sawAuth = sawAuth ||
          ex.getRequestHeaders.getFirst("Authorization") == "Bearer test-key"
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        val n = calls.incrementAndGet()
        val (code, resp) =
          if (n < 3) (503, "overloaded")
          else (200, embeddingJson(parseInputs(body)))
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val ep = s"http://127.0.0.1:${server.getAddress.getPort}/v1"
      val out = client(ep).embed(Seq("x"))
      assert(out.head.toSeq == vecFor("x"))
      assert(calls.get() == 3) // 503, 503, 200
      assert(sawAuth)
    } finally server.stop(0)
  }

  test("429 with Retry-After: 0 retries immediately and succeeds") {
    withServer((n, body) =>
      if (n == 1) (429, "slow down", Map("Retry-After" -> "0"))
      else (200, embeddingJson(parseInputs(body)), Map.empty)) {
      (ep, calls) =>
        assert(client(ep).embed(Seq("y")).head.toSeq == vecFor("y"))
        assert(calls.get() == 2)
    }
  }

  test("3xx redirects are followed like Go's default http.Client") {
    // 307 preserves method+body across the hop; the JDK default policy
    // (Redirect.NEVER) would hand the 3xx to the success branch, fail
    // JSON decode, and burn every retry on a misleading error
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    server.createContext("/v1/embeddings", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        calls.incrementAndGet()
        ex.getResponseHeaders.set("Location", "/v2/embeddings")
        ex.sendResponseHeaders(307, -1)
        ex.close()
      }
    })
    var authAtTarget: String = null
    server.createContext("/v2/embeddings", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        authAtTarget = ex.getRequestHeaders.getFirst("Authorization")
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        calls.incrementAndGet()
        val bytes = embeddingJson(parseInputs(body))
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val ep = s"http://127.0.0.1:${server.getAddress.getPort}/v1"
      assert(client(ep).embed(Seq("r")).head.toSeq == vecFor("r"))
      assert(calls.get() == 2) // one hop, one real response — no retries
      assert(authAtTarget == "Bearer test-key",
        "a SAME-host redirect keeps the bearer token (Go parity)")
    } finally server.stop(0)
  }

  test("cross-host redirect strips the Authorization header (Go parity)") {
    // Go's http.Client drops Authorization/Cookie when a redirect leaves
    // the original host; the JDK's Redirect.NORMAL resends everything —
    // an open-redirecting embed endpoint would hand the API key to a
    // third party. 'localhost' vs '127.0.0.1' is a different host string,
    // which is exactly the comparison the client must make.
    val target = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    var authAtTarget: String = "unset"
    target.createContext("/v1/embeddings", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        authAtTarget = ex.getRequestHeaders.getFirst("Authorization")
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        val bytes = embeddingJson(parseInputs(body))
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    target.start()
    val origin = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    origin.createContext("/v1/embeddings", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        ex.getResponseHeaders.set("Location",
          s"http://127.0.0.1:${target.getAddress.getPort}/v1/embeddings")
        ex.sendResponseHeaders(307, -1)
        ex.close()
      }
    })
    origin.start()
    try {
      // endpoint names the origin as 'localhost'; the hop goes to
      // '127.0.0.1' — same machine, different host ⇒ sensitive headers off
      val ep = s"http://localhost:${origin.getAddress.getPort}/v1"
      assert(client(ep).embed(Seq("r")).head.toSeq == vecFor("r"))
      assert(authAtTarget == null,
        s"cross-host redirect must not carry the bearer (saw $authAtTarget)")
    } finally { origin.stop(0); target.stop(0) }
  }

  test("credential scope: case-insensitive hosts and subdomains keep auth") {
    // Go net/http isDomainOrSubdomain semantics
    val c = client("http://x")
    assert(c.sameOrSubdomain("API.example.com", "api.example.com"))
    assert(c.sameOrSubdomain("sub.api.example.com", "api.example.com"))
    assert(!c.sameOrSubdomain("evil.com", "api.example.com"))
    assert(!c.sameOrSubdomain("notapi.example.com", "api.example.com"))
    assert(!c.sameOrSubdomain("api.example.com.evil.com", "api.example.com"))
    assert(!c.sameOrSubdomain("anything", ""))
  }

  test("3xx without a Location header is permanent, not retried decode noise") {
    withServer((_, _) => (302, "<html>moved</html>", Map.empty)) { (ep, calls) =>
      val e = intercept[RuntimeException](client(ep).embed(Seq("z")))
      assert(e.getMessage.contains("redirect without Location"))
      assert(calls.get() == 1) // permanent: no retries
    }
  }

  test("permanent 4xx fails immediately without retrying") {
    withServer((_, _) => (400, "bad model", Map.empty)) { (ep, calls) =>
      val e = intercept[RuntimeException](client(ep).embed(Seq("z")))
      assert(e.getMessage.contains("HTTP 400"))
      assert(e.getMessage.contains("bad model"))
      assert(calls.get() == 1)
    }
  }

  test("transient errors exhaust retries with a giving-up error") {
    withServer((_, _) => (500, "boom", Map.empty)) { (ep, calls) =>
      val e = intercept[RuntimeException](client(ep, retries = 2)
        .embed(Seq("w")))
      assert(e.getMessage.contains("giving up after 2 attempts"))
      assert(calls.get() == 2)
    }
  }

  test("dimension mismatch and missing index are permanent errors") {
    withServer((_, _) =>
      (200, """{"data":[{"index":0,"embedding":[1.0,2.0]}]}""", Map.empty)) {
      (ep, _) =>
        val e = intercept[RuntimeException](client(ep).embed(Seq("a")))
        assert(e.getMessage.contains("dimension mismatch"))
    }
    withServer((_, _) =>
      (200, s"""{"data":[{"index":1,"embedding":[1.0,2.0,3.0,4.0]}]}""",
        Map.empty)) { (ep, _) =>
      val e = intercept[RuntimeException](client(ep).embed(Seq("a")))
      assert(e.getMessage.contains("invalid index"))
    }
    // a valid-looking response missing one slot
    withServer((_, _) =>
      (200, s"""{"data":[]}""", Map.empty)) { (ep, _) =>
      val e = intercept[RuntimeException](client(ep).embed(Seq("a")))
      assert(e.getMessage.contains("missing embedding at index 0"))
    }
  }

  test("parseRetryAfter: delta seconds, clamp, dates, garbage") {
    import HttpEmbedClient.parseRetryAfter
    assert(parseRetryAfter("0").contains(0L))
    assert(parseRetryAfter("2").contains(2000L))
    assert(parseRetryAfter("999999").contains(3600L * 1000L)) // clamped
    assert(parseRetryAfter("-5").isEmpty)
    assert(parseRetryAfter("soon").isEmpty)
    assert(parseRetryAfter("").isEmpty)
    // an HTTP-date in the past = retry now (Some(0)), not fallback
    assert(parseRetryAfter("Mon, 01 Jan 2001 00:00:00 GMT").contains(0L))
  }

  test("end-to-end: resilient batch pipeline with the real client") {
    import spark.implicits._
    withServer((n, body) =>
      // every third call fails transiently — the pipeline must still
      // embed every row through client-level retries
      if (n % 3 == 0) (503, "flaky", Map.empty)
      else (200, embeddingJson(parseInputs(body)), Map.empty)) {
      (ep, _) =>
        val rows = (1 to 20).map(i => (i.toLong, s"text-$i"))
          .toDF("id", "text")
        val out = Embed.embedAllResilient(spark, rows, client(ep),
          batchSize = 3, maxAttempts = 2, backoffMs = 1L).collect()
        assert(out.length == 20)
        assert(out.forall(_.error.isEmpty))
        out.foreach { o =>
          assert(o.embedding.get.toSeq == vecFor(s"text-${o.id}"))
        }
    }
  }
}
