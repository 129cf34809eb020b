package graft.operators

/** OpenAI-compatible /v1/embeddings HTTP client — the real network
  * implementation behind [[Embed.EmbedClient]] (reference
  * internal/vector/embed/client.go:1-265). Semantics mirrored exactly:
  *
  *  - POST {endpoint}/embeddings with {"input": [...], "model": m},
  *    optional `Authorization: Bearer` (client.go:146-153).
  *  - Empty input: no HTTP call, empty result (client.go:88-90).
  *  - Transient = network failure, 5xx, 429, body decode error → retried
  *    with exponential backoff 2^min(attempt,8)·100 ms (shift clamped —
  *    client.go:108-117); a 429's Retry-After header, when parseable,
  *    OVERRIDES the backoff for that attempt, including "Retry-After: 0"
  *    = retry immediately (client.go:118-131).
  *  - Other 4xx are permanent: fail without retrying (client.go:175-189).
  *  - Response vectors arrive with explicit indexes and may be out of
  *    order; they are placed by index, and dimension mismatches, bad
  *    indexes, or missing slots are (non-retried) errors
  *    (client.go:198-214).
  *
  * Serializable by configuration: each executor task constructs its own
  * JDK HttpClient on first use (`@transient lazy`), matching the
  * one-client-per-partition shape of [[Embed.embedAll]].
  */
final case class HttpEmbedClient(
    endpoint: String,
    model: String,
    dimension: Int,
    apiKey: String = "",
    timeoutMs: Long = 30000L,
    maxRetries: Int = 3,
    backoffUnitMs: Long = 100L) extends Embed.EmbedClient {

  import HttpEmbedClient._

  @transient private lazy val http: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      // Go's http.Client follows redirects by default (client.go's
      // transport is stock net/http), but strips Authorization/Cookie on
      // cross-host hops; the JDK's Redirect.NORMAL resends ALL headers to
      // the redirect target, so an open-redirecting endpoint would leak
      // the bearer key to a third party. Redirects are handled manually
      // in [[sendFollowingRedirects]] instead.
      .followRedirects(java.net.http.HttpClient.Redirect.NEVER)
      .build()

  @transient private lazy val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(
      com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  override def embed(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Nil
    val body = mapper.writeValueAsString(
      Map("input" -> texts, "model" -> model))
    var attempt = 1
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      doOnce(body, texts.length) match {
        case Right(vecs) => return vecs
        case Left(Permanent(e)) => throw e
        case Left(Transient(e, retryAfterMs)) =>
          lastErr = e
          if (attempt < maxRetries) {
            val default = (1L << math.min(attempt, 8)) * backoffUnitMs
            val wait = retryAfterMs.getOrElse(default)
            if (wait > 0) Thread.sleep(wait)
          }
      }
      attempt += 1
    }
    throw new RuntimeException(
      s"embed: giving up after $maxRetries attempts", lastErr)
  }

  /** Go's isDomainOrSubdomain (net/http/client.go): hostnames compare
    * case-insensitively, and a subdomain of the original host still
    * receives the credential — only a genuinely foreign host is stripped.
    */
  private[operators] def sameOrSubdomain(dst: String, src: String): Boolean = {
    val d = Option(dst).getOrElse("").toLowerCase
    val s = Option(src).getOrElse("").toLowerCase
    s.nonEmpty && (d == s || d.endsWith("." + s))
  }

  /** Manual 3xx handling with Go net/http's redirect semantics
    * (client.go follows stock-transport defaults): up to 10 hops
    * (net/http's cap), Location resolved against the current URI,
    * 307/308 re-POST the body while 301/302/303 degrade to a bodyless
    * GET, and — the part the JDK's Redirect.NORMAL gets wrong — the
    * `Authorization: Bearer` header is sent only when the hop target is
    * the original endpoint's host or a subdomain of it (Go strips
    * sensitive headers on cross-host redirects, so a
    * hijacked/open-redirecting endpoint cannot exfiltrate the API key).
    */
  private def sendFollowingRedirects(start: java.net.URI,
      body: String): java.net.http.HttpResponse[String] = {
    val originalHost = start.getHost
    var uri = start
    var method = "POST"
    var hops = 0
    while (true) {
      val b = java.net.http.HttpRequest.newBuilder()
        .uri(uri)
        .timeout(java.time.Duration.ofMillis(timeoutMs))
      if (apiKey.nonEmpty && sameOrSubdomain(uri.getHost, originalHost))
        b.header("Authorization", s"Bearer $apiKey")
      if (method == "POST")
        b.header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      else b.GET()
      val resp = http.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val code = resp.statusCode()
      val loc = resp.headers().firstValue("Location").orElse("")
      if (code < 300 || code > 399 || loc.isEmpty) return resp
      hops += 1
      if (hops > 10)
        throw new java.io.IOException("stopped after 10 redirects")
      uri = uri.resolve(loc)
      if (code == 301 || code == 302 || code == 303) method = "GET"
    }
    throw new IllegalStateException("unreachable")
  }

  private def doOnce(body: String,
      want: Int): Either[EmbedError, Seq[Array[Float]]] = {
    val resp =
      try sendFollowingRedirects(
        java.net.URI.create(s"$endpoint/embeddings"), body)
      catch {
        case scala.util.control.NonFatal(e) =>
          return Left(Transient(new RuntimeException(s"http do: $e", e), None))
      }
    val code = resp.statusCode()
    if (code == 429)
      Left(Transient(new RuntimeException("embed: HTTP 429 (rate limited)"),
        parseRetryAfter(
          resp.headers().firstValue("Retry-After").orElse(""))))
    else if (code >= 500)
      Left(Transient(new RuntimeException(s"embed: HTTP $code"), None))
    else if (code >= 400) {
      val msg = Option(resp.body()).map(_.trim.take(4096)).getOrElse("")
      Left(Permanent(new RuntimeException(
        if (msg.isEmpty) s"embed: HTTP $code (non-retryable)"
        else s"embed: HTTP $code: $msg (non-retryable)")))
    } else if (code >= 300) {
      // a 3xx that survived redirect-following has no Location header —
      // a server misconfiguration, not a transient decode failure (Go's
      // client errors with "<code> response missing Location header")
      Left(Permanent(new RuntimeException(
        s"embed: HTTP $code redirect without Location (non-retryable)")))
    } else {
      try {
        val root = mapper.readTree(resp.body())
        val data = root.get("data")
        if (data == null || !data.isArray)
          return Left(Transient(
            new RuntimeException("decode response: missing data array"), None))
        val vecs = new Array[Array[Float]](want)
        val it = data.elements()
        while (it.hasNext) {
          val d = it.next()
          val idx = if (d.has("index")) d.get("index").asInt(-1) else -1
          if (idx < 0 || idx >= want)
            return Left(Permanent(new RuntimeException(
              s"embed: invalid index $idx (len=$want)")))
          val emb = d.get("embedding")
          if (emb == null || !emb.isArray || emb.size() != dimension)
            return Left(Permanent(new RuntimeException(
              s"embed: dimension mismatch: got " +
                s"${if (emb == null) 0 else emb.size()}, configured $dimension")))
          val arr = new Array[Float](dimension)
          var i = 0
          while (i < dimension) { arr(i) = emb.get(i).floatValue(); i += 1 }
          vecs(idx) = arr
        }
        var i = 0
        while (i < want) {
          if (vecs(i) == null)
            return Left(Permanent(new RuntimeException(
              s"embed: missing embedding at index $i")))
          i += 1
        }
        Right(vecs.toSeq)
      } catch {
        case scala.util.control.NonFatal(e) =>
          // body read/decode failures usually mean the connection
          // dropped mid-stream — transient (client.go:192-197)
          Left(Transient(new RuntimeException(s"decode response: $e", e), None))
      }
    }
  }
}

object HttpEmbedClient {
  private sealed trait EmbedError
  private final case class Transient(e: Throwable,
      retryAfterMs: Option[Long]) extends EmbedError
  private final case class Permanent(e: Throwable) extends EmbedError

  /** Retry-After per RFC 7231 §7.1.3 (client.go:232-265): non-negative
    * delta-seconds or an HTTP-date; both clamp to one hour (a misbehaving
    * server must not stall a worker); an already-passed date means "retry
    * now" (Some(0)); missing/unparseable → None (caller uses its default
    * backoff). Some(0) ≠ None — an explicit immediate-retry hint beats
    * the exponential backoff.
    */
  private[operators] def parseRetryAfter(v: String): Option[Long] = {
    val s = Option(v).map(_.trim).getOrElse("")
    if (s.isEmpty) return None
    val maxWaitMs = 3600L * 1000L
    s.toLongOption match {
      case Some(secs) if secs >= 0 => Some(math.min(secs * 1000L, maxWaitMs))
      case Some(_) => None
      case None =>
        try {
          val t = java.time.ZonedDateTime.parse(s,
            java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
          val deltaMs = java.time.Duration
            .between(java.time.ZonedDateTime.now(t.getZone), t).toMillis
          Some(math.max(0L, math.min(deltaMs, maxWaitMs)))
        } catch { case _: java.time.format.DateTimeParseException => None }
    }
  }
}
