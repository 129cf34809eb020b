package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline: tokenization,
  * quality scoring, language ID, fingerprinting, shingling. All are
  * composed from codegen'd builtins (`split`/`transform`/`aggregate`/
  * `xxhash64`) so they stay inside WholeStageCodegen — no UDFs on the hot
  * path. FTS-tokenizer fidelity notes: the reference's FTS5 `unicode61
  * remove_diacritics 1` (reference: internal/store/schema_sqlite.sql:13) is
  * approximated by lowercase + non-alphanumeric splits; diacritic folding
  * is an ETL-time UDF ([[foldDiacritics]]), never query-time.
  */
object TextFunctions {

  /** Whitespace tokens (driver `documents.text` is space-separated). */
  def wsTokens(text: Column): Column = split(text, " ")

  /** unicode61-ish tokens: lowercase, split on runs of non-alphanumerics,
    * drop empties. Query-time safe (pure builtins).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** [[tokens]] without the empty-drop pass — `filter` is an interpreted
    * higher-order function, so hot paths whose consumer skips empty
    * tokens itself (the hashing expressions) use this to keep the whole
    * tokenize stage codegen'd. Token sequence seen by such consumers is
    * identical to [[tokens]].
    */
  def rawTokens(text: Column): Column = split(lower(text), "[^\\p{L}\\p{N}]+")

  /** Driver-side diacritic folding (NFD strip) for QUERY literals: FTS5's
    * unicode61 tokenizer folds both the indexed text and the query term,
    * so a search for "café" must compare as "cafe" against the folded
    * token column — fold the literal once on the driver, never per row.
    */
  def foldDiacriticsLocal(s: String): String =
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", "")

  /** ETL-time diacritic folding (NFD strip) — the one place a UDF is
    * justified: runs once per document at ingest, not per query.
    */
  val foldDiacritics: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) => foldDiacriticsLocal(s) }

  def tokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish sub-word count: words + digit runs + punctuation marks,
    * approximating tokenizer inflation on code/numbers.
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?<=\\p{P})|(?=\\p{P})|\\s+"), t => length(t) > 0))

  private val stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords: _*)))

  def distinctRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "\\p{P}", "")))
      .cast("double") / length(text).cast("double")

  /** Composite quality score ∈ [0,1]: favors mid-length docs with lexical
    * diversity, some stopwords (natural prose), low punctuation density —
    * the usual pretraining heuristics (C4/Gopher-style rules). Routed
    * through the one-pass [[textStats]] expression; arithmetic is
    * bit-identical to [[qualityScoreFromTokens]] (same double ops in the
    * same order over the same integer counts).
    */
  def qualityScore(text: Column): Column =
    qualityScoreFromStats(text, textStats(text))

  /** One-pass whitespace-token statistics
    * struct(n_tokens, n_distinct, n_stopwords, n_punct) — the scalar
    * expression replacing four interpreted array walks
    * ([[org.apache.spark.sql.graft.TextStats]]).
    */
  def textStats(text: Column): Column =
    org.apache.spark.sql.graft.TextExpressions.textStats(text)

  /** [[qualityScore]] over a pre-projected [[textStats]] struct. The four
    * sub-scores reproduce [[qualityScoreFromTokens]]'s arithmetic exactly:
    * counts are the same integers, and every division/multiply/round
    * happens in the same order.
    */
  def qualityScoreFromStats(text: Column, st: Column): Column = {
    val n = st.getField("n_tokens").cast("double")
    val lenScore = least(n / lit(50.0), lit(1.0))
    val divScore = st.getField("n_distinct").cast("double") / n
    val stopScore =
      least(st.getField("n_stopwords").cast("double") / n * 5.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(
      st.getField("n_punct").cast("double") / length(text).cast("double") * 4.0,
      lit(1.0))
    round((lenScore + divScore + stopScore + punctPenalty) / 4.0, 6)
  }

  /** [[qualityScore]] over an already-projected whitespace-token array. */
  def qualityScoreFromTokens(text: Column, toks: Column): Column = {
    val n = size(toks).cast("double")
    val lenScore = least(n / lit(50.0), lit(1.0))
    val divScore = distinctRatio(toks)
    val stopScore = least(stopwordCount(toks).cast("double") / n * 5.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    round((lenScore + divScore + stopScore + punctPenalty) / 4.0, 6)
  }

  /** Hashed-feature linear classifier score — the fastText-style quality
    * classifier of the CCNet/GPT-3-era curation stack: hash each token
    * into a `dim`-bucket weight table, mean-pool the weights, squash
    * through a sigmoid. The weight table here is a deterministic
    * placeholder derived from the bucket id ((b % 201 − 100) / 100 ∈
    * [−1, 1]) — a deployment substitutes trained weights as a broadcast
    * literal lookup; the hashing-trick feature map, pooling, and link
    * function are the real path. One scan, no shuffle; md5 bucketing
    * reproduces in any engine (same idiom as [[graft.operators.Sampling
    * .hashBucket]]). Empty token array → mean 0 → score 0.5.
    */
  def classifierScore(toks: Column, dim: Int = 1024): Column = {
    val weight = (t: Column) =>
      (((conv(substring(md5(t), 1, 15), 16, 10).cast("long") % dim) % 201)
        .cast("double") - 100.0) / 100.0
    val sum = aggregate(transform(toks, weight), lit(0.0), (a, x) => a + x)
    val mean = when(size(toks) > 0, sum / size(toks).cast("double"))
      .otherwise(lit(0.0))
    lit(1.0) / (lit(1.0) + exp(-mean))
  }

  /** n-gram character/word-profile language ID: stopword-profile scoring,
    * winner = max hits with lexicographically-last tie-break, zero hits →
    * "und". One pass over the raw codegen'd `split` via the
    * [[org.apache.spark.sql.graft.LangId]] scalar expression (the Column
    * form, [[langIdFromTokens]], re-walks the token array once per
    * profile in interpreted `filter()` lambdas — measured 4× slower).
    * Null text → "und", matching the Column form.
    */
  def langId(text: Column): Column =
    coalesce(org.apache.spark.sql.graft.TextExpressions.langId(rawTokens(text)),
      lit("und"))

  /** [[langId]] over an already-projected token array. */
  def langIdFromTokens(toks: Column): Column = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se"),
      "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
      "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"))
    val scored = profiles.map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Content fingerprint: md5 of the lowercased text (exact-dup key). */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** 64-bit rolling document fingerprint: hash-chained fold over tokens
    * (`acc ← xxhash64(acc, token)`) — order-sensitive, deterministic, and
    * a numeric alternative to md5. Chaining via the hash function instead
    * of polynomial multiply keeps it overflow-free under ANSI mode
    * (multiplication wraparound throws there).
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(toks, lit(1125899906842597L), (acc, t) => xxhash64(acc, t))

  /** Word-level shingles of size n: ["a b c", "b c d", ...]. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Adjacent word pairs: ["a b", "b c", ...]; empty below 2 tokens.
    * zip_with over two slices of the SAME projected array — cheaper than
    * the index-transform shingle construction for the n=2 case.
    */
  def bigrams(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))

  /** Adjacent word triples: ["a b c", "b c d", ...]; empty below 3
    * tokens. Same two-slice zip_with shape as [[bigrams]], folded once
    * more — three aligned slices of one projected array, no index math.
    */
  def trigrams(toks: Column): Column =
    when(size(toks) < 3, array().cast("array<string>"))
      .otherwise(zip_with(
        zip_with(
          slice(toks, lit(1), size(toks) - 2),
          slice(toks, lit(2), size(toks) - 2),
          (a, b) => concat(a, lit(" "), b)),
        slice(toks, lit(3), size(toks) - 2),
        (ab, c) => concat(ab, lit(" "), c)))

  /** Duplicate-fraction repetition signals (Gopher-style repetition
    * filters): 1 − distinct/total over words and over adjacent bigrams.
    * High values flag boilerplate/spam for the curation gate.
    */
  def dupWordFraction(toks: Column): Column =
    // empty AND NULL docs both score 0.0: 0/0 would yield NULL, and
    // size(NULL) is NULL too (not < 1, sizeOfNull=false default) — either
    // way a NULL fraction silently drops the doc from a
    // `frac <= threshold` curation gate instead of scoring it
    when(coalesce(size(toks), lit(0)) < 1, lit(0.0))
      .otherwise(round(lit(1.0) -
        size(array_distinct(toks)).cast("double") / size(toks).cast("double"),
        6))

  def dupBigramFraction(toks: Column): Column = {
    val b = bigrams(toks)
    when(coalesce(size(b), lit(0)) < 1, lit(0.0))
      .otherwise(round(lit(1.0) -
        size(array_distinct(b)).cast("double") / size(b).cast("double"), 6))
  }

  // PII patterns restricted to syntax RE2 engines also accept (no
  // lookaround, no \b) — the redaction recipe must be replayable outside
  // the JVM, same portability contract as Sampling.hashBucket
  private[graft] val emailPattern =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // IPv4 with range-checked octets and non-digit/non-dot context on both
  // sides, so '1.2.3.4.5' and '999.999.999.999' don't (half-)match.
  // Without lookaround the context chars are consumed: they're captured
  // ($1/$3) and restored by the replacement, and redaction runs TWO
  // passes because the first pass eats the char separating adjacent IPs
  // ("1.2.3.4 5.6.7.8" → second IP only matches once the first is gone).
  // Version-like strings in prose ("released 10.0.3.7") still redact —
  // indistinguishable from an IP without semantic context.
  private[graft] val ipv4Octet =
    "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  private[graft] val ipv4Pattern =
    s"(^|[^0-9.])($ipv4Octet(?:\\.$ipv4Octet){3})([^0-9.]|$$)"
  private[graft] val ipv4Replacement = "$1<IP>$3"

  /** PII redaction for training corpora: emails → `<EMAIL>`, IPv4 →
    * `<IP>`. Email pass runs first so an address's host part is never
    * half-eaten by the IP pass. Pure regexp_replace — codegen'd,
    * no UDF.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, emailPattern, "<EMAIL>")
    regexp_replace(
      regexp_replace(noEmail, ipv4Pattern, ipv4Replacement),
      ipv4Pattern, ipv4Replacement)
  }

  /** [[redactPii]]'s hot-path twin: ONE alternation scan via the
    * [[org.apache.spark.sql.graft.RedactPii]] scalar expression instead
    * of three full regex traversals (measured ~2.5× on the corpus pass).
    * Output is byte-identical — equivalence argument in the expression's
    * Scaladoc, gated by the `text_pii_redact` md5-fingerprint oracle and
    * the property spec. Use [[redactPii]] where the recipe must stay
    * RE2-replayable outside the JVM (it is the documented portable form).
    */
  def redactPiiFast(text: Column): Column =
    org.apache.spark.sql.graft.TextExpressions.redactPii(text)

  def piiCounts(text: Column): (Column, Column) = {
    val noEmail = regexp_replace(text, emailPattern, "<EMAIL>")
    val afterPass1 = regexp_replace(noEmail, ipv4Pattern, ipv4Replacement)
    (regexp_count(text, lit(emailPattern)),
      // adjacent-IP chains surface across the two passes; count both
      regexp_count(noEmail, lit(ipv4Pattern)) +
        regexp_count(afterPass1, lit(ipv4Pattern)))
  }

  /** Occurrences of a literal marker in `c` by length arithmetic — a
    * single codegen'd string pass, no regex. */
  def markerCount(c: Column, marker: String): Column =
    (length(c) - length(replace(c, lit(marker), lit("")))) / marker.length

  /** URL canonicalization for URL-level dedup (the CCNet/RefinedWeb
    * pre-pass that collapses scheme/www/tracking-param variants of the
    * same page before any content hashing): lowercase, drop scheme and
    * leading www., drop utm_* tracking params, drop a then-dangling
    * '?'/'&' tail and trailing slashes. Pure regexp_replace chain —
    * codegen'd, RE2-portable (no lookaround), replayable by any engine.
    */
  def canonicalizeUrl(url: Column): Column = {
    val low = lower(url)
    val noScheme = regexp_replace(low, "^https?://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    // anchor to a real query separator so a param merely NAMED *utm_x or
    // utm_ text inside a path segment survives; the (...)+ chain strips
    // consecutive utm params in one match (the separator is consumed, so
    // an unchained form would skip every second one)
    val noUtm = regexp_replace(noWww, "([?&])(utm_[a-z]+=[^&]*&?)+", "$1")
    val noTail = regexp_replace(noUtm, "[?&]+$", "")
    regexp_replace(noTail, "/+$", "")
  }

  /** Redaction counts read off the ALREADY-redacted text: occurrences of
    * `<EMAIL>` / `<IP>` markers. Equals [[piiCounts]] whenever the source
    * text contains neither literal marker (any corpus that itself embeds
    * `<EMAIL>` would inflate the count — callers needing exactness under
    * that input use [[piiCounts]] and pay its three extra regex passes).
    */
  def piiMarkerCounts(redacted: Column): (Column, Column) =
    (markerCount(redacted, "<EMAIL>"), markerCount(redacted, "<IP>"))
}
