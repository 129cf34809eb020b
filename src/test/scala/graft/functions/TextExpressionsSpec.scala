package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit edges for the one-pass scalar text expressions
  * (org.apache.spark.sql.graft.TextExpressions). Their bulk correctness is
  * oracle-gated (text_lang_id / text_quality / dedup_simhash_md5 hash-match
  * DuckDB); these specs pin the null/empty/unicode edges and the exact
  * equivalence with the Column forms they replaced.
  */
class TextExpressionsSpec extends SparkTestBase {
  import org.apache.spark.sql.graft.TextExpressions._

  private def df(rows: String*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("text")
  }

  test("wordShingles ≡ array_distinct(shingles(tokens(text), n)) on edge inputs") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val inputs = df(
      "a b c d e f", // normal
      "a b", // below n → whole-run fallback
      "x", // single token
      "a a a a a", // duplicate shingles collapse
      "a,b;c d", // punctuation splits
      "  ", // zero tokens → NULL
      "Héllo wörld mixed CASE tokens here")
    val rows = inputs.select(
      org.apache.spark.sql.graft.HashingExpressions
        .wordShingles(TextFunctions.rawTokens(col("text")), 3).as("fast"),
      when(size(TextFunctions.tokens(col("text"))) > 0, array_distinct(
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)))
        .as("hof")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch: $r")
    }
  }

  test("wordShingles shortFallback=false nulls out docs below n tokens") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val rows = df("a b", "a b c").select(
      org.apache.spark.sql.graft.HashingExpressions.wordShingles(
        TextFunctions.rawTokens(col("text")), 3, shortFallback = false))
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getSeq[String](0) == Seq("a b c"))
  }

  test("textStats matches the four-walk Column form on edge inputs") {
    val inputs = Seq(
      "the cat and the hat",
      "",             // one empty token
      "  double  spaces  ",  // empty tokens from runs are KEPT (split -1)
      "¡hola! ¿qué tal?, bien...",
      "a a a a a",
      "solo")
    val d = df(inputs: _*)
    val viaExpr = d.select(
      textStats(col("text")).as("st")).select(
      col("st.n_tokens"), col("st.n_distinct"), col("st.n_stopwords"),
      col("st.n_punct")).collect()
    val toks = split(col("text"), " ", -1)
    val viaColumns = d.select(
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      TextFunctions.stopwordCount(toks).as("n_stopwords"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "\\p{P}", ""))).as("n_punct"))
      .collect()
    assert(viaExpr.toSeq == viaColumns.toSeq)
  }

  test("textStats is null-preserving") {
    val d = df("x").select(textStats(lit(null).cast("string")).as("st"))
    assert(d.collect().head.isNullAt(0))
  }

  test("langId matches langIdFromTokens incl. ties and zero hits") {
    val inputs = Seq(
      "the cat and the dog",            // en
      "el que la de y en",              // es
      "le la et les des une",           // fr
      "der die und das ist",            // de
      "la la la",                       // es/fr tie -> lexicographically last = fr
      "zzz qqq www",                    // no hits -> und
      "")
    val d = df(inputs: _*)
    val viaExpr = d.select(
      TextFunctions.langId(col("text")).as("l")).collect().map(_.getString(0))
    val viaHof = d.select(
      TextFunctions.langIdFromTokens(TextFunctions.tokens(col("text"))).as("l"))
      .collect().map(_.getString(0))
    assert(viaExpr.toSeq == viaHof.toSeq)
    assert(viaExpr(4) == "fr") // tie-break: lexicographically-last winner
    assert(viaExpr(5) == "und")
  }

  test("langId skips null/empty tokens from a raw split and nulls map to und") {
    val d = df("  the   and of to is  ") // raw split -> empty tokens
    assert(d.select(TextFunctions.langId(col("text"))).collect()
      .head.getString(0) == "en")
    assert(df("x").select(TextFunctions.langId(lit(null).cast("string")))
      .collect().head.getString(0) == "und")
  }

  test("simhash60Md5 equals the relational conv(md5) formulation") {
    val d = df("alpha beta gamma delta", "one two one two", "unico")
    val viaExpr = d.select(
      simhash60Md5(TextFunctions.rawTokens(col("text"))).as("s")).collect()
      .map(_.getLong(0))
    // relational twin: explode -> 60 per-bit votes -> recombine
    val ex = d.select(col("text"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("text"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h"))
    val votes = (0 until 60).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$j"))
    val sig = (0 until 60).map(j =>
      when(col(s"v$j") > 0, shiftleft(lit(1L), j)).otherwise(0L))
      .reduce(_ bitwiseOR _)
    val viaRelational = ex.groupBy(col("text")).agg(votes.head, votes.tail: _*)
      .select(col("text"), sig.as("simhash"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val texts = d.collect().map(_.getString(0))
    assert(texts.zip(viaExpr).forall { case (t, s) => viaRelational(t) == s })
  }

  test("simhash60Md5 yields null when no real tokens") {
    val d = df("", "   ")
    val got = d.select(
      simhash60Md5(TextFunctions.rawTokens(col("text"))).as("s")).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("simhash60Md5 stays within 60 bits") {
    val got = df("some text with several tokens here")
      .select(simhash60Md5(TextFunctions.rawTokens(col("text")))).collect()
      .head.getLong(0)
    assert(got >= 0L && got < (1L << 60))
  }
}
