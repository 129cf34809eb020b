package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for the library's custom Catalyst
  * pieces, so `spark.sql` users get them as first-class SQL functions:
  *
  *   spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  *
  * Two entry points for the two lifecycle moments:
  *   - `new GraftExtensions` via
  *     `.withExtensions(...)` / `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *     at session build time (the production path);
  *   - [[GraftExtensions.register]] for an already-running session
  *     (tests, notebooks).
  *
  * No custom Rule/Strategy is registered — SURVEY §4's conclusion holds:
  * built-ins + plan shaping cover the reference; the codegen'd
  * expression is the single Catalyst extension the engine needs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_similarity expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs(0), exprs(1))
      }),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, s"simhash64 expects 1 argument")
        SimHash64(exprs.head)
      }),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "minhash_signature(tokens, numHashes, shingleSize)")
        MinHashSignature(exprs.head,
          litInt(exprs(1), "numHashes"), litInt(exprs(2), "shingleSize"))
      }),
    ("simhash60_md5",
      new ExpressionInfo(classOf[SimHash60Md5].getName, "simhash60_md5"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash60_md5(tokens)")
        SimHash60Md5(exprs.head)
      }),
    ("winnow_fingerprints",
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "winnow_fingerprints(tokens, k, w)")
        WinnowFingerprints(exprs.head, litInt(exprs(1), "k"), litInt(exprs(2), "w"))
      }),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "word_shingles(tokens, n)")
        WordShingles(exprs.head, litInt(exprs(1), "n"), shortFallback = true)
      }),
    ("lang_id",
      new ExpressionInfo(classOf[LangId].getName, "lang_id"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "lang_id(tokens)")
        LangId(exprs.head)
      }),
    ("text_stats",
      new ExpressionInfo(classOf[TextStats].getName, "text_stats"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "text_stats(text)")
        TextStats(exprs.head)
      }),
    ("redact_pii",
      new ExpressionInfo(classOf[RedactPii].getName, "redact_pii"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "redact_pii(text)")
        RedactPii(exprs.head)
      }))

  /** Register the functions into an existing session's catalog. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
