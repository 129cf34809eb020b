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
  private val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_similarity expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs(0), exprs(1))
      }))

  /** Register the functions into an existing session's catalog. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
