package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Within-cluster ε-ball PARTIAL AGGREGATE over a collected member list,
  * in one expression evaluation per (cluster, salt) group — the SemDeDup
  * pair stage ([[graft.operators.Similarity.semanticDupes]]) without the
  * quadratic pair-row machinery, [[ClusterTopK]]'s sibling.
  *
  * For each member d (the potential duplicate) it scans every LOWER-id
  * member k of the group and, over the qualifying pairs
  * (`cosine(k, d) > eps`, nan-safe like Spark's `>`), emits ONE row
  * (dup_id, kept_id = min qualifying k, cosine = max qualifying cosine)
  * — exactly the per-cluster partial of the downstream
  * `groupBy(dup_id).agg(min(cluster), min(kept_id), max(cosine))`,
  * which is decomposable because min/max are associative and the pair
  * cosine for a given (k, d) is identical in every shared cluster (same
  * embeddings, same fold). Output is bounded by the member count, never
  * the pair count.
  *
  * Pair arithmetic is bit-identical to the hoisted-norm pair cosine the
  * join stage evaluated (see [[ClusterTopK]]'s class doc for the full
  * rules): a null cosine (null embedding/element, length mismatch,
  * zero norm) never qualifies — `NULL > eps` is NULL, filtered, in the
  * replaced pipeline; a NaN cosine ALWAYS qualifies (Spark's nan-safe
  * `>`) and wins the max (Spark's nan-safe greatest ordering); a null
  * id participates in nothing (`kept_id < dup_id` was null-rejecting).
  *
  * `salt`/`nSalt` split the DUP side over nSalt groups (member d is
  * scanned as a dup iff floorMod(dup_id, nSalt) == salt, every member
  * is a candidate keeper) — each (cluster, dup) partial lands in
  * exactly one salt group, so the union over salts is the unsalted
  * per-cluster partial set by construction.
  */
case class ClusterEpsAgg(left: Expression, right: Expression, eps: Double,
    nSalt: Int) extends BinaryExpression {
  require(nSalt >= 1, s"nSalt ($nSalt) must be >= 1")

  override def dataType: DataType = ClusterEpsAgg.outType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(FloatType | DoubleType, _), _, _))), _) => true
      case _ => false
    }
    if (ok && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "cluster_eps_agg requires (array<struct<long, array<float|double>>>, " +
          s"int), got ${left.dataType.catalogString} and " +
          right.dataType.catalogString)
  }

  private def isFloatElems: Boolean = left.dataType match {
    case ArrayType(StructType(fields), _) => fields(1).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    case _ => false
  }

  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(members: Any, salt: Any): Any =
    ClusterEpsAgg.epsAgg(members.asInstanceOf[ArrayData],
      salt.asInstanceOf[Int], eps, nSalt, isFloatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, s) =>
      s"${ev.value} = org.apache.spark.sql.graft.ClusterEpsAgg.epsAgg(" +
        s"$m, $s, $eps, $nSalt, $isFloatElems);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ClusterEpsAgg =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cluster_eps_agg"
}

object ClusterEpsAgg {
  /** Column-API entry point. */
  def apply(members: Column, salt: Column, eps: Double, nSalt: Int): Column =
    ExpressionUtils.column(ClusterEpsAgg(ExpressionUtils.expression(members),
      ExpressionUtils.expression(salt), eps, nSalt))

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("dup_id", LongType, nullable = false),
    StructField("kept_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)

  /** One (cluster, salt) group's ε-ball scan: plain JIT-compiled
    * primitive loops over the shared pre-decoded members.
    */
  def epsAgg(members: ArrayData, salt: Int, eps: Double, nSalt: Int,
      isFloat: Boolean): ArrayData = {
    val dec = ClusterTopK.decode(members, isFloat)
    val m = dec.size
    val ids = dec.ids; val idNull = dec.idNull; val vecs = dec.vecs
    val dotNull = dec.dotNull; val norm = dec.norm
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var d = 0
    while (d < m) {
      if (!idNull(d) &&
        (nSalt <= 1 || java.lang.Math.floorMod(ids(d), nSalt.toLong) == salt)) {
        val xs = vecs(d)
        val dims = if (xs == null) -1 else xs.length
        var any = false
        var keptMin = Long.MaxValue
        var cosMax = Double.NegativeInfinity
        var cosMaxNaN = false
        var k = 0
        while (k < m) {
          // strict id order replays the old `kept_id < dup_id` filter
          // (a duplicated id never pairs with itself — `<` is strict)
          if (!idNull(k) && ids(k) < ids(d)) {
            val ys = vecs(k)
            val isNull = dotNull(d) || dotNull(k) ||
              ys == null || dims < 0 || ys.length != dims ||
              norm(d) == 0.0 || norm(k) == 0.0
            if (!isNull) {
              var dot = 0.0; var j = 0
              while (j < dims) { dot += xs(j) * ys(j); j += 1 }
              val cos = dot / (norm(d) * norm(k))
              // Spark's `>` on doubles is nan-safe (NaN qualifies)
              if (ClusterTopK.nanSafeCompare(cos, eps) > 0) {
                any = true
                if (ids(k) < keptMin) keptMin = ids(k)
                if (cosMaxNaN) () // NaN already won (nan-safe max)
                else if (java.lang.Double.isNaN(cos)) cosMaxNaN = true
                else if (cos > cosMax) cosMax = cos
              }
            }
          }
          k += 1
        }
        if (any)
          out += new GenericInternalRow(Array[Any](ids(d), keptMin,
            if (cosMaxNaN) Double.NaN else cosMax))
      }
      d += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
