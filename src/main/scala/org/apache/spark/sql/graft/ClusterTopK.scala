package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Within-cluster top-k neighbor scan over a COLLECTED member list, in ONE
  * expression evaluation per (cluster, salt) group.
  *
  * Why this exists: the cluster-bucketed knn graph
  * ([[graft.operators.Similarity.knnGraph]]) generated every within-cluster
  * directed pair as a JOIN ROW — ~1M pair rows at sf0.1 whose cost was
  * row machinery (join/explode/shuffle bookkeeping), not the dim-64
  * arithmetic (r15 measured: halving the arithmetic via symmetric pairs
  * LOST because Generate's row materialization dominates). This expression
  * receives one cluster's members (collect_list of (vec_id, embedding)
  * structs) and runs the quadratic scan as a compiled primitive loop,
  * emitting only each member's top-k candidate rows — the aggregate/window
  * downstream then ranks ≤ members·k rows instead of the full pair stream.
  *
  * Correctness is EXACT, not approximate: for any ranking cut k, a
  * neighbor in a vector's GLOBAL top-k (over the union of its clusters'
  * candidates, deduped or not) has fewer than k candidates ranked above it
  * globally — so also fewer than k within any single shared cluster, i.e.
  * the global top-k is contained in the union of per-cluster top-k sets,
  * and the downstream window reproduces the old ranks bit-for-bit.
  * (For MULTI-assigned relations this containment argument needs the
  * downstream pair dedup — [[graft.operators.Similarity.knnGraph]]'s
  * documented `dedupCandidates` contract, unchanged.)
  *
  * Pair arithmetic is bit-identical to the hoisted-norm pair cosine it
  * replaces (`dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b)))`, index-order
  * double folds — [[DotProduct]]'s exact semantics):
  *  - null embedding, null element, or length mismatch → null cosine;
  *  - a zero-norm side → null cosine (the explicit `when` guard);
  *  - NaN elements flow through arithmetic (NaN cosine) and rank HIGHEST,
  *    matching Spark's nan-safe double ordering in `desc`;
  *  - candidate ranking = (cosine desc NULLS LAST, neighbor_id asc) —
  *    exactly the downstream window's order, so the per-member cut keeps
  *    precisely the rows that could reach a window rank ≤ k;
  *  - a null vec_id participates in NOTHING (the old pair stage's
  *    `vec_id =!= neighbor_id` filter dropped those rows both ways).
  *
  * `salt`/`nSalt` split each cluster's SOURCE side over nSalt groups
  * (member m is scored as a source iff floorMod(vec_id, nSalt) == salt,
  * while every member is a candidate) — the parallelism lever for
  * cluster-count < core-count regimes: the caller explodes the assignment
  * nSalt ways before the collect, each group holds the full member list,
  * and each source is scored in exactly ONE group, so the union of group
  * outputs is salt-invariant by construction.
  *
  * Memory: one cluster's decoded members per evaluation —
  * members·(dim·8 + ~32) bytes. Bounded by the same contract that bounds
  * the old pair stage's quadratic fan-out: nList grows with the corpus so
  * the mean cluster size stays flat.
  */
case class ClusterTopK(left: Expression, right: Expression, k: Int,
    nSalt: Int) extends BinaryExpression {
  require(k >= 1, s"k ($k) must be >= 1")
  require(nSalt >= 1, s"nSalt ($nSalt) must be >= 1")

  override def dataType: DataType = ClusterTopK.outType

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
        "cluster_top_k requires (array<struct<long, array<float|double>>>, " +
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
    ClusterTopK.topKNeighbors(members.asInstanceOf[ArrayData],
      salt.asInstanceOf[Int], k, nSalt, isFloatElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, s) =>
      s"${ev.value} = org.apache.spark.sql.graft.ClusterTopK.topKNeighbors(" +
        s"$m, $s, $k, $nSalt, $isFloatElems);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ClusterTopK =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cluster_top_k"
}

object ClusterTopK {
  /** Column-API entry point. */
  def apply(members: Column, salt: Column, k: Int, nSalt: Int): Column =
    ExpressionUtils.column(ClusterTopK(ExpressionUtils.expression(members),
      ExpressionUtils.expression(salt), k, nSalt))

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = true))),
    containsNull = false)

  /** Spark's nan-safe double comparison (NaN > everything incl. +Inf,
    * NaN == NaN, -0.0 == 0.0) — the ordering `desc` applies to non-null
    * cosines AND the semantics of the `>` binary comparison (verified:
    * `double('NaN') > 0.5` is TRUE in Spark SQL); replicated so ranks
    * and threshold cuts cannot drift from the built-in operators.
    */
  private[graft] def nanSafeCompare(x: Double, y: Double): Int = {
    val xN = java.lang.Double.isNaN(x); val yN = java.lang.Double.isNaN(y)
    if (x < y || (yN && !xN)) -1
    else if (x > y || (xN && !yN)) 1
    else 0
  }

  /** One cluster's decoded members: ids, per-member double vectors,
    * norm = sqrt(dot(v,v)), and the two null classes the pair cosine
    * distinguishes (null id; null embedding / null element). Shared by
    * every within-cluster scan expression ([[ClusterTopK]],
    * [[ClusterEpsAgg]]) so the pair-cosine edge semantics have ONE
    * decode.
    */
  private[graft] final class Decoded(val ids: Array[Long],
      val idNull: Array[Boolean], val vecs: Array[Array[Double]],
      val dotNull: Array[Boolean], val norm: Array[Double]) {
    def size: Int = ids.length
  }

  private[graft] def decode(members: ArrayData, isFloat: Boolean): Decoded = {
    val m = members.numElements()
    val ids = new Array[Long](m)
    val idNull = new Array[Boolean](m)
    val vecs = new Array[Array[Double]](m)
    val dotNull = new Array[Boolean](m) // null emb or null element
    val norm = new Array[Double](m) // sqrt(dot(v,v)); NaN flows through
    var i = 0
    while (i < m) {
      val row = members.getStruct(i, 2)
      if (row.isNullAt(0)) idNull(i) = true
      else ids(i) = row.getLong(0)
      if (row.isNullAt(1)) dotNull(i) = true
      else {
        val a = row.getArray(1)
        val n = a.numElements()
        val xs = new Array[Double](n)
        var na = 0.0
        var j = 0
        while (j < n && !dotNull(i)) {
          if (a.isNullAt(j)) dotNull(i) = true
          else {
            val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
            xs(j) = x; na += x * x; j += 1
          }
        }
        vecs(i) = xs
        norm(i) = math.sqrt(na)
      }
      i += 1
    }
    new Decoded(ids, idNull, vecs, dotNull, norm)
  }

  /** One (cluster, salt) group's scan. Everything inside is plain
    * JIT-compiled primitive loops over pre-decoded members; called once
    * per group from generated code (or interpreted eval).
    */
  def topKNeighbors(members: ArrayData, salt: Int, k: Int, nSalt: Int,
      isFloat: Boolean): ArrayData = {
    val d = decode(members, isFloat)
    val m = d.size
    val ids = d.ids; val idNull = d.idNull; val vecs = d.vecs
    val dotNull = d.dotNull; val norm = d.norm
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    // per-source top-k slots, reused across sources
    val bestNull = new Array[Boolean](k)
    val bestS = new Array[Double](k)
    val bestId = new Array[Long](k)
    var s0 = 0
    while (s0 < m) {
      if (!idNull(s0) &&
        (nSalt <= 1 || java.lang.Math.floorMod(ids(s0), nSalt.toLong) == salt)) {
        var filled = 0
        val xs = vecs(s0)
        val dims = if (xs == null) -1 else xs.length
        var c = 0
        while (c < m) {
          if (c != s0 && !idNull(c) && ids(c) != ids(s0)) {
            // cosine with the EXACT pair rules (see class doc)
            val ys = vecs(c)
            val isNull = dotNull(s0) || dotNull(c) ||
              ys == null || dims < 0 || ys.length != dims ||
              norm(s0) == 0.0 || norm(c) == 0.0
            var cos = 0.0
            if (!isNull) {
              var dot = 0.0; var j = 0
              while (j < dims) { dot += xs(j) * ys(j); j += 1 }
              cos = dot / (norm(s0) * norm(c))
            }
            // slot j strictly better than the candidate ⇔ candidate
            // keeps scanning past it: (null last, cosine desc
            // nan-first, id asc)
            @inline def slotBeats(j: Int): Boolean =
              if (bestNull(j) != isNull) !bestNull(j) // non-null side wins
              else if (!isNull) {
                val cmpS = nanSafeCompare(bestS(j), cos)
                cmpS > 0 || (cmpS == 0 && bestId(j) < ids(c))
              } else bestId(j) < ids(c)
            // quick reject: with the slots full, almost every candidate
            // loses to the CURRENT WORST slot — one compare instead of
            // a k-deep insertion scan (top-5 of a 2500-member cluster
            // rejects ~99.8% of candidates here)
            if (filled == k && slotBeats(k - 1)) { /* rejected */ }
            else {
            var j = 0
            var stop = false
            while (j < filled && !stop) {
              if (slotBeats(j)) j += 1 else stop = true
            }
            if (j < k) {
              var t = math.min(filled, k - 1)
              while (t > j) {
                bestNull(t) = bestNull(t - 1); bestS(t) = bestS(t - 1)
                bestId(t) = bestId(t - 1); t -= 1
              }
              bestNull(j) = isNull; bestS(j) = cos; bestId(j) = ids(c)
              if (filled < k) filled += 1
            }
            }
          }
          c += 1
        }
        var r = 0
        while (r < filled) {
          out += new GenericInternalRow(Array[Any](ids(s0), bestId(r),
            if (bestNull(r)) null else java.lang.Double.valueOf(bestS(r))))
          r += 1
        }
      }
      s0 += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
