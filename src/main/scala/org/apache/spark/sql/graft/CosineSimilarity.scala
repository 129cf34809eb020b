package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, NullType, ShortType}

/** Codegen'd cosine similarity over two numeric arrays (float/double for
  * embeddings; byte/short/int/long for quantized codes) — the one
  * custom Catalyst `Expression` the rebuild needs (SURVEY §4: every other
  * operator is built-ins + plan shaping; the higher-order-function form of
  * this arithmetic runs interpreted with per-element boxing).
  *
  * Semantics are bit-identical to the HOF formulation
  * (`dot(a,b)/(norm(a)*norm(b))`): three double accumulators
  * (dot, ‖a‖², ‖b‖²) each folded in index order, result
  * dot / (√‖a‖²·√‖b‖²); null on null/absent input, length mismatch, or any
  * null element — matching `zip_with`+`aggregate` null propagation. One
  * deliberate divergence: a zero-norm side yields null rather than the
  * IEEE NaN — NaN sorts as the largest double and would rank an all-zero
  * embedding first in every descending-score KNN.
  *
  * The generated code is a single primitive loop: no ArrayData boxing, no
  * lambda dispatch, stays inside WholeStageCodegen. ~10× over the HOF form
  * on 64-dim vectors (measured in BenchCosineSpec-style microruns).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType, ArrayType)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // integer element types serve the quantized (ADC) scan: int8 codes
    // widen per-element to double exactly (|code| ≤ 127 ≪ 2⁵³), the same
    // c.cast("double") the HOF formulation performs. Bare NULL and
    // array<null> literals are accepted (always-null result) to match
    // the zip_with+aggregate form's null propagation.
    def elem(t: DataType): Option[DataType] = t match {
      case ArrayType(e @ (FloatType | DoubleType | ByteType | ShortType |
          IntegerType | LongType), _) => Some(e)
      case NullType => Some(DoubleType)
      case ArrayType(NullType, _) => Some(DoubleType)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity requires array<numeric> inputs, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  // DoubleType stand-in for NULL/array<null> children: their rows are
  // always null, so the element loop never executes — but codegen still
  // instantiates a getter for it
  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => DoubleType
  }

  override def nullable: Boolean = true

  // per-side getter chosen ONCE per expression instance, not
  // re-pattern-matched twice per element in the hot loop (the
  // interpreted path is exactly the boxing-sensitive one). A sealed
  // class with a primitive-signature method, NOT a Function2 lambda —
  // (ArrayData, Int) => Double has no specialized variant on 2.13, so a
  // lambda would box the index and the result on every element access
  @transient private lazy val getLeft: CosineSimilarity.Getter =
    CosineSimilarity.getterFor(elemType(left))
  @transient private lazy val getRight: CosineSimilarity.Getter =
    CosineSimilarity.getterFor(elemType(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = getLeft.get(xs, i)
      val y = getRight.get(ys, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // zero-norm → null, not NaN: NaN sorts as the LARGEST double, so an
    // all-zero embedding would rank first in every descending-score KNN
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // a bare NULL child has no ArrayData-typed codegen value — the
    // expression is constant null, so emit exactly that
    if (left.dataType == NullType || right.dataType == NullType)
      return ExprCode.forNullValue(dataType)
    def getter(e: Expression, arr: String, i: String): String = elemType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case ByteType => s"(double) $arr.getByte($i)"
      case ShortType => s"(double) $arr.getShort($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType => s"(double) $arr.getLong($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      // x/y via freshName like every other local: a bare `x` could
      // collide with an enclosing generated scope and fail compilation
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = ${getter(left, a, i)};
         |    final double $y = ${getter(right, b, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |    }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineSimilarity {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Primitive-signature element accessor (monomorphic per side). */
  private[graft] sealed abstract class Getter {
    def get(a: ArrayData, i: Int): Double
  }
  private[graft] def getterFor(t: DataType): Getter = t match {
    case FloatType => new Getter { def get(a: ArrayData, i: Int) = a.getFloat(i).toDouble }
    case ByteType => new Getter { def get(a: ArrayData, i: Int) = a.getByte(i).toDouble }
    case ShortType => new Getter { def get(a: ArrayData, i: Int) = a.getShort(i).toDouble }
    case IntegerType => new Getter { def get(a: ArrayData, i: Int) = a.getInt(i).toDouble }
    case LongType => new Getter { def get(a: ArrayData, i: Int) = a.getLong(i).toDouble }
    case _ => new Getter { def get(a: ArrayData, i: Int) = a.getDouble(i) }
  }
}
