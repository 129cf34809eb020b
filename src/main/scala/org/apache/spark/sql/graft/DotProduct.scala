package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, NullType, ShortType}

/** Codegen'd dot product over two numeric arrays — [[CosineSimilarity]]'s
  * single-accumulator sibling, extracted for the pair-scan hot paths
  * (knn graph, semantic-dup ε-ball) where the two norms are PER-VECTOR
  * quantities recomputed per PAIR by the fused cosine: hoisting
  * `sqrt(dot(v,v))` to one column per assignment row and scoring pairs as
  * `dot(a,b)/(na*nb)` drops the inner loop from three accumulators to one
  * (bit-identical result — same index-order fold, same `sqrt`/multiply/
  * divide sequence; the zero-norm→null rule rides in the caller's `when`).
  *
  * Semantics are bit-identical to the HOF formulation
  * (`aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)`): one double
  * accumulator folded in index order; null on null/absent input, length
  * mismatch, or any null element (zip_with pads the shorter side with
  * nulls → null product → null fold — same observable result); 0.0 on
  * empty arrays. No zero-norm special case — `dot(v,v)` of a zero vector
  * is 0.0, a value, unlike [[CosineSimilarity]]'s null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType, ArrayType)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
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
          s"dot_product requires array<numeric> inputs, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => DoubleType
  }

  override def nullable: Boolean = true

  @transient private lazy val getLeft: CosineSimilarity.Getter =
    CosineSimilarity.getterFor(elemType(left))
  @transient private lazy val getRight: CosineSimilarity.Getter =
    CosineSimilarity.getterFor(elemType(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      dot += getLeft.get(xs, i) * getRight.get(ys, i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
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
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += ${getter(left, a, i)} * ${getter(right, b, i)};
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
