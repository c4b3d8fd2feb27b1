package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector distances. These stay inside
  * whole-stage codegen (the generated Java calls the static kernel
  * forwarders in [[DistanceKernels]]), avoiding the per-row boxing an
  * `Array[Float]` Scala UDF would incur — the main perf lever identified in
  * SURVEY.md §7.3 for the 100 TB k-NN scan path.
  */
private[functions] trait VecBinaryChecks { self: BinaryExpression =>
  protected def expectedElem: DataType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if l == expectedElem && r == expectedElem =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"${self.prettyName} expects two array<${expectedElem.simpleString}> arguments, got " +
            s"${l.simpleString} and ${r.simpleString}")
    }
}

/** Squared L2 distance between two array<float> vectors (double result). */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with VecBinaryChecks {
  protected def expectedElem: DataType = FloatType
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2sq"
  override def nullSafeEval(a: Any, b: Any): Any =
    DistanceKernels.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DistanceKernels.l2sq($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Inner product between two array<float> vectors (double result). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with VecBinaryChecks {
  protected def expectedElem: DataType = FloatType
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    DistanceKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DistanceKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity between two array<float> vectors (double result). */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression with VecBinaryChecks {
  protected def expectedElem: DataType = FloatType
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cos"
  override def nullSafeEval(a: Any, b: Any): Any =
    DistanceKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DistanceKernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of one array<float> vector. */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_norm expects array<float>, got ${t.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    DistanceKernels.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.DistanceKernels.norm($a)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming (popcount) distance over packed binary codes (array<long>). */
case class VecHamming(left: Expression, right: Expression)
    extends BinaryExpression with VecBinaryChecks {
  protected def expectedElem: DataType = LongType
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_hamming"
  override def nullSafeEval(a: Any, b: Any): Any =
    DistanceKernels.hammingLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DistanceKernels.hammingLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
