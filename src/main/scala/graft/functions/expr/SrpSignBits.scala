package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Signed-random-projection sign bits, fused (L5/L7 building block).
  *
  * `array<float|double> -> bigint`: bit i of the result is the sign of
  * ⟨v, plane_i⟩ for up to 64 deterministic ±1 hyperplanes. The
  * hyperplane matrix is derived on the fly from the splitmix64 chain
  * (identical to Similarity.hyperplanes), so no plane literals ship in
  * the plan and every executor agrees. Replaces numPlanes separate
  * cosine expressions — one pass over the vector per plane inside a
  * single codegen'd call instead of numPlanes interpreted column
  * trees.
  */
case class SrpSignBits(child: Expression, numPlanes: Int)
    extends UnaryExpression {
  require(numPlanes > 0 && numPlanes <= 64, "numPlanes in (0,64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.srpSignBits(input.asInstanceOf[ArrayData], numPlanes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SignatureKernels.srpSignBits($c, $numPlanes, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
