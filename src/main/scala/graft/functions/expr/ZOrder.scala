package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton-code (Z-order) interleaving kernel.
  *
  * `interleave2` maps two 32-bit coordinates onto one 64-bit key whose
  * bit pattern alternates between the inputs, so points close in BOTH
  * dimensions land close on the key line. Sorting a table by this key
  * gives every row group a tight [min,max] envelope in each source
  * column simultaneously — the layout trick that lets parquet footer
  * stats prune multi-dimensional box predicates, where a single-column
  * sort only ever prunes its one column.
  *
  * Bit spreading uses the standard public-domain magic-mask doubling
  * construction ("Interleave bits by Binary Magic Numbers", Bit
  * Twiddling Hacks); shared by interpreted eval and codegen.
  */
object ZOrderKernels {

  /** Spread the low 32 bits of `x` to the even bit positions. */
  def spread(x0: Long): Long = {
    var x = x0 & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Z-order key: `a` on even bits, `b` on odd bits. Inputs are taken
    * modulo 2^32 (coordinates must be pre-bucketed into 32 bits). */
  def interleave2(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** `(bigint, bigint) -> bigint` Morton key, fused and codegen'd —
  * registered as `graft_zorder`. */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernels.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.ZOrderKernels.interleave2($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
