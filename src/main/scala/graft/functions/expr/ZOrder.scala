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

  /** Hilbert-curve order (bits per coordinate): 24 bits covers any
    * pre-bucketed coordinate here; the key stays under 2^48. */
  val HilbertOrder = 24

  /** Hilbert distance of (x, y) on the 2^order × 2^order grid — the
    * classic quadrant-rotation walk (public-domain construction, e.g.
    * Wikipedia "Hilbert curve", converting xy→d). Unlike the Z curve,
    * consecutive Hilbert keys are always GRID NEIGHBORS — no Z-shaped
    * jumps — so box queries touch fewer boundary row groups (the curve
    * never teleports across the box edge). Coordinates are taken
    * modulo 2^order (pre-bucket first, as with interleave2). */
  def hilbert2(x0: Long, y0: Long): Long = {
    val mask = (1L << HilbertOrder) - 1L
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s: Long = 1L << (HilbertOrder - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (d→xy) — test-support for proving the bijection and
    * the neighbor-adjacency property; not used in any plan. */
  def hilbertInverse(d0: Long): (Long, Long) = {
    var t = d0
    var x = 0L
    var y = 0L
    var s = 1L
    while (s < (1L << HilbertOrder)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }
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

/** `(bigint, bigint) -> bigint` Hilbert key, fused and codegen'd —
  * registered as `graft_hilbert`. */
case class Hilbert2(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernels.hilbert2(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.ZOrderKernels.hilbert2($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
