package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Elementwise vector-sum state: one double per dimension, allocated
  * lazily at the first vector's length. O(dim) regardless of group
  * size. */
final class VecSumBuffer {
  var sums: Array[Double] = null

  def add(v: Array[Double]): Unit = {
    if (sums == null) sums = new Array[Double](v.length)
    require(v.length == sums.length,
      s"graft_vec_sum: inconsistent vector lengths (${v.length} vs ${sums.length})")
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
  }
}

/** `graft_vec_sum(array<float|double>) -> array<double>`: elementwise
  * sum as a `TypedImperativeAggregate` — THE scale-correct way to
  * aggregate embedding columns. The obvious formulation (posexplode →
  * groupBy(group, pos) → re-collect) shuffles rows×dim narrow rows
  * and then needs a second shuffle to reassemble arrays; this
  * aggregate keeps O(dim) state per group, combines map-side, and
  * moves exactly one dim-length array per (partition, group) through
  * the exchange. Group centroids over 100 TB of embeddings cost one
  * ordinary aggregation.
  */
case class VecSum(
    vecExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumBuffer] {

  private lazy val elemIsFloat: Boolean = vecExpr.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def children: Seq[Expression] = Seq(vecExpr)
  override def checkInputDataTypes(): TypeCheckResult = vecExpr.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> or array<double>, got ${other.simpleString}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_sum"

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buffer: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = vecExpr.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d =
        if (elemIsFloat) {
          val f = arr.toFloatArray()
          val out = new Array[Double](f.length)
          var i = 0
          while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
          out
        } else arr.toDoubleArray()
      buffer.add(d)
    }
    buffer
  }

  override def merge(buffer: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    if (other.sums != null) buffer.add(other.sums)
    buffer
  }

  override def eval(buffer: VecSumBuffer): Any =
    if (buffer.sums == null) null
    else new GenericArrayData(buffer.sums)

  override def serialize(buffer: VecSumBuffer): Array[Byte] = {
    val n = if (buffer.sums == null) 0 else buffer.sums.length
    val bb = ByteBuffer.allocate(4 + n * 8)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buffer.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new VecSumBuffer
    if (n > 0) {
      val arr = new Array[Double](n)
      var i = 0
      while (i < n) { arr(i) = bb.getDouble(); i += 1 }
      buf.sums = arr
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(vecExpr = newChildren(0))
}
