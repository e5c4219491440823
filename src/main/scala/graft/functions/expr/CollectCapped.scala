package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Size-capped id list: collects at most `cap` ids while counting all
  * of them. The moment the true count exceeds `cap` the list is
  * discarded and only the count keeps accumulating — so the
  * aggregation buffer is bounded at `cap` longs no matter how
  * degenerate the group is.
  */
final class CappedListBuffer(val cap: Int) {
  val ids = new scala.collection.mutable.ArrayBuffer[Long]()
  var total: Long = 0L
  def overflowed: Boolean = total > cap

  def add(id: Long): Unit = {
    total += 1
    if (total <= cap) ids += id
    else if (ids.nonEmpty) ids.clear() // free eagerly on overflow
  }

  def mergeFrom(other: CappedListBuffer): Unit = {
    total += other.total
    if (total <= cap) ids ++= other.ids
    else if (ids.nonEmpty) ids.clear()
  }
}

/** `graft_collect_capped(id, cap) -> struct<ids: array<bigint>, n: bigint>`
  *
  * The LSH bucket-collection primitive (Dedup.bucketPairs): a plain
  * `collect_list` materializes the complete bucket before any size cap
  * can filter it, so one degenerate hot bucket — template text,
  * boilerplate, all-identical documents — builds an unbounded
  * aggregation buffer. This aggregate enforces the cap DURING
  * collection, map-side and merge-side alike: `ids` comes back sorted
  * when the group held ≤ cap elements, and NULL (with `n` = the true
  * count) when it overflowed, so callers can both skip hot buckets and
  * report how many they dropped.
  */
case class CollectCapped(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedListBuffer] {
  require(cap > 0 && cap <= 10000000, "cap in (0, 10000000]")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "graft_collect_capped"

  override def createAggregationBuffer(): CappedListBuffer = new CappedListBuffer(cap)

  override def update(buffer: CappedListBuffer, input: InternalRow): CappedListBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CappedListBuffer, other: CappedListBuffer): CappedListBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: CappedListBuffer): Any = {
    val ids =
      if (buffer.overflowed) null
      else new GenericArrayData(buffer.ids.toArray.sorted)
    InternalRow(ids, buffer.total)
  }

  override def serialize(buffer: CappedListBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + buffer.ids.length * 8)
    bb.putInt(buffer.cap)
    bb.putLong(buffer.total)
    bb.putInt(buffer.ids.length)
    buffer.ids.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedListBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CappedListBuffer(bb.getInt())
    val total = bb.getLong()
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.ids += bb.getLong(); i += 1 }
    buf.total = total
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
