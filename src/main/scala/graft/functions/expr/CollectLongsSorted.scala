package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Growable PRIMITIVE long vector — the aggregation buffer for
  * [[CollectLongsSorted]]. A scala ArrayBuffer[Long] (and Spark's own
  * collect_list) boxes every element; at a hot inverted-index value a
  * single group holds millions of ids, and millions of boxed Longs per
  * eval turn the aggregate into GC churn (measured 3–69 s swings on a
  * 4.1M-id group that this buffer runs in ~1 s, steady).
  */
final class LongVec {
  var arr = new Array[Long](16)
  var n = 0
  private def grow(need: Long): Unit = {
    // long arithmetic: `arr.length << 1` flips negative past 2^30
    // elements and `n + o.n` past Int.MaxValue — this aggregate is
    // specifically the hot-key path, so the bound gets a clear failure
    // instead of an opaque NegativeArraySizeException
    if (need > LongVec.MaxElems)
      throw new IllegalStateException(
        s"graft_sorted_ids: posting list too large ($need ids in one group; " +
          s"max ${LongVec.MaxElems}) — shard the hot key before aggregating")
    val cap = math.min(LongVec.MaxElems, math.max(arr.length.toLong * 2, need))
    arr = java.util.Arrays.copyOf(arr, cap.toInt)
  }
  def add(v: Long): Unit = {
    if (n >= arr.length) grow(n.toLong + 1)
    arr(n) = v
    n += 1
  }
  def mergeFrom(o: LongVec): Unit = {
    if (n.toLong + o.n > arr.length) grow(n.toLong + o.n)
    System.arraycopy(o.arr, 0, arr, n, o.n)
    n += o.n
  }
}

object LongVec {
  /** Hard per-group ceiling — the tightest of the two per-group frames,
    * so the clear "shard the hot key" error covers EVERY overflow path:
    *  - serialize: `4 + 8n` bytes in one Array[Byte] (n <= ~268.4M);
    *  - eval via `UnsafeArrayData.fromPrimitiveArray`: 8-byte header +
    *    `ceil(n/64)*8` null-bitmap bytes + `8n` value bytes, and Spark
    *    caps the whole frame at MAX_ROUNDED_ARRAY_LENGTH
    *    (Int.MaxValue - 15), i.e. n <= ~264.3M — the binding limit.
    *    Without this, a group in the 264.3M–268.4M band would pass the
    *    guard yet die at eval with Spark's opaque
    *    UnsupportedOperationException. */
  val MaxElems: Long = {
    val serializeMax = (Int.MaxValue.toLong - 4L) / 8L
    val unsafeCap = Int.MaxValue.toLong - 15L
    // solve 8 + ceil(n/64)*8 + 8n <= unsafeCap exactly (start just
    // above 8n + n/8 = unsafeCap and step down)
    var n = (unsafeCap - 16L) * 8L / 65L + 2L
    while (8L + ((n + 63L) / 64L) * 8L + 8L * n > unsafeCap) n -= 1
    math.min(serializeMax, n)
  }
}

/** `graft_sorted_ids(id) -> array<bigint>` — exactly
  * `sort_array(collect_list(id))` for non-null bigint input (ascending,
  * duplicates kept, nulls skipped), collected into a primitive long
  * buffer and sorted with the primitive dual-pivot sort.
  *
  * This is the posting-list aggregate of the inverted-index family
  * (R1/X8): `collect_list` builds a boxed ArrayBuffer and `sort_array`
  * then TimSorts boxed elements — on a hot value (one language ≈ 40%
  * of a corpus) that is millions of heap objects churned per group per
  * run, and wall time becomes whatever the collector decides. Here the
  * buffer is one primitive array (16 bytes of object header per GROUP,
  * not per element), merge is an arraycopy, eval is Arrays.sort + an
  * UnsafeArrayData wrap — allocation proportional to groups, not ids.
  */
case class CollectLongsSorted(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongVec] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_ids"

  override def createAggregationBuffer(): LongVec = new LongVec

  override def update(buffer: LongVec, input: InternalRow): LongVec = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: LongVec, other: LongVec): LongVec = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: LongVec): Any = {
    val out = java.util.Arrays.copyOf(buffer.arr, buffer.n)
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(buffer: LongVec): Array[Byte] = {
    // LongVec.grow enforces MaxElems on every append/merge, so the Int
    // size below cannot overflow; assert the invariant anyway — a
    // silent negative allocate here would be undebuggable at scale
    require(buffer.n <= LongVec.MaxElems,
      s"graft_sorted_ids: posting list too large (${buffer.n} ids)")
    val bb = ByteBuffer.allocate(4 + buffer.n * 8)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongVec = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new LongVec
    buf.arr = new Array[Long](math.max(16, n))
    var i = 0
    while (i < n) { buf.arr(i) = bb.getLong(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectLongsSorted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectLongsSorted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
