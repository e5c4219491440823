package graft.functions.expr

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items buffer with `cap` counters.
  *
  * Classic guarantees (Misra & Gries 1982; mergeability per Agarwal et
  * al., "Mergeable Summaries", PODS 2012):
  *  - every item with true frequency > n/(cap+1) is present;
  *  - each estimate undercounts by at most n/(cap+1).
  * Merge: sum counters, then if over capacity subtract the (cap+1)-th
  * largest value from all and drop the non-positive — the PODS'12
  * merge that preserves both bounds. Memory is O(cap) regardless of
  * stream length or skew.
  */
final class MGBuffer(val cap: Int) {
  val counts = new scala.collection.mutable.HashMap[String, Long]()
  var total: Long = 0L

  def add(item: String): Unit = {
    total += 1
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < cap => counts.update(item, 1L)
      case None =>
        // decrement-all: O(cap) on a miss at capacity, amortized fine
        // for the cap sizes a heavy-hitters query uses
        val dead = new scala.collection.mutable.ArrayBuffer[String]()
        counts.foreach { case (k, c) =>
          if (c == 1L) dead += k else counts.update(k, c - 1)
        }
        dead.foreach(counts.remove)
    }
  }

  def mergeFrom(other: MGBuffer): Unit = {
    total += other.total
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > cap) {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val dead = new scala.collection.mutable.ArrayBuffer[String]()
      counts.foreach { case (k, c) =>
        if (c - kth <= 0L) dead += k else counts.update(k, c - kth)
      }
      dead.foreach(counts.remove)
    }
  }
}

/** `graft_freqitems(item, cap) -> struct<items: array<struct<item:
  * string, est: bigint>>, n: bigint>`
  *
  * The sketch half of heavy-hitters: candidates are a SUPERSET of all
  * items with share > 1/(cap+1) (order-dependent estimates, so
  * callers re-count candidates exactly in a second bounded pass — see
  * FrequentItems.heavyHitters). Constant O(cap) state map-side and
  * merge-side; only cap counters ever cross the exchange, never a
  * per-distinct-item map.
  */
case class FreqItemsSketch(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {
  require(cap > 0 && cap <= 100000, "cap in (0, 100000]")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "graft_freqitems"

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(cap)

  override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MGBuffer, other: MGBuffer): MGBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: MGBuffer): Any = {
    val rows = buffer.counts.toArray.sortBy { case (k, c) => (-c, k) }.map {
      case (k, c) => InternalRow(UTF8String.fromString(k), c)
    }
    InternalRow(new GenericArrayData(rows.asInstanceOf[Array[Any]]), buffer.total)
  }

  override def serialize(buffer: MGBuffer): Array[Byte] = {
    val items = buffer.counts.toArray
    val itemBytes = items.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(
      16 + items.length * 12 + itemBytes.map(_.length).sum)
    bb.putInt(buffer.cap)
    bb.putLong(buffer.total)
    bb.putInt(items.length)
    items.indices.foreach { i =>
      bb.putInt(itemBytes(i).length)
      bb.put(itemBytes(i))
      bb.putLong(items(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MGBuffer(bb.getInt())
    val total = bb.getLong()
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.counts.update(new String(arr, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf.total = total
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
