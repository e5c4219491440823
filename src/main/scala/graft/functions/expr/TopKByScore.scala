package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Bounded top-k heap state: at most k (id, score) pairs, worst on
  * top so admission is O(log k). Total order (score desc, id asc)
  * makes results deterministic under score ties. */
final class TopKBuffer(val k: Int) {
  // dequeue() removes the WORST element: lowest score, then highest id
  private val worstFirst: Ordering[(Long, Double)] = new Ordering[(Long, Double)] {
    def compare(a: (Long, Double), b: (Long, Double)): Int = {
      val c = java.lang.Double.compare(b._2, a._2)
      if (c != 0) c else java.lang.Long.compare(a._1, b._1)
    }
  }
  val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Double)](worstFirst)

  def add(id: Long, score: Double): Unit = {
    if (heap.size < k) heap.enqueue((id, score))
    else {
      val (wid, wscore) = heap.head
      if (score > wscore || (score == wscore && id < wid)) {
        heap.dequeue()
        heap.enqueue((id, score))
      }
    }
  }

  /** Best-first (score desc, id asc). */
  def sorted: Array[(Long, Double)] =
    heap.toArray.sortBy { case (id, s) => (-s, id) }
}

/** Top-k by score as a `TypedImperativeAggregate` (L6's scale lever).
  *
  * `graft_topk(id, score, k) -> array<struct<id,score>>` per group.
  * Partial aggregation runs map-side: every partition reduces its
  * candidate rows to a k-element heap BEFORE the shuffle, so an ANN
  * query over n candidates moves k rows per partition per group —
  * not n scores — through the exchange. A window-function
  * row_number() <= k formulation would shuffle and sort ALL n scores;
  * at 100 TB that is the difference between megabytes and the whole
  * dataset on the wire.
  */
case class TopKByScore(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k > 0 && k <= 100000, "k in (0, 100000]")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType == LongType && scoreExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, double), got " +
        s"(${idExpr.dataType.simpleString}, ${scoreExpr.dataType.simpleString})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null)
      buffer.add(id.asInstanceOf[Long], score.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (id, s) => buffer.add(id, s) }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (id, s) =>
      InternalRow(id, s)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val items = buffer.heap.toArray
    val bb = ByteBuffer.allocate(8 + items.length * 16)
    bb.putInt(buffer.k)
    bb.putInt(items.length)
    items.foreach { case (id, s) => bb.putLong(id); bb.putDouble(s) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getLong(), bb.getDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}
