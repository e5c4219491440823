package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, LongType}

/** Boolean search answered FROM the materialized posting-list index —
  * the custom whole-operator physical plan node of the inverted-index
  * engine (the reference's query layer runs against its own
  * value→doc-ids maps, reference src/main.rs:398-499; this is that
  * idea as a Catalyst citizen).
  *
  * Why an exec node and not DataFrame ops: posting-list intersection
  * is per-CHUNK streaming set algebra — AND/NOT over the doc sets of a
  * handful of query terms, one doc-id-range chunk at a time. The
  * DataFrame formulation (explode postings → groupBy doc) re-shuffles
  * per-doc rows; this node declares its needs to the planner instead —
  * `ClusteredDistribution(chunk)` + chunk-sorted input — and Catalyst
  * plans ONE exchange of term-pruned index rows, after which the
  * operator streams chunk groups with O(chunkSize) state and emits
  * doc_ids directly. The term pruning (`term IN (query terms)`) stays
  * a plain Catalyst Filter below the node, so it pushes into the index
  * scan like any predicate.
  */
case class PostingListIntersectPlan(
    must: Seq[String], mustNot: Seq[String],
    override val output: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {
  // doc_id is minted here, not projected from the child
  override def producedAttributes: AttributeSet = AttributeSet(output)
  // the node consumes term/chunk/postings imperatively (no Catalyst
  // expressions reference them), so declare the reads or ColumnPruning
  // will project the child down to nothing under e.g. count()
  override def references: AttributeSet = child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Plans the logical node 1:1 onto the exec node — injected via
  * GraftExtensions (spark.sql.extensions). */
object PostingListStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PostingListIntersectPlan(must, mustNot, out, child) =>
      PostingListIntersectExec(must, mustNot, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Streaming per-chunk posting intersection. Child rows are
  * (term, chunk, postings="doc:pos,...") from
  * Search.positionalIndexChunked, clustered AND sorted by chunk (both
  * declared below, so EnsureRequirements inserts the exchange/sort) —
  * the operator therefore sees each chunk's rows contiguously and its
  * state never exceeds one chunk's matched docs: a doc→must-bitmask
  * map plus a banned set, both ≤ chunkSize entries regardless of
  * corpus size or term hotness.
  */
case class PostingListIntersectExec(
    must: Seq[String], mustNot: Seq[String],
    override val output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {
  require(must.nonEmpty && must.size <= 64, "1..64 required terms")

  override def producedAttributes: AttributeSet = AttributeSet(output)

  private def chunkAttr: Attribute =
    child.output.find(_.name == "chunk").getOrElse(
      throw new IllegalArgumentException("child must carry a chunk column"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(chunkAttr)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(chunkAttr, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val termIdx = child.output.indexWhere(_.name == "term")
    val chunkIdx = child.output.indexWhere(_.name == "chunk")
    val postIdx = child.output.indexWhere(_.name == "postings")
    val mustIndex = must.zipWithIndex.toMap
    val notSet = mustNot.toSet
    val fullMask = if (must.size == 64) -1L else (1L << must.size) - 1L

    child.execute().mapPartitions { iter =>
      val bit = iter.buffered
      new Iterator[InternalRow] {
        private val proj = UnsafeProjection.create(Array[DataType](LongType))
        private val outRow = new GenericInternalRow(1)
        private var emit: Iterator[Long] = Iterator.empty

        /** Consume one full chunk group and stage its matches. */
        private def refill(): Unit = {
          val chunk = bit.head.getLong(chunkIdx)
          val mask = new java.util.HashMap[Long, Long]()
          val banned = new java.util.HashSet[Long]()
          while (bit.hasNext && bit.head.getLong(chunkIdx) == chunk) {
            val r = bit.next()
            val term = r.getUTF8String(termIdx).toString
            val postings = r.getUTF8String(postIdx).toString
            val isMust = mustIndex.get(term)
            if (isMust.isDefined || notSet.contains(term)) {
              // one posting per OCCURRENCE — dedup docs while parsing
              val docs = new java.util.HashSet[Long]()
              postings.split(',').foreach { p =>
                val cut = p.indexOf(':')
                if (cut > 0) docs.add(java.lang.Long.parseLong(p.substring(0, cut)))
              }
              val it = docs.iterator()
              isMust match {
                case Some(i) =>
                  while (it.hasNext) {
                    val d = it.next()
                    mask.merge(d, 1L << i, (a, b) => a | b)
                  }
                case None =>
                  while (it.hasNext) banned.add(it.next())
              }
            }
          }
          val hits = scala.collection.mutable.ArrayBuffer.empty[Long]
          mask.forEach { (d, m) =>
            if (m == fullMask && !banned.contains(d)) hits += d
          }
          emit = hits.sorted.iterator
        }

        override def hasNext: Boolean = {
          while (!emit.hasNext && bit.hasNext) refill()
          emit.hasNext
        }
        override def next(): InternalRow = {
          outRow.update(0, emit.next())
          proj(outRow)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** User API: boolean AND/NOT search over a materialized positional
  * index (Search.positionalIndexChunked layout). Result-identical to
  * Search.booleanSearch / booleanSearchScan on the same corpus
  * (SearchSpec proves the triple). */
object PostingListIntersect {
  def search(index: DataFrame, must: Seq[String],
             mustNot: Seq[String] = Nil): DataFrame = {
    require(must.nonEmpty, "at least one required term")
    val m = must.map(_.toLowerCase).distinct
    val n = mustNot.map(_.toLowerCase).distinct
    val terms: Seq[Column] = (m ++ n).map(org.apache.spark.sql.functions.lit)
    val pruned = index
      .where(col("term").isin(terms: _*))
      .select(col("term"), col("chunk").cast("long").as("chunk"), col("postings"))
    val out = Seq(AttributeReference("doc_id", LongType, nullable = false)())
    org.apache.spark.sql.graft.DatasetBridge.ofRows(index.sparkSession,
      PostingListIntersectPlan(m, n, out, pruned.queryExecution.analyzed))
  }
}
