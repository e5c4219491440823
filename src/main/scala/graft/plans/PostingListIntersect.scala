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

/** The query algebra the posting-list exec node answers FROM the
  * materialized positional index — boolean AND/NOT, disjunctive
  * min-should-match, and in-order phrase adjacency with slop. The
  * reference's query layer runs boolean membership against its own
  * value→doc-ids maps (reference src/main.rs:398-499); this is that
  * idea as a Catalyst citizen, widened to the positional queries the
  * index's doc:pos postings already carry the data for.
  */
sealed trait PostingQuery extends Serializable {
  /** Every term the query touches — becomes the index prune below the
    * node, so pruning stays a plain Catalyst Filter on the scan. */
  def terms: Seq[String]
}

/** Docs containing ALL of `must`, NONE of `mustNot`, and at least
  * `minShould` DISTINCT terms of `should`. Pure AND/NOT when `should`
  * is empty; pure min-should-match OR when `must` is empty. */
case class BoolPosting(must: Seq[String], mustNot: Seq[String],
                       should: Seq[String], minShould: Int) extends PostingQuery {
  require(must.nonEmpty || should.nonEmpty, "query needs must or should terms")
  // BoolEval's output arity is keyed on should.isEmpty (1-wide AND/NOT
  // vs 2-wide OR + coordination count); a combined must+should query
  // would need its own entry point declaring the 2-wide shape — closed
  // off here so the case class can't outrun its executors
  require(must.isEmpty || should.isEmpty,
    "combined must+should has no entry point (arity differs per shape)")
  require(must.size <= 64 && should.size <= 64, "at most 64 terms per clause")
  require(should.isEmpty || (minShould >= 1 && minShould <= should.size),
    "minShould must be within [1, |should|]")
  override def terms: Seq[String] = must ++ mustNot ++ should
}

/** Words must appear IN ORDER, each within `1 + slop` positions of
  * its predecessor. slop = 0 is exact adjacency (occurrence count +
  * first anchor); slop > 0 counts position CHAINS — the join
  * cardinality of the adjacency-join formulation, deterministic and
  * engine-independent (matches Search.phraseSearchSlop). */
case class PhrasePosting(words: Seq[String], slop: Int) extends PostingQuery {
  require(words.size >= 2, "phrase needs at least two words")
  require(slop >= 0, "slop must be >= 0")
  override def terms: Seq[String] = words.distinct
}

/** Index-backed search as a CUSTOM WHOLE-OPERATOR plan node.
  *
  * Why an exec node and not DataFrame ops: posting-list algebra is
  * per-CHUNK streaming set work — intersection masks, should counts,
  * and positional adjacency over the doc sets of a handful of query
  * terms, one doc-id-range chunk at a time. The DataFrame formulation
  * (explode postings → groupBy doc → adjacency self-joins) re-shuffles
  * per-doc (or per-occurrence) rows once per phrase word; this node
  * declares its needs to the planner instead — `ClusteredDistribution
  * (chunk)` + chunk-sorted input — and Catalyst plans ONE exchange of
  * term-pruned index rows, after which the operator streams chunk
  * groups with O(chunkSize) state and emits result rows directly. The
  * term pruning (`term IN (query terms)`) stays a plain Catalyst
  * Filter below the node, so it pushes into the index scan like any
  * predicate.
  */
case class PostingListIntersectPlan(
    query: PostingQuery,
    override val output: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {
  // doc_id / counts are minted here, not projected from the child
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
    case PostingListIntersectPlan(query, out, child) =>
      PostingListIntersectExec(query, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Streaming per-chunk posting-query evaluation. Child rows are
  * (term, chunk, postings="doc:pos,...") from
  * Search.positionalIndexChunked, clustered AND sorted by chunk (both
  * declared below, so EnsureRequirements inserts the exchange/sort) —
  * the operator therefore sees each chunk's rows contiguously, and
  * because the chunk key derives from doc_id, EVERY term's postings
  * for a given doc land in the same chunk group. Per-chunk state is
  * ≤ chunkSize docs of masks (bool) or query-term position lists
  * (phrase), regardless of corpus size or term hotness.
  */
case class PostingListIntersectExec(
    query: PostingQuery,
    override val output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

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
    val q = query
    val arity = output.size

    child.execute().mapPartitions { iter =>
      val bit = iter.buffered
      new Iterator[InternalRow] {
        private val proj =
          UnsafeProjection.create(Array.fill[DataType](arity)(LongType))
        private val outRow = new GenericInternalRow(arity)
        private var emit: Iterator[Array[Long]] = Iterator.empty

        /** Consume one full chunk group and stage its result rows. */
        private def refill(): Unit = {
          val chunk = bit.head.getLong(chunkIdx)
          val eval = ChunkEval(q)
          while (bit.hasNext && bit.head.getLong(chunkIdx) == chunk) {
            val r = bit.next()
            eval.add(r.getUTF8String(termIdx).toString,
              r.getUTF8String(postIdx).toString)
          }
          emit = eval.results()
        }

        override def hasNext: Boolean = {
          while (!emit.hasNext && bit.hasNext) refill()
          emit.hasNext
        }
        override def next(): InternalRow = {
          val vals = emit.next()
          var i = 0
          while (i < arity) { outRow.update(i, vals(i)); i += 1 }
          proj(outRow)
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Per-chunk evaluation state — one instance per chunk group, fed
  * (term, postings) rows in any order, then drained sorted by doc. */
private sealed trait ChunkEval {
  def add(term: String, postings: String): Unit
  /** Result rows sorted by doc_id; each row is the output arity. */
  def results(): Iterator[Array[Long]]
}

private object ChunkEval {
  def apply(q: PostingQuery): ChunkEval = q match {
    case b: BoolPosting => new BoolEval(b)
    case p: PhrasePosting => new PhraseEval(p)
  }

  /** Distinct doc ids of one "doc:pos,..." posting string. */
  private def docsOf(postings: String): java.util.HashSet[Long] = {
    val docs = new java.util.HashSet[Long]()
    postings.split(',').foreach { p =>
      val cut = p.indexOf(':')
      if (cut > 0) docs.add(java.lang.Long.parseLong(p.substring(0, cut)))
    }
    docs
  }

  private final class BoolEval(q: BoolPosting) extends ChunkEval {
    private val mustIndex = q.must.zipWithIndex.toMap
    private val shouldIndex = q.should.zipWithIndex.toMap
    private val notSet = q.mustNot.toSet
    private val fullMask =
      if (q.must.size == 64) -1L else (1L << q.must.size) - 1L
    private val mustMask = new java.util.HashMap[Long, Long]()
    private val shouldMask = new java.util.HashMap[Long, Long]()
    private val banned = new java.util.HashSet[Long]()

    override def add(term: String, postings: String): Unit = {
      val m = mustIndex.get(term)
      val s = shouldIndex.get(term)
      if (m.isDefined || s.isDefined || notSet.contains(term)) {
        val it = docsOf(postings).iterator()
        while (it.hasNext) {
          val d = it.next()
          m.foreach(i => mustMask.merge(d, 1L << i, (a, b) => a | b))
          s.foreach(i => shouldMask.merge(d, 1L << i, (a, b) => a | b))
          if (notSet.contains(term)) banned.add(d)
        }
      }
    }

    override def results(): Iterator[Array[Long]] = {
      val hits = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      // candidate universe: docs matching every must term, or (pure
      // OR) docs matching any should term
      val candidates = if (q.must.nonEmpty) mustMask else shouldMask
      candidates.forEach { (d, _) =>
        val mOk = q.must.isEmpty || mustMask.getOrDefault(d, 0L) == fullMask
        val nShould = java.lang.Long.bitCount(shouldMask.getOrDefault(d, 0L)).toLong
        val sOk = q.should.isEmpty || nShould >= q.minShould
        if (mOk && sOk && !banned.contains(d)) {
          hits += (if (q.should.isEmpty) Array(d) else Array(d, nShould))
        }
      }
      hits.sortBy(_.head).iterator
    }
  }

  private final class PhraseEval(q: PhrasePosting) extends ChunkEval {
    // a word may recur in the phrase ("a b a") — term → every slot
    private val slots: Map[String, Seq[Int]] =
      q.words.zipWithIndex.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2) }
    // doc → per-slot sorted position lists
    private val byDoc =
      new java.util.HashMap[Long, Array[scala.collection.mutable.ArrayBuffer[Long]]]()

    override def add(term: String, postings: String): Unit =
      slots.get(term).foreach { ss =>
        postings.split(',').foreach { p =>
          val cut = p.indexOf(':')
          if (cut > 0) {
            val d = java.lang.Long.parseLong(p.substring(0, cut))
            val pos = java.lang.Long.parseLong(p.substring(cut + 1))
            val arr = byDoc.computeIfAbsent(d,
              _ => Array.fill(q.words.size)(
                scala.collection.mutable.ArrayBuffer.empty[Long]))
            ss.foreach(i => arr(i) += pos)
          }
        }
      }

    override def results(): Iterator[Array[Long]] = {
      val hits = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      byDoc.forEach { (d, slotsArr) =>
        if (slotsArr.forall(_.nonEmpty)) {
          if (q.slop == 0) {
            // exact adjacency: occurrences anchored at p with word i
            // at p + i; postings are per-occurrence, so sets suffice
            val sets = slotsArr.map(_.toSet)
            val anchors = slotsArr(0).toSeq.sorted
              .filter(p => (1 until q.words.size).forall(i => sets(i)(p + i)))
            if (anchors.nonEmpty) hits += Array(d, anchors.size.toLong, anchors.head)
          } else {
            // chain DP, counting = adjacency-join cardinality: each
            // step keeps (pos, chains-ending-here, min contributing
            // anchor); per-doc positions are scan-row bounded
            var cur: Seq[(Long, Long, Long)] =
              slotsArr(0).toSeq.sorted.map(p => (p, 1L, p))
            var i = 1
            while (i < q.words.size && cur.nonEmpty) {
              cur = slotsArr(i).toSeq.sorted.flatMap { nxt =>
                val contrib = cur.filter { case (p, _, _) =>
                  nxt > p && nxt <= p + 1 + q.slop }
                if (contrib.isEmpty) None
                else Some((nxt, contrib.map(_._2).sum, contrib.map(_._3).min))
              }
              i += 1
            }
            if (cur.nonEmpty)
              hits += Array(d, cur.map(_._2).sum, cur.map(_._3).min)
          }
        }
      }
      hits.sortBy(_.head).iterator
    }
  }
}

/** User API over a materialized positional index in the
  * Search.positionalIndexChunked layout. Each entry point is
  * result-identical to its DataFrame twin on the same corpus
  * (SearchSpec proves the pairs). */
object PostingListIntersect {
  private def longAttrs(names: String*): Seq[Attribute] =
    names.map(n => AttributeReference(n, LongType, nullable = false)())

  private def run(index: DataFrame, query: PostingQuery,
                  out: Seq[Attribute]): DataFrame = {
    val terms: Seq[Column] =
      query.terms.map(org.apache.spark.sql.functions.lit)
    val pruned = index
      .where(col("term").isin(terms: _*))
      .select(col("term"), col("chunk").cast("long").as("chunk"), col("postings"))
    org.apache.spark.sql.graft.DatasetBridge.ofRows(index.sparkSession,
      PostingListIntersectPlan(query, out, pruned.queryExecution.analyzed))
  }

  /** Boolean AND/NOT: docs with ALL of `must`, NONE of `mustNot`.
    * Twin of Search.booleanSearch. → (doc_id) */
  def search(index: DataFrame, must: Seq[String],
             mustNot: Seq[String] = Nil): DataFrame = {
    require(must.nonEmpty, "at least one required term")
    run(index,
      BoolPosting(must.map(_.toLowerCase).distinct,
        mustNot.map(_.toLowerCase).distinct, Nil, 0),
      longAttrs("doc_id"))
  }

  /** Disjunctive min-should-match with the coordination count. Twin
    * of Search.orSearch. → (doc_id, n_matched) */
  def orSearch(index: DataFrame, should: Seq[String],
               minMatch: Int = 1): DataFrame =
    run(index,
      BoolPosting(Nil, Nil, should.map(_.toLowerCase).distinct, minMatch),
      longAttrs("doc_id", "n_matched"))

  /** Exact-adjacency phrase. Twin of Search.phraseSearch.
    * → (doc_id, n_occurrences, first_pos) */
  def phrase(index: DataFrame, words: Seq[String]): DataFrame =
    run(index, PhrasePosting(words.map(_.toLowerCase), 0),
      longAttrs("doc_id", "n_occurrences", "first_pos"))

  /** Sloppy phrase, chain-count semantics. Twin of
    * Search.phraseSearchSlop. → (doc_id, n_matches, first_pos) */
  def phraseSlop(index: DataFrame, words: Seq[String], slop: Int): DataFrame = {
    require(slop >= 1, "use phrase() for slop 0")
    run(index, PhrasePosting(words.map(_.toLowerCase), slop),
      longAttrs("doc_id", "n_matches", "first_pos"))
  }
}
