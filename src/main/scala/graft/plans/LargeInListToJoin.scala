package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, GreaterThanOrEqual, In, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, ShortType, TimestampType}

/** The inverted-index Catalyst optimization, as an injected optimizer
  * rule (SparkSessionExtensions.injectOptimizerRule): a doc-id lookup
  * arriving as SQL — `WHERE doc_id IN (<thousands of literals>)` —
  * becomes
  *
  *   Filter(doc_id >= min AND doc_id <= max)   ← pushed to the scan,
  *                                               prunes row groups on
  *                                               the clustered layout
  *   LeftSemi Join(child, LocalRelation(ids))  ← hash probe, planner
  *                                               broadcasts the tiny
  *                                               id relation
  *
  * Evaluating a multi-thousand-entry In() per row is linear in the
  * list and, worse, the predicate is too opaque for parquet row-group
  * pruning at that size; the range conjunct restores pruning and the
  * semi-join restores O(1) membership. This serves SQL users the same
  * plan `InvertedIndex.restrictToDocIds` builds through the DataFrame
  * API (reference perf contract: src/main.rs README "100 doc_ids in
  * ~1s on 10M rows" — point lookups must never full-scan).
  *
  * Scope: integral/date/timestamp-typed attributes with all-literal,
  * non-null lists longer than `Threshold`. The rewrite removes every
  * qualifying In, so the rule is idempotent under the optimizer's
  * fixed-point driver.
  */
object LargeInListToJoin extends Rule[LogicalPlan] {

  val Threshold = 1000

  private def rangeable(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | DateType | TimestampType => true
    case _ => false
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  private def isBigLiteralIn(e: Expression): Boolean = e match {
    case In(a: Attribute, vs) =>
      rangeable(a) && vs.length > Threshold &&
        vs.forall { case Literal(v, _) => v != null; case _ => false }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) if splitConj(cond).exists(isBigLiteralIn) =>
      val (bigIns, rest) = splitConj(cond).partition(isBigLiteralIn)
      var joined: LogicalPlan = child
      val rangePreds = bigIns.map { case In(attr: Attribute, vs) =>
        val idAttr = AttributeReference("__graft_in_id", attr.dataType, nullable = false)()
        val rows = vs.map { case Literal(v, _) => InternalRow(v) }
        joined = Join(joined, LocalRelation(Seq(idAttr), rows), LeftSemi,
          Some(EqualTo(attr, idAttr)), JoinHint.NONE)
        // reuse the original min/max literals so internal value types
        // stay consistent with the attribute's data type
        val sorted = vs.sortBy { case Literal(v, _) => v.asInstanceOf[Number].longValue() }
        And(GreaterThanOrEqual(attr, sorted.head), LessThanOrEqual(attr, sorted.last))
      }
      val remaining = (rangePreds ++ rest).reduceOption(And)
      remaining.map(Filter(_, joined)).getOrElse(joined)
  }
}
