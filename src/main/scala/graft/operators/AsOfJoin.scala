package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for each left row, the latest right row with
  * right.ts <= left.ts on the same key (the time-series join Spark has
  * no native operator for; DuckDB spells it ASOF JOIN).
  *
  * Spark-first formulation, composition (a) from the custom-operator
  * preference order: tag and union both sides, then one incremental
  * window pass per key ordered by (ts, side) carries the last seen
  * right value forward into each left row. Properties that matter at
  * 100 TB:
  *  - ONE shuffle, keyed on the join key — both sides ride the same
  *    exchange; no broadcast, no range replication;
  *  - the window frame is unbounded-preceding with `last(ignoreNulls)`
  *    — evaluated incrementally, O(1) state per row, never buffering
  *    the frame;
  *  - ties (right.ts == left.ts) resolve inclusively: the right row
  *    sorts before the left row at equal ts, matching ASOF's
  *    `left.ts >= right.ts`.
  *
  * Duplicate right (key, ts) rows: the window ordering carries the
  * right VALUE as a final tiebreak, so the picked row is deterministic
  * run-to-run (backward frames resolve to the greatest value at the
  * tied timestamp, forward frames to the least). Cross-engine oracle
  * agreement (DuckDB ASOF leaves its pick unspecified) still requires
  * unique (key, ts) on the right side — the documented precondition.
  */
object AsOfJoin {

  /** Append `outCol` = value of the latest `right` row at-or-before
    * each `left` row's timestamp (null if none). `right` must carry
    * (key, ts, valueCol); `left` keeps all its columns. */
  def lastValueAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
                    valueCol: String, outCol: String): DataFrame = {
    val rv = "__asof_rv"
    val tag = "__asof_tag"
    val valueType = right.schema(valueCol).dataType
    val l = left
      .withColumn(tag, lit(1))
      .withColumn(rv, lit(null).cast(valueType))
    val r = right.select(col(key), col(ts), col(valueCol).as(rv))
      .withColumn(tag, lit(0))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(tag), col(rv))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(outCol, last(col(rv), ignoreNulls = true).over(w))
      .where(col(tag) === 1)
      .drop(tag, rv)
  }

  /** Forward as-of: `outCol` = value of the EARLIEST `right` row
    * at-or-after each `left` row's timestamp (null if none) — the
    * next-quote-after-trade / next-restock-after-stockout direction.
    * Mirror of `lastValueAsOf` with the same one-exchange shape: the
    * frame runs (currentRow, unboundedFollowing) with an incremental
    * `first(ignoreNulls)`, and at equal ts the right row sorts AFTER
    * the left row so it falls INSIDE the left row's following frame —
    * inclusive `right.ts >= left.ts`, matching ASOF `l.ts <= r.ts`. */
  def firstValueAsOfForward(left: DataFrame, right: DataFrame, key: String, ts: String,
                            valueCol: String, outCol: String): DataFrame = {
    val rv = "__asof_rv"
    val tag = "__asof_tag"
    val valueType = right.schema(valueCol).dataType
    val l = left
      .withColumn(tag, lit(0))
      .withColumn(rv, lit(null).cast(valueType))
    val r = right.select(col(key), col(ts), col(valueCol).as(rv))
      .withColumn(tag, lit(1))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(tag), col(rv))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(outCol, first(col(rv), ignoreNulls = true).over(w))
      .where(col(tag) === 0)
      .drop(tag, rv)
  }

  /** X181: as-of join with a staleness tolerance — the backward match
    * only counts if it lies within `toleranceMicros` of the left row
    * (stale quotes don't price trades; expired gauges don't fill
    * dashboards). Same one-exchange union+window as `lastValueAsOf`
    * with the matched row's timestamp carried alongside its value
    * (the paired last() calls pick the same row); the tolerance is a
    * per-row filter AFTER the window — never a join predicate, so no
    * interval-join cardinality and no second shuffle. */
  def lastValueAsOfWithin(left: DataFrame, right: DataFrame, key: String,
                          ts: String, valueCol: String, outCol: String,
                          toleranceMicros: Long): DataFrame = {
    require(toleranceMicros >= 0, "tolerance must be >= 0")
    val rv = "__asof_rv"
    val rt = "__asof_rt"
    val tag = "__asof_tag"
    val valueType = right.schema(valueCol).dataType
    val l = left
      .withColumn(tag, lit(1))
      .withColumn(rv, lit(null).cast(valueType))
      .withColumn(rt, lit(null).cast("long"))
    val r = right.select(col(key), col(ts), col(valueCol).as(rv))
      .withColumn(tag, lit(0))
      // rt gated on the VALUE being present: last(__lv) skips null
      // values, so an unconditional rt would let a null-valued right
      // row advance the clock past the row the value came from —
      // staleness would be measured against the wrong row. Gated,
      // null-valued rows are invisible to BOTH last() calls and the
      // pair always describes one row.
      .withColumn(rt, when(col(rv).isNotNull, unix_micros(col(ts))))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(tag), col(rv))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__lv", last(col(rv), ignoreNulls = true).over(w))
      .withColumn("__lt", last(col(rt), ignoreNulls = true).over(w))
      .where(col(tag) === 1)
      .withColumn(outCol,
        when(unix_micros(col(ts)) - col("__lt") <= toleranceMicros, col("__lv")))
      .drop(tag, rv, rt, "__lv", "__lt")
  }

  /** Nearest as-of: the closer of the latest-before and
    * earliest-after right rows (ties, including an exact-timestamp
    * match at distance 0, go BACKWARD — pinned). ONE union and ONE
    * sort serve both directions: right rows tag 0 sort before left
    * rows at equal ts, so the preceding frame catches an equal-ts
    * right row inclusively; the following frame then misses it — but
    * backward already owns it at distance 0, so nearest semantics are
    * unharmed. Both direction passes are incremental frames over the
    * same (key, (ts, tag)) WindowExec sort; distances compare as
    * exact integer microseconds. */
  def nearestValueAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
                       valueCol: String, outCol: String): DataFrame = {
    val rv = "__asof_rv"
    val rt = "__asof_rt"
    val tag = "__asof_tag"
    val valueType = right.schema(valueCol).dataType
    val l = left
      .withColumn(tag, lit(1))
      .withColumn(rv, lit(null).cast(valueType))
      .withColumn(rt, lit(null).cast("long"))
    val r = right.select(col(key), col(ts), col(valueCol).as(rv))
      .withColumn(tag, lit(0))
      .withColumn(rt, unix_micros(col(ts)))
    val base = Window.partitionBy(col(key)).orderBy(col(ts), col(tag), col(rv))
    val back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__bv", last(col(rv), ignoreNulls = true).over(back))
      .withColumn("__bt", last(col(rt), ignoreNulls = true).over(back))
      .withColumn("__fv", first(col(rv), ignoreNulls = true).over(fwd))
      .withColumn("__ft", first(col(rt), ignoreNulls = true).over(fwd))
      .where(col(tag) === 1)
    u.withColumn(outCol,
        when(col("__bt").isNull, col("__fv"))
          .when(col("__ft").isNull, col("__bv"))
          .when(unix_micros(col(ts)) - col("__bt") <= col("__ft") - unix_micros(col(ts)),
            col("__bv"))
          .otherwise(col("__fv")))
      .drop(tag, rv, rt, "__bv", "__bt", "__fv", "__ft")
  }
}
