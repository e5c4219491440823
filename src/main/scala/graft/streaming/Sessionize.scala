package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization, batch and streaming (L13 extension).
  *
  * Batch: per-user analytic pass — a session break is a gap >
  * `gapMinutes` from the previous event; session ids are the running
  * sum of breaks. Two window passes over ONE shuffle keyed on user
  * (both windows share the partitioning), then the per-session
  * aggregation reuses the same user-keyed exchange.
  *
  * Streaming: `flatMapGroupsWithState` with event-time timeout — the
  * custom-state surface Structured Streaming offers for exactly this
  * shape. State per user is one open session (O(1), not the event
  * list); sessions close either inline (a batch event arrives past
  * the gap) or via timeout when the watermark passes last-event + gap.
  * State size is O(active users), independent of stream length.
  */
object Sessionize {

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long, total: Double)
  final case class Session(user_id: Long, start_us: Long, n_events: Long,
                           total_value: Double, duration_secs: Double)

  /** Batch twin (`q_sessionize`): deterministic, DuckDB-oracle-able. */
  def batch(events: DataFrame, gapMinutes: Int,
            userCol: String = "user_id", tsCol: String = "ts",
            valueCol: String = "value"): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val run = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__brk",
        when(lag(col("__us"), 1).over(byUser).isNull ||
             col("__us") - lag(col("__us"), 1).over(byUser) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__brk")).over(run))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("total_value"),
        ((max(col("__us")) - min(col("__us"))) / 1e6).as("duration_secs"))
      .orderBy(col(userCol), col("session_id"))
  }

  /** Streaming sessionization over a watermarked event stream. */
  def streaming(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[Session] = {
    val gapUs = gapMinutes * 60L * 1000000L
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.scalaLong

    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000

    def close(user: Long, s: OpenSession): Session =
      Session(user, s.startUs, s.n, s.total, (s.lastUs - s.startUs) / 1e6)

    events.withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (!it.hasNext && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(user, s))
          } else {
            val evs = it.toArray.sortBy(e => micros(e.ts))
            val closed = scala.collection.mutable.ListBuffer.empty[Session]
            var cur = state.getOption
            evs.foreach { e =>
              val us = micros(e.ts)
              cur match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  cur = Some(OpenSession(s.startUs, math.max(s.lastUs, us),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += close(user, s)
                  cur = Some(OpenSession(us, us, 1L, e.value))
                case None =>
                  cur = Some(OpenSession(us, us, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close via timeout once the watermark passes last + gap
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.iterator
          }
      }
  }
}
