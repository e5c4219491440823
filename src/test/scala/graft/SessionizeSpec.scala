package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionize
import graft.streaming.Sessionize.SessionEvent

class SessionizeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("batch sessionization splits on gaps and aggregates per session") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0),
      (1L, ts("2024-01-01 12:00:00"), 3.0),   // > 30 min gap -> new session
      (2L, ts("2024-01-01 09:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val got = Sessionize.batch(df, gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 3.0, 600.0),
      (1L, 2L, 1L, 3.0, 0.0),
      (2L, 1L, 1L, 5.0, 0.0)))
  }

  test("batch sessionization on events testdata is deterministic and covers all events") {
    val sessions = Sessionize.batch(Tables.events(spark, sf), gapMinutes = 480)
    val total = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count(),
      "every event lands in exactly one session")
    val multi = sessions.where(col("n_events") > 1).count()
    assert(multi > 0, "the 8h gap should merge some events into shared sessions")
  }

  test("streaming sessionization closes sessions inline on gap and via timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionize.streaming(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("graft_sessions")
      .outputMode("append").start()
    try {
      input.addData(
        SessionEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
        SessionEvent(1L, ts("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      // a far-future event for the same user closes session 1 inline
      input.addData(SessionEvent(1L, ts("2024-01-01 15:00:00"), 7.0))
      q.processAllAvailable()
      val afterInline = spark.table("graft_sessions").as[Sessionize.Session].collect()
      assert(afterInline.length == 1)
      assert(afterInline(0).user_id == 1L && afterInline(0).n_events == 2L &&
        afterInline(0).total_value == 3.0 && afterInline(0).duration_secs == 600.0)

      // an unrelated user's much later event advances the watermark past
      // 15:00 + gap, firing the event-time timeout for the open session
      input.addData(SessionEvent(99L, ts("2024-01-02 12:00:00"), 0.0))
      q.processAllAvailable()
      input.addData(SessionEvent(99L, ts("2024-01-02 12:00:01"), 0.0))
      q.processAllAvailable()
      val afterTimeout = spark.table("graft_sessions").as[Sessionize.Session].collect()
      val u1Sessions = afterTimeout.filter(_.user_id == 1L)
      assert(u1Sessions.length == 2,
        s"timeout should close the 15:00 session, got ${afterTimeout.mkString(";")}")
      assert(u1Sessions.map(_.n_events).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("X174: state store provider conf routes through the streaming replay") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    // a bogus provider must FAIL the replayed stream — proving the
    // session conf reaches the state store layer (i.e. the RocksDB
    // twin really runs RocksDB, not a silent default fallback)
    spark.conf.set(key, "graft.NoSuchStateStoreProvider")
    try {
      intercept[Throwable] {
        graft.streaming.Replay.replaySessionize(spark, sf,
          gapMinutes = 480, batches = 2).count()
      }
    } finally spark.conf.unset(key)
    // and RocksDB completes with results identical to the default
    // provider: the backend changes where state lives, not values
    val dflt = graft.streaming.Replay.replaySessionize(spark, sf,
      gapMinutes = 480, batches = 2).collect().map(_.toString).sorted
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rocks = try graft.streaming.Replay.replaySessionize(spark, sf,
        gapMinutes = 480, batches = 2).collect().map(_.toString).sorted
      finally spark.conf.unset(key)
    assert(rocks.nonEmpty && rocks.sameElements(dflt),
      "RocksDB-backed replay must equal the default provider's result")
  }
}
