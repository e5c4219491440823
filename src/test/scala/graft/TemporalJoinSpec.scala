package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

class TemporalJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a"),
      (1L, ts("2024-01-01 10:00:00"), "b"),  // exactly at a right row
      (1L, ts("2024-01-01 11:30:00"), "c"),
      (2L, ts("2024-01-01 10:00:00"), "d"))  // user with no right rows
      .toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0))
      .toDF("user_id", "ts", "value")
    val got = AsOfJoin.lastValueAsOf(left, right, "user_id", "ts", "value", "v")
      .select("name", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got("a") == null, "before any right row -> null")
    assert(got("b") == 10.0, "equal ts matches inclusively")
    assert(got("c") == 20.0, "latest right row wins")
    assert(got("d") == null, "key with no right rows -> null")
  }

  test("tolerance as-of voids matches older than the staleness bound") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a"),  // before any right row
      (1L, ts("2024-01-01 10:30:00"), "b"),  // 30 min after the match
      (1L, ts("2024-01-01 12:00:00"), "c"),  // 60 min: exactly at bound
      (1L, ts("2024-01-01 12:00:01"), "d"))  // one second past: stale
      .toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0))
      .toDF("user_id", "ts", "value")
    val hour = 3600L * 1000000L
    val got = AsOfJoin.lastValueAsOfWithin(left, right, "user_id", "ts", "value", "v", hour)
      .select("name", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got("a") == null, "no match -> null")
    assert(got("b") == 10.0, "fresh match survives")
    assert(got("c") == 20.0, "staleness bound is inclusive")
    assert(got("d") == null, "stale match voids to null, not to an older row")
    // the tolerance variant at +infinity degrades to the plain as-of
    val plain = AsOfJoin.lastValueAsOf(left, right, "user_id", "ts", "value", "v")
      .select("name", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val loose = AsOfJoin.lastValueAsOfWithin(left, right, "user_id", "ts", "value", "v", Long.MaxValue)
      .select("name", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(loose == plain)
  }

  test("forward as-of picks the earliest right row at-or-after each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), "a"),
      (1L, ts("2024-01-01 10:00:00"), "b"),  // exactly at a right row
      (1L, ts("2024-01-01 11:30:00"), "c"),  // after the last right row
      (2L, ts("2024-01-01 10:00:00"), "d"))  // user with no right rows
      .toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0))
      .toDF("user_id", "ts", "value")
    val got = AsOfJoin.firstValueAsOfForward(left, right, "user_id", "ts", "value", "v")
      .select("name", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got("a") == 10.0, "earliest following right row wins")
    assert(got("b") == 10.0, "equal ts matches inclusively")
    assert(got("c") == null, "past the last right row -> null")
    assert(got("d") == null, "key with no right rows -> null")
  }

  test("nearest as-of picks the closer side; ties (incl. exact hits) go backward") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:20:00"), "closerBack"),   // 20m after r1, 40m before r2
      (1L, ts("2024-01-01 10:40:00"), "closerFwd"),    // 40m after r1, 20m before r2
      (1L, ts("2024-01-01 10:30:00"), "tie"),          // 30m both ways -> backward
      (1L, ts("2024-01-01 11:00:00"), "exact"),        // on r2 exactly
      (1L, ts("2024-01-01 09:00:00"), "onlyFwd"),      // before all right rows
      (1L, ts("2024-01-01 12:00:00"), "onlyBack"),     // after all right rows
      (2L, ts("2024-01-01 10:00:00"), "none"))
      .toDF("user_id", "ts", "name")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0))
      .toDF("user_id", "ts", "value")
    val got = AsOfJoin.nearestValueAsOf(left, right, "user_id", "ts", "value", "v")
      .select("name", "v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got("closerBack") == 10.0 && got("closerFwd") == 20.0)
    assert(got("tie") == 10.0, "equidistant -> backward wins")
    assert(got("exact") == 20.0, "exact timestamp matches itself at distance 0")
    assert(got("onlyFwd") == 10.0 && got("onlyBack") == 20.0)
    assert(got("none") == null)
  }

  test("as-of join plans one key-shuffle and no cartesian") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val plan = AsOfJoin.lastValueAsOf(ev, purchases, "user_id", "ts", "value", "lp")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"))
  }

  test("range join equals the naive inequality join") {
    import spark.implicits._
    val points = (0 until 500).map(i => (i.toLong, (i * 0.997) % 100)).toDF("id", "x")
    val intervals = (0 until 20).map(i => (i.toLong, i * 6.0, i * 6.0 + 9.0))
      .toDF("iid", "lo", "hi")
    val naive = points.join(intervals, $"x" >= $"lo" && $"x" < $"hi")
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", binWidth = 7.0)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
  }

  test("range join is an equi-join on the bin, not a nested loop") {
    val intervals = Tables.nation(spark, sf).select(
      col("n_nationkey").cast("long").as("bucket"),
      (col("n_nationkey") * 20.0).as("lo"),
      (col("n_nationkey") * 20.0 + 25.0).as("hi"))
    val plan = RangeJoin.pointInInterval(
        Tables.events(spark, sf), "value", intervals, "lo", "hi", 25.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"range join must not be a cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must be an equi-join on the bin:\n$plan")
  }
}
