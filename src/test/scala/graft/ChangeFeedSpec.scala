package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ChangeFeed

class ChangeFeedSpec extends AnyFunSuite {
  import SparkTestSession._

  test("apply: last-writer-wins with deletes absent from the snapshot") {
    import spark.implicits._
    // key 1: insert only; key 2: insert then update; key 3: insert,
    // update, THEN delete (delete must outrank the update); key 4:
    // delete then a LATER re-insert (resurrection must survive)
    val feed = Seq(
      (1L, 1L, "I", "10.000"), (2L, 1L, "I", "20.000"),
      (3L, 1L, "I", "30.000"), (4L, 1L, "I", "40.000"),
      (2L, 2L, "U", "22.000"), (3L, 2L, "U", "33.000"),
      (3L, 3L, "D", null), (4L, 2L, "D", null),
      (4L, 3L, "I", "44.000"))
      .toDF("k", "seq", "op", "ps")
      .select($"k", $"seq", $"op", $"ps".cast("decimal(21,3)").as("price"))
    val got = ChangeFeed.apply(feed).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got == Map(
      1L -> ("I", 10.0), 2L -> ("U", 22.0), 4L -> ("I", 44.0)),
      s"snapshot wrong: $got")
  }

  test("entry: updated keys carry the 1.1x price, deleted keys are absent") {
    import org.apache.spark.sql.functions._
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = ChangeFeed.applyEntry(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(base.keys.filter(_ % 13 == 0).forall(k => !got.contains(k)),
      "keys = 0 mod 13 must be deleted")
    base.foreach { case (k, p) =>
      if (k % 13 != 0) {
        val (op, price) = got(k)
        if (k % 7 == 0) {
          assert(op == "U", s"key $k should be updated")
          val expect = (BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            * BigDecimal("1.1")).toDouble
          assert(price == expect, s"key $k price $price != $expect")
        } else assert(op == "I" && price ==
          BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
  }
}
