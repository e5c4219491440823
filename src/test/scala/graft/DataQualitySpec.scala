package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{DataQuality, TimeSeries}

/** Brute-force driver-side oracles for the data-quality batch
  * (X222–X225): collected-table replays plus hand-built micro-tables
  * where the expected answer is computable by hand. */
class DataQualitySpec extends AnyFunSuite {
  import SparkTestSession._

  test("X222 audit: rule counts match collected brute force") {
    val byRule = DataQuality.constraintAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byRule.size == 10)
    val li = Tables.lineitem(spark, sf).collect()
    val ord = Tables.orders(spark, sf).collect()
    val orderKeys = ord.map(_.getLong(0)).toSet
    val custKeys = Tables.customer(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(byRule("lineitem_qty_range") ==
      (li.count(r => r.getDouble(4) <= 0 || r.getDouble(4) > 50).toLong,
        li.length.toLong))
    assert(byRule("lineitem_fk_orders") ==
      (li.count(r => !orderKeys.contains(r.getLong(0))).toLong,
        li.length.toLong))
    assert(byRule("orders_fk_customer") ==
      (ord.count(r => !custKeys.contains(r.getLong(1))).toLong,
        ord.length.toLong))
    // violations never exceed the checked population
    byRule.foreach { case (rule, (v, c)) =>
      assert(v >= 0 && v <= c, s"$rule: $v of $c")
    }
  }

  test("X223 diff: all four classes on a hand-built pair of snapshots") {
    import spark.implicits._
    val a = Seq(("u1", 5L), ("u2", 7L), ("u3", 9L)).toDF("k", "v")
    val b = Seq(("u1", 5L), ("u2", 8L), ("u4", 1L)).toDF("k", "v")
    val got = DataQuality.snapshotDiff(a, b, "k", Seq("v")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L))
  }

  test("X223 diff: NULL state transitions count as changed, not matched") {
    import spark.implicits._
    val a = Seq(("u1", Some(5L)), ("u2", None)).toDF("k", "v")
    val b = Seq(("u1", None), ("u2", Option.empty[Long])).toDF("k", "v")
    val got = DataQuality.snapshotDiff(a, b, "k", Seq("v")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // u1: 5 -> NULL is a change; u2: NULL <=> NULL matches
    assert(got == Map("changed" -> 1L, "unchanged" -> 1L))
  }

  test("X223 entry: events diff is append-only (no removed class)") {
    val got = DataQuality.snapshotDiffEvents(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!got.contains("removed"))
    assert(got.values.sum > 0)
  }

  test("X224 checksum: order- and partitioning-invariant; matches MD5 replay") {
    val docs = Tables.documents(spark, sf)
    val base = DataQuality.datasetChecksum(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val shuffled = DataQuality.datasetChecksum(
      docs.repartition(17, col("n_chars")).sortWithinPartitions("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(base.sameElements(shuffled), "checksum moved under repartition")
    // MD5 replay of one lang on the driver
    val lang = base.head._1
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.where(col("lang") === lang).collect().map { r =>
      val s = s"${r.getLong(0)}|${r.getString(2)}|${r.getString(3)}|" +
        s"${r.getLong(4)}|${r.getString(1)}"
      // NOTE column order in the canonical string is doc_id, lang,
      // source, n_chars, text — the select order in the operator
      BigInt(md.digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_))
        .mkString.take(15), 16)
    }.sum
    assert(BigInt(base.head._3) == expected)
  }

  test("X225 theil-sen: median pairwise slope matches the brute force") {
    val got = TimeSeries.theilSenDaily(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(!r.isNullAt(2))
    }
    // brute-force one event type against the collected daily series
    val et = got.head.getString(0)
    val daily = Tables.events(spark, sf)
      .where(col("event_type") === et)
      .groupBy(datediff(to_date(col("ts")), lit("2024-01-01")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2).toDouble /
        (daily(j)._1 - daily(i)._1).toDouble).sorted
    val n = slopes.length
    val med = (slopes((n - 1) / 2) + slopes(n / 2)) / 2.0
    val medR = java.math.BigDecimal.valueOf(med)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got.head.getLong(1) == n.toLong)
    assert(math.abs(got.head.getDouble(2) - medR) < 1e-9)
  }
}
