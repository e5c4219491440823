package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.expr.MGBuffer
import graft.operators.FrequentItems
import graft.functions.TextFunctions

class FrequentItemsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("MG buffer: every item above n/(cap+1) survives, estimates undercount by <= n/(cap+1)") {
    // skewed synthetic stream: item i appears 2^i times, i in 0..9
    val stream = (0 until 10).flatMap(i => Seq.fill(1 << i)(s"w$i"))
    val rnd = new scala.util.Random(3)
    val shuffled = rnd.shuffle(stream)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    val cap = 4
    val buf = new MGBuffer(cap)
    shuffled.foreach(buf.add)
    truth.foreach { case (item, c) =>
      if (c > n / (cap + 1)) {
        assert(buf.counts.contains(item), s"$item (freq $c > ${n / (cap + 1)}) must survive")
      }
      buf.counts.get(item).foreach { est =>
        assert(est <= c && c - est <= n / (cap + 1),
          s"$item est $est out of [${c - n / (cap + 1)}, $c]")
      }
    }
  }

  test("MG merge preserves the recall guarantee across split streams") {
    val a = Seq.fill(60)("hot") ++ (1 to 30).map(i => s"a$i")
    val b = Seq.fill(40)("hot") ++ (1 to 30).map(i => s"b$i")
    val cap = 5
    val b1 = new MGBuffer(cap); a.foreach(b1.add)
    val b2 = new MGBuffer(cap); b.foreach(b2.add)
    b1.mergeFrom(b2)
    val n = a.size + b.size
    assert(b1.total == n)
    assert(b1.counts.size <= cap)
    assert(b1.counts.contains("hot"), "item with 62% share must survive a merge")
  }

  test("heavyHitters equals the exact group-by answer and is partition-invariant") {
    val toks = Tables.documents(spark, sf)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val got = FrequentItems.heavyHitters(toks, "token", 0.02).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val n = toks.count()
    val exact = toks.groupBy("token").count()
      .where(col("count") > n * 0.02)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "phi=0.02 should yield heavy hitters in testdata")
    assert(got == exact)
    val again = FrequentItems.heavyHitters(toks.repartition(17), "token", 0.02)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == got, "sketch-then-recount must be partition-invariant")
  }

  test("sketch state stays bounded on a degenerate hot stream") {
    import spark.implicits._
    // 50k rows of one value plus a long distinct tail
    val hot = spark.range(50000).select(lit("hot").as("token"))
    val tail = spark.range(20000).select(concat(lit("t"), col("id")).as("token"))
    val got = FrequentItems.heavyHitters(hot.unionAll(tail), "token", 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("hot", 50000L)))
  }
}
