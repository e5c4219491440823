package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Clustering, EventAnalytics, Graph, Inference,
  Search, TextStats, TimeSeries}

/** Brute-force driver-side oracles for the round-11 batch
  * (X211–X218): each distributed statistic is replayed as plain Scala
  * collections over the collected sf0.001 tables (or a hand-built
  * micro-table where the expected answer is computable by hand). */
class Round11OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def r(x: Double, dp: Int): Double = {
    val m = math.pow(10, dp)
    java.math.BigDecimal.valueOf(x)
      .setScale(dp, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  test("X211 welch: t and df match the textbook formula on collected cents") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "cast(round(value * 100) as long) AS c")
      .where("event_type IN ('purchase','click') AND c IS NOT NULL")
      .collect().map(row => (row.getString(0), row.getLong(1)))
    def stats(t: String) = {
      val xs = ev.filter(_._1 == t).map(_._2.toDouble)
      val n = xs.length.toDouble
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val (n1, m1, v1) = stats("purchase")
    val (n2, m2, v2) = stats("click")
    val se = v1 / n1 + v2 / n2
    val tExp = (m1 - m2) / math.sqrt(se)
    val dfExp = se * se /
      ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1))
    val got = Inference.welchTTest(spark, sf).collect().head
    assert(got.getLong(2) == n1.toLong && got.getLong(3) == n2.toLong)
    assert(math.abs(got.getDouble(6) - tExp) < 2e-4, "t")
    assert(math.abs(got.getDouble(7) - dfExp) < 2e-3, "df")
  }

  test("X212 cramers v: chi2 matches the O(cells) brute force; v in [0,1]") {
    val docs = Tables.documents(spark, sf)
      .select("lang", "source").collect()
      .map(row => (row.getString(0), row.getString(1)))
    val n = docs.length.toDouble
    val cells = docs.groupBy(identity).view.mapValues(_.length.toDouble)
    val cx = docs.groupBy(_._1).view.mapValues(_.length.toDouble)
    val cy = docs.groupBy(_._2).view.mapValues(_.length.toDouble)
    val chi2 = cells.map { case ((l, s), c) =>
      val num = n * c - cx(l) * cy(s)
      // same 1e-6 quantization as the operator
      math.rint(num * num / (n * cx(l) * cy(s)) * 1e6) / 1e6
    }.sum
    val row = Inference.cramersV(spark, sf).collect().head
    assert(row.getLong(0) == n.toLong)
    assert(math.abs(row.getDouble(3) - chi2) < 1e-3, "chi2")
    val v = row.getDouble(4)
    assert(v >= 0.0 && v <= 1.0)
    val kMin = math.min(row.getLong(1), row.getLong(2)).toDouble
    assert(math.abs(v - math.sqrt(chi2 / (n * (kMin - 1)))) < 1e-3)
  }

  test("X213 assortativity: a path graph P4 matches hand Pearson") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    // sym edges with endpoint degrees: (1,2),(2,1),(2,2),(2,2),(2,1),(1,2)
    val xs = Seq(1.0, 2.0, 2.0, 2.0, 2.0, 1.0)
    val ys = Seq(2.0, 1.0, 2.0, 2.0, 1.0, 2.0)
    val n = xs.length
    val (sx, sy) = (xs.sum, ys.sum)
    val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val exp = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val row = Graph.assortativityEdges(e).collect().head
    assert(row.getLong(0) == 6L)
    assert(math.abs(row.getDouble(1) - r(exp, 4)) < 1e-9)
  }

  test("X214 gaps: every reported gap is absent from the minute set and maximal") {
    val mins = Tables.events(spark, sf)
      .selectExpr("event_type",
        "cast((unix_timestamp(ts) - unix_timestamp(timestamp '2024-01-01 00:00:00')) / 60 as long) AS mn")
      .collect().map(row => (row.getString(0), row.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val gaps = TimeSeries.minuteGaps(spark, sf).collect()
    assert(gaps.nonEmpty)
    gaps.foreach { g =>
      val (ty, s, e) = (g.getString(0), g.getLong(1), g.getLong(2))
      val hs = mins(ty)
      (s to e).foreach(h => assert(!hs.contains(h), s"$ty minute $h inside gap"))
      assert(hs.contains(s - 1) && hs.contains(e + 1), "gap must be maximal")
      assert(g.getLong(3) == e - s + 1)
    }
    // completeness: every adjacent-minute jump > 1 is reported
    val expected = mins.toSeq.flatMap { case (ty, hs) =>
      val sorted = hs.toSeq.sorted
      sorted.zip(sorted.tail).filter { case (a, b) => b > a + 1 }
        .map { case (a, b) => (ty, a + 1, b - 1) }
    }.toSet
    assert(gaps.map(g => (g.getString(0), g.getLong(1), g.getLong(2))).toSet
      == expected)
  }

  test("X215 KM: survival matches the hand-walked product; censored tails count") {
    val p = Tables.events(spark, sf)
      .where("event_type = 'purchase'")
      .selectExpr("user_id", "unix_timestamp(ts) AS s")
      .collect().map(row => (row.getLong(0), row.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val hmax = p.values.flatten.max
    val durs = p.values.toSeq.flatMap { ss =>
      ss.zip(ss.tail).map { case (a, b) => ((b - a) / 3600L, true) } :+
        (((hmax - ss.last) / 3600L), false)
    }
    val byT = durs.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    var rem = durs.length.toLong
    var surv = 1.0
    val expected = byT.map { case (t, (d, c)) =>
      val nRisk = rem
      if (d > 0) surv *= (rem - d).toDouble / rem.toDouble
      rem -= d + c
      (t, d, c, nRisk, r(surv, 6))
    }
    val got = EventAnalytics.kmSurvival(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getDouble(4))).toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == p.size.toLong, "one censored tail per user")
    assert(got.last._5 >= 0.0 && got.map(_._5) == got.map(_._5).sorted.reverse)
  }

  test("X216 readability: known sentences count exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "no terminal punctuation here")
    ).toDF("doc_id", "text")
    val got = TextStats.readability(docs).collect()
    val r1 = got(0)
    // 6 words, 2 sentences; syllables: e,a,a,e,o,a (vowel runs) = 6
    assert(r1.getLong(1) == 2 && r1.getLong(2) == 6 && r1.getLong(3) == 6)
    assert(r1.getDouble(4) == 3.0 && r1.getDouble(5) == 1.0)
    assert(r1.getDouble(6) == r(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 2))
    val r2 = got(1)
    assert(r2.getLong(1) == 1, "zero terminal marks floor to one sentence")
  }

  test("X217 dirichlet QL: score matches the closed form on a micro corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark fast engine"),
      (2L, "vector search engine"),
      (3L, "slow batch job"),
      (4L, "nothing relevant at all")
    ).toDF("doc_id", "text")
    val got = Search.lmDirichletTopK(docs, Seq("spark", "vector", "slow"),
        k = 10, mu = 100.0)
      .collect().map(row => (row.getLong(0), row.getDouble(1))).toMap
    assert(!got.contains(4L), "docs with no query term never score")
    val cTotal = 4 + 3 + 3 + 4.0
    val (cfS, cfV, cfSl) = (2.0, 1.0, 1.0)
    def score(tfS: Double, tfV: Double, tfSl: Double, dl: Double) =
      math.log((tfS + 100.0 * (cfS / cTotal)) / (dl + 100.0)) +
        math.log((tfV + 100.0 * (cfV / cTotal)) / (dl + 100.0)) +
        math.log((tfSl + 100.0 * (cfSl / cTotal)) / (dl + 100.0))
    assert(math.abs(got(1L) - score(2, 0, 0, 4)) < 1e-9)
    assert(math.abs(got(2L) - score(0, 1, 0, 3)) < 1e-9)
    assert(math.abs(got(3L) - score(0, 0, 1, 3)) < 1e-9)
    val ranked = Search.lmDirichletTopK(docs, Seq("spark"), 1, mu = 100.0)
      .collect()
    assert(ranked.head.getLong(0) == 1L, "highest-tf doc wins its own term")
  }

  test("X219 basket lift: counts and ratios match the brute force") {
    val it = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val nOrders = it.map(_._1).distinct.length.toLong
    val cItem = it.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCounts = it.groupBy(_._1).values.toSeq.flatMap { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= 2).toMap
    def halfUp4(num: Long, den: Long): Double = {
      val x = num * 10000L * 2 + den
      (x - x % (den * 2)) / (den * 2) / 1e4
    }
    val got = graft.operators.EventAnalytics.basketLift(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 50)
    got.foreach { row =>
      val (pa, pb, cab) = (row.getLong(0), row.getLong(1), row.getLong(2))
      assert(pairCounts((pa, pb)) == cab)
      assert(row.getLong(3) == cItem(pa) && row.getLong(4) == cItem(pb))
      assert(row.getDouble(5) ==
        halfUp4(cab * nOrders, cItem(pa) * cItem(pb)), "lift")
      assert(row.getDouble(6) == halfUp4(cab, cItem(pa)), "confidence")
    }
    val lifts = got.map(_.getDouble(5)).toSeq
    assert(lifts == lifts.sorted.reverse, "ranked by lift desc")
  }

  test("X220 snaive: MASE matches the hand lag walk") {
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type",
        "datediff(to_date(ts), date '2024-01-01') AS day")
      .groupBy("event_type", "day").count().collect()
      .map(row => (row.getString(0), row.getInt(1), row.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    def halfUp4(num: Long, den: Long): Double = {
      val x = num * 10000L * 2 + den
      (x - x % (den * 2)) / (den * 2) / 1e4
    }
    val got = TimeSeries.snaiveDaily(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val xs = daily(row.getString(0))
      val e1 = xs.zip(xs.tail).map { case (a, b) => math.abs(b - a) }
      val e7 = xs.drop(7).zip(xs.dropRight(7))
        .map { case (b, a) => math.abs(b - a) }
      assert(row.getLong(1) == xs.length)
      assert(row.getDouble(2) == halfUp4(e7.sum, e7.length), "mae_snaive")
      assert(row.getDouble(3) == halfUp4(e1.sum, e1.length), "mae_naive")
      assert(row.getDouble(4) ==
        halfUp4(e7.sum * e1.length, e7.length.toLong * e1.sum), "mase")
    }
  }

  test("X221 split: assignment is the pure md5 rule; proportions sane") {
    val got = graft.operators.Sampling
      .splitAssign(Tables.documents(spark, sf)).collect()
      .map(row => (row.getLong(0), row.getString(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val t80 = graft.operators.Sampling.rateThresholdHex(0.8)
    val t90 = graft.operators.Sampling.rateThresholdHex(0.8 + 0.1)
    got.foreach { case (id, split) =>
      val hex = md.digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val exp = if (hex < t80) "train" else if (hex < t90) "val" else "test"
      assert(split == exp, s"doc $id")
    }
    val byS = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byS.getOrElse("train", 0) > byS.getOrElse("test", 0))
  }

  test("X218 kmeans: the engine replays the exact driver-side Lloyd walk") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("cast(vec_id as long) AS id", "embedding")
      .collect()
      .map(row => (row.getLong(0),
        // the operator's exact quantization: HALF_UP, not rint's
        // half-to-even
        row.getSeq[Float](1).map(x =>
          java.math.BigDecimal.valueOf(x.toDouble * 1e6)
            .setScale(0, java.math.RoundingMode.HALF_UP)
            .doubleValue()).toArray))
      .sortBy(_._1)
    val k = 8; val iters = 3
    var cents = vecs.take(k).zipWithIndex
      .map { case ((_, v), i) => (i.toLong, v) }
    def assign(v: Array[Double]) = cents.map { case (cl, c) =>
      (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cl)
    }.min
    (1 to iters).foreach { _ =>
      val byCl = vecs.groupBy { case (_, v) => assign(v)._2 }
      cents = cents.map { case (cl, old) =>
        byCl.get(cl) match {
          case Some(members) =>
            val n = java.math.BigDecimal.valueOf(members.length.toLong)
            (cl, members.map(_._2).transpose.map(col =>
              java.math.BigDecimal.valueOf(col.sum)
                .divide(n, 0, java.math.RoundingMode.HALF_UP)
                .doubleValue()).toArray)
          case None => (cl, old)
        }
      }
    }
    val expected = vecs.map { case (id, v) =>
      val (d, cl) = assign(v)
      (id, cl, r(math.sqrt(d) / 1e6, 6))
    }.toSeq
    val got = Clustering.kmeans(Tables.embeddings(spark, sf)).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getDouble(2))).toSeq
    assert(got == expected)
    assert(got.map(_._2).distinct.size > 1, "more than one live cluster")
  }
}
