package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Brute-force driver-side oracles for the event-analytics family
  * (X125-X128): each operator's distributed plan is replayed as plain
  * Scala collections over the collected sf0.001 events. */
class EventAnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val ev: Seq[(Long, Timestamp, Long, String, Double)] =
    Tables.events(spark, sf)
      .selectExpr("user_id", "ts", "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq

  test("funnel: stagewise strict-order counts match the brute force") {
    val got = SparkEntry.queries("q_funnel_seq")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val byUser = ev.groupBy(_._1)
    def minAfter(es: Seq[(Long, Timestamp, Long, String, Double)],
                 ty: String, after: Option[Timestamp]): Option[Timestamp] =
      after.flatMap { a =>
        val c = es.filter(e => e._4 == ty && e._2.after(a)).map(_._2)
        if (c.isEmpty) None else Some(c.min)
      }
    val t1s = byUser.view.mapValues { es =>
      val v = es.filter(_._4 == "view").map(_._2)
      if (v.isEmpty) None else Some(v.min)
    }.toMap
    val t2s = byUser.map { case (u, es) => u -> minAfter(es, "click", t1s(u)) }
    val t3s = byUser.map { case (u, es) => u -> minAfter(es, "purchase", t2s(u)) }
    val expect = Seq(
      (1L, "view", t1s.values.count(_.isDefined).toLong),
      (2L, "click", t2s.values.count(_.isDefined).toLong),
      (3L, "purchase", t3s.values.count(_.isDefined).toLong))
    assert(got == expect && expect.head._3 > 0)
    // strictness: the funnel is monotone non-increasing
    assert(expect(0)._3 >= expect(1)._3 && expect(1)._3 >= expect(2)._3)
  }

  test("cumulative distinct users: the running curve matches first-seen counting") {
    val got = SparkEntry.queries("q_cum_distinct")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val byDay: Map[String, Set[Long]] =
      ev.groupBy(e => fmt.format(e._2)).view.mapValues(_.map(_._1).toSet).toMap
    val days = byDay.keys.toSeq.sorted
    var seen = Set.empty[Long]
    val expect = days.map { d =>
      val nu = (byDay(d) -- seen).size.toLong
      seen ++= byDay(d)
      (d, nu, seen.size.toLong)
    }
    assert(got == expect)
    assert(got.last._3 == ev.map(_._1).distinct.size.toLong,
      "the curve must end at the total distinct user count")
  }

  test("retention: every cohort cell matches distinct-user counting") {
    val epoch = java.time.LocalDate.of(2024, 1, 1)
    val got = SparkEntry.queries("q_retention")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def week(t: Timestamp): Long =
      java.time.temporal.ChronoUnit.DAYS.between(
        epoch, t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate) / 7
    val wk = ev.map(e => (e._1, week(e._2)))
    val cohort = wk.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expect = wk.map { case (u, w) => (cohort(u), w - cohort(u), u) }
      .distinct.groupBy(t => (t._1, t._2)).view.mapValues(_.size.toLong).toMap
    assert(got == expect && got.nonEmpty)
    // cell (c, 0) always contains the cohort's full population
    val pops = cohort.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    pops.foreach { case (c, n) => assert(got((c, 0L)) == n) }
  }

  test("markov: transition counts and row-normalized probabilities match") {
    val got = SparkEntry.queries("q_markov")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2.getTime, e._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.toSeq
    val cnt = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got.keySet == cnt.keySet && got.nonEmpty)
    cnt.foreach { case (k, n) =>
      assert(got(k)._1 == n)
      assert(math.abs(got(k)._2 - n.toDouble / rowTot(k._1)) < 1e-6, s"$k")
    }
    // probabilities sum to ~1 per source state
    got.toSeq.groupBy(_._1._1).values.foreach { row =>
      assert(math.abs(row.map(_._2._2).sum - 1.0) < 1e-5)
    }
  }

  test("psi drift: per-type kl/psi terms match the share arithmetic") {
    val split = Timestamp.valueOf("2024-01-16 00:00:00")
    val got = SparkEntry.queries("stats_psi")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(6)))).toMap
    val cnt = ev.groupBy(_._4).view.mapValues { es =>
      (es.count(_._2.before(split)).toLong,
        es.count(e => !e._2.before(split)).toLong)
    }.toMap.filter { case (_, (a, b)) => a > 0 && b > 0 }
    val na = cnt.values.map(_._1).sum.toDouble
    val nb = cnt.values.map(_._2).sum.toDouble
    assert(got.keySet == cnt.keySet && got.nonEmpty)
    cnt.foreach { case (t, (a, b)) =>
      val p = a / na; val q = b / nb
      assert(got(t)._1 == a && got(t)._2 == b)
      assert(math.abs(got(t)._3 - p * math.log(p / q)) < 1e-6, s"kl $t")
      assert(math.abs(got(t)._4 - (p - q) * math.log(p / q)) < 1e-6, s"psi $t")
    }
  }

  test("seasonality: cells and per-type shares match brute force; shares sum to 1") {
    val epoch = java.time.LocalDate.of(2024, 1, 1)
    val got = SparkEntry.queries("q_seasonality")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val cells = ev.map(e => (java.time.temporal.ChronoUnit.DAYS.between(epoch,
      e._2.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate) % 7, e._4))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val typeTot = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    assert(got.keySet == cells.keySet && got.nonEmpty)
    cells.foreach { case (k, n) =>
      assert(got(k)._1 == n)
      assert(math.abs(got(k)._2 - n.toDouble / typeTot(k._2)) < 1e-6)
    }
    got.toSeq.groupBy(_._1._2).values.foreach { rows =>
      assert(math.abs(rows.map(_._2._2).sum - 1.0) < 1e-4)
    }
  }

  test("movers: deltas, pct, and |delta| rank match brute force") {
    val epoch = java.time.LocalDate.of(2024, 1, 1)
    val got = SparkEntry.queries("q_top_movers")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6)))).toMap
    val wk = ev.map(e => (java.time.temporal.ChronoUnit.DAYS.between(epoch,
      e._2.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate) / 7, e._4))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = wk.toSeq.flatMap { case ((w, t), n) =>
      wk.get((w - 1, t)).map(p => (w, t) -> ((n, p, n - p)))
    }.toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    expect.foreach { case (k, (n, p, d)) =>
      assert(got(k)._1 == n && got(k)._2 == p && got(k)._3 == d)
      assert(math.abs(got(k)._4 - d.toDouble / p) < 1e-6)
    }
    // per-week ranks are a permutation of 1..types ordered by |delta|
    expect.keys.groupBy(_._1).foreach { case (w, ks) =>
      val ranked = ks.toSeq.sortBy(k => (-math.abs(expect(k)._3), k._2))
      ranked.zipWithIndex.foreach { case (k, i) =>
        assert(got(k)._5 == i + 1, s"rank $k")
      }
    }
  }

  test("overlap: intersections and jaccard match brute-force user sets") {
    val got = SparkEntry.queries("q_overlap_users")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val sets = ev.map(e => (e._4, e._1)).distinct.groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val expect = (for {
      a <- types; b <- types if a < b
    } yield (a, b) -> ((sets(a) & sets(b)).size.toLong,
      sets(a).size.toLong, sets(b).size.toLong)).toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    expect.foreach { case (k, (i, na, nb)) =>
      assert(got(k)._1 == i && got(k)._2 == na && got(k)._3 == nb)
      assert(math.abs(got(k)._4 - i.toDouble / (na + nb - i)) < 1e-6)
    }
  }

  test("churn: partition identities hold and cells match brute force") {
    val got = SparkEntry.queries("q_churn")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val epoch = java.time.LocalDate.of(2024, 1, 1)
    val uw = ev.map(e => (java.time.temporal.ChronoUnit.DAYS.between(epoch,
      e._2.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate) / 7, e._1)).distinct
    val byWeek = uw.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val firstWk = uw.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    assert(got.keySet == byWeek.keySet && got.nonEmpty)
    byWeek.foreach { case (w, us) =>
      val prev = byWeek.getOrElse(w - 1, Set.empty[Long])
      val (active, nu, ret, res, chu) = got(w)
      assert(active == us.size)
      assert(nu == us.count(firstWk(_) == w))
      assert(ret == us.count(prev))
      assert(res == us.count(u => firstWk(u) < w && !prev(u)))
      assert(chu == prev.count(!us(_)))
      assert(nu + ret + res == active && ret + chu == prev.size, s"week $w")
    }
  }

  test("attribution: per-touch credit matches a driver-side replay; revenue conserved") {
    val got = SparkEntry.queries("q_attribution")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def bd(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val credited = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2.getTime, e._3))
      sorted.zipWithIndex.collect { case (e, i) if e._4 == "purchase" =>
        val touch = sorted.take(i).reverse
          .find(p => p._4 == "view" || p._4 == "click").map(_._4).getOrElse("none")
        (touch, bd(e._5))
      }
    }.toSeq
    val expect = credited.groupBy(_._1).view.mapValues { xs =>
      (xs.size.toLong, xs.map(_._2).sum.toDouble)
    }.toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    expect.foreach { case (t, (n, rev)) =>
      assert(got(t)._1 == n)
      assert(math.abs(got(t)._2 - rev) < 1e-6, s"touch $t")
    }
    // every purchase is credited exactly once
    assert(got.values.map(_._1).sum == ev.count(_._4 == "purchase"))
  }

  test("conversion latency: deciles tile the converting users; bounds match brute force") {
    val got = SparkEntry.queries("q_conv_latency")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    val lat = ev.groupBy(_._1).flatMap { case (u, es) =>
      val v = es.filter(_._4 == "view").map(_._2)
      val p = es.filter(_._4 == "purchase").map(_._2)
      if (v.isEmpty || p.isEmpty) None else {
        val (t1, t2) = (v.min, p.min)
        if (t1.before(t2))
          Some(u -> ((t2.getTime - t1.getTime) * 1000L +
            (t2.getNanos / 1000 % 1000) - (t1.getNanos / 1000 % 1000)))
        else None
      }
    }.toSeq
    val n = lat.size
    val expect = lat.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((_, us), i) => (i.toLong * 10 / n + 1, us) }
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (d, xs) =>
        d -> ((xs.size.toLong, xs.map(_._2).min / 60000000L,
          xs.map(_._2).max / 60000000L))
      }
    assert(got.toSeq == expect && got.nonEmpty)
    assert(got.map(_._2._1).sum == n)
  }

  test("dau/wau: trailing-7 distinct counts match brute force; stickiness in (0,1]") {
    val got = SparkEntry.queries("q_dau_wau")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val epoch = java.time.LocalDate.of(2024, 1, 1)
    val ud = ev.map(e => (java.time.temporal.ChronoUnit.DAYS.between(epoch,
      e._2.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate), e._1)).distinct
    val days = ud.map(_._1).distinct
    assert(got.keySet == days.toSet && got.nonEmpty)
    days.foreach { d =>
      val dau = ud.count(_._1 == d).toLong
      val wau = ud.filter(t => t._1 >= d - 6 && t._1 <= d).map(_._2).distinct.size.toLong
      assert(got(d)._1 == dau && got(d)._2 == wau, s"day $d")
      assert(math.abs(got(d)._3 - dau.toDouble / wau) < 1e-6)
      assert(got(d)._3 > 0.0 && got(d)._3 <= 1.0)
    }
  }

  test("rfm: quintile grid matches driver-side ranking; scores span 1..5") {
    val got = SparkEntry.queries("q_rfm")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val horizon = java.time.LocalDate.of(2024, 1, 31)
    val perUser = ev.groupBy(_._1).map { case (u, es) =>
      val rec = es.map(e => java.time.temporal.ChronoUnit.DAYS.between(
        e._2.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate, horizon)).min
      val mon = es.map(e => BigDecimal(e._5).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum
      (u, rec, es.size.toLong, mon)
    }.toSeq
    val n = perUser.size
    def scores(ordered: Seq[Long]): Map[Long, Long] =
      ordered.zipWithIndex.map { case (u, i) => u -> (i.toLong * 5 / n + 1) }.toMap
    val r = scores(perUser.sortBy(t => (-t._2, t._1)).map(_._1))
    val f = scores(perUser.sortBy(t => (t._3, t._1)).map(_._1))
    val m = scores(perUser.sortBy(t => (t._4, t._1)).map(_._1))
    val expect = perUser.map(t => (r(t._1), f(t._1), m(t._1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expect && got.nonEmpty)
    assert(got.keys.flatMap(k => Seq(k._1, k._2, k._3)).forall(s => s >= 1 && s <= 5))
  }

  test("entry paths: first-3 prefixes and counts match the brute force") {
    val got = SparkEntry.queries("q_entry_paths")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = ev.groupBy(_._1).values.map { es =>
      es.sortBy(e => (e._2.getTime, e._3)).take(3).map(_._4).mkString("->")
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expect && got.nonEmpty)
    assert(got.values.sum == ev.map(_._1).distinct.size)
  }

  test("gini: per-type coefficient matches the rank formula on sorted values") {
    val got = SparkEntry.queries("stats_gini")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expect = ev.groupBy(_._4).view.mapValues { es =>
      val xs = es.sortBy(e => (BigDecimal(e._5).setScale(2,
        BigDecimal.RoundingMode.HALF_UP), e._3)).map(e =>
        BigDecimal(e._5).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      val n = xs.size
      val s0 = xs.sum
      val s1 = xs.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      (n.toLong,
        (2.0 * s1.toDouble - (n + 1) * s0.toDouble) / (n * s0.toDouble))
    }.toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    expect.foreach { case (t, (n, g)) =>
      assert(got(t)._1 == n)
      assert(math.abs(got(t)._2 - g) < 1e-6, s"gini $t")
      assert(got(t)._2 > 0.0 && got(t)._2 < 1.0)
    }
  }

  test("chi2 cells: observed/expected/contribution match the textbook formula") {
    val got = SparkEntry.queries("stats_chi2_cells")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val cells = ev.map(e => (e._4, math.floor(e._5 / 25.0).toLong))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rowTot = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colTot = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum
    assert(got.keySet == cells.keySet && got.nonEmpty)
    cells.foreach { case (k, o) =>
      val e = rowTot(k._1).toDouble * colTot(k._2) / n
      assert(got(k)._1 == o)
      assert(math.abs(got(k)._2 - e) < 1e-6)
      assert(math.abs(got(k)._3 - math.pow(o - e, 2) / e) < 1e-6)
    }
  }

  test("X169: Benford digits match the brute force; sub-1 values get their first significant digit") {
    def digit(v: Double): Long =
      math.floor(v / math.pow(10, math.floor(math.log10(v)))).toLong
    assert(digit(0.5) == 5 && digit(123.4) == 1 && digit(9.99) == 9 && digit(0.001) == 1)
    val got = graft.operators.EventAnalytics.benford(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val counts = ev.filter(_._5 > 0)
      .groupBy(e => (e._4, digit(e._5))).view.mapValues(_.size.toLong).toMap
    assert(got.keySet == counts.keySet && got.nonEmpty)
    val totals = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    got.foreach { case ((ty, d), (n, expN, ratio)) =>
      assert(n == counts((ty, d)))
      assert(got((ty, d))._1 >= 1 && d >= 1 && d <= 9)
      val e = totals(ty).toDouble * math.log10(1.0 + 1.0 / d)
      assert(math.abs(expN - e) < 1e-3 && math.abs(ratio - n / e) < 1e-3)
    }
  }

  test("X166: A/B readout matches the brute-forced md5 split and Welch z") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def arm(u: Long) = if (md5hex(s"ab:$u").take(8) < "80000000") "A" else "B"
    val got = graft.operators.EventAnalytics.abTest(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val byType = ev.groupBy(_._4)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (ty, es) =>
      val (as, bs) = es.partition(e => arm(e._1) == "A")
      def stats(xs: Seq[Double]) = {
        // exact cents like the DECIMAL(18,2) route
        val cents = xs.map(x => BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        val n = xs.size.toDouble
        val sy = cents.sum.toDouble
        val syy = cents.map(c => c * c).sum.toDouble
        (n, sy / n, (n * syy - sy * sy) / (n * n))
      }
      val (na, ma, va) = stats(as.map(_._5))
      val (nb, mb, vb) = stats(bs.map(_._5))
      val (gNa, gNb, gMa, gMb, gZ) = got(ty)
      assert(gNa == na.toLong && gNb == nb.toLong)
      assert(math.abs(gMa - ma) < 1e-4 && math.abs(gMb - mb) < 1e-4)
      assert(math.abs(gZ - (ma - mb) / math.sqrt(va / na + vb / nb)) < 1e-3)
      // both arms populated — the md5 coin is actually balanced-ish
      assert(na > 0 && nb > 0)
    }
  }

  test("X167: cohort LTV is cumulative, per-user-normalized, purchase-only") {
    val got = graft.operators.EventAnalytics.cohortLtv(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val dayZero = java.time.LocalDate.of(2024, 1, 1)
    def wk(t: Timestamp): Long =
      java.time.temporal.ChronoUnit.DAYS.between(
        dayZero, t.toLocalDateTime.toLocalDate) / 7
    val firstWk = ev.groupBy(_._1).view.mapValues(es => es.map(e => wk(e._2)).min).toMap
    val cohortSize = firstWk.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rev = ev.filter(_._4 == "purchase")
      .groupBy(e => (firstWk(e._1), wk(e._2) - firstWk(e._1)))
      .view.mapValues(_.map(e => BigDecimal(e._5)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum).toMap
    assert(got.keySet == rev.keySet && got.nonEmpty)
    got.foreach { case ((c, off), (n, ltv)) =>
      assert(n == cohortSize(c))
      val cum = rev.filter { case ((cc, oo), _) => cc == c && oo <= off }.values.sum
      assert(math.abs(ltv - (cum.toDouble / n)) < 1e-3, s"cohort $c offset $off")
    }
    // cumulative: non-decreasing along each cohort's offsets
    got.keys.groupBy(_._1).foreach { case (c, ks) =>
      val seq = ks.toSeq.sortBy(_._2).map(k => got(k)._2)
      assert(seq.zip(seq.drop(1)).forall { case (x, y) => y >= x - 1e-9 })
    }
  }

  test("X195 auc: matches the all-pairs Mann-Whitney count with half-credit ties") {
    val got = operators.EventAnalytics.aucDaily(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val ev = Tables.events(spark, sf)
      .selectExpr("datediff(to_date(ts), '2024-01-01') AS day",
        "CAST(round(value * 100) AS LONG) AS cents",
        "event_type = 'purchase' AS pos")
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1), r.getBoolean(2)))
    ev.groupBy(_._1).foreach { case (day, rows) =>
      val pos = rows.filter(_._3).map(_._2)
      val neg = rows.filterNot(_._3).map(_._2)
      if (pos.nonEmpty && neg.nonEmpty) {
        // the O(P*N) definition: concordant pairs + half the ties
        val num = (for (p <- pos; n <- neg) yield
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        val expect = num / (pos.length.toLong * neg.length)
        val (np, nq, auc) = got(day)
        assert(np == pos.length && nq == neg.length)
        assert(math.abs(auc - expect) < 1e-6, s"day $day: $auc vs $expect")
      } else assert(!got.contains(day))
    }
  }
}
