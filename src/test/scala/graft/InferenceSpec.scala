package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Graph, Inference, Similarity, TimeSeries}

/** Brute-force driver-side oracles for the inference family
  * (X197-X203): each distributed test statistic is replayed as plain
  * Scala collections over the collected sf0.001 tables. */
class InferenceSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val daily: Map[String, Seq[(Int, Long)]] =
    Tables.events(spark, sf)
      .selectExpr("event_type",
        "datediff(to_date(ts), date '2024-01-01') AS day")
      .groupBy("event_type", "day").count()
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap

  test("mann-kendall: S, var18 and z match the O(n^2) definition") {
    val got = Inference.mannKendallDaily(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got.nonEmpty && got.map(_._1) == got.map(_._1).sorted)
    got.foreach { case (ty, n, s, var18, z, tau) =>
      val xs = daily(ty).map(_._2)
      assert(n == xs.length)
      val pairs = for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield java.lang.Long.signum(xs(j) - xs(i)).toLong
      assert(s == pairs.sum, s"$ty S")
      val tie3 = xs.groupBy(identity).values
        .map(g => g.size.toLong).filter(_ > 1)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      assert(var18 == n * (n - 1) * (2 * n + 5) - tie3, s"$ty var18")
      val sigma = math.sqrt(var18 / 18.0)
      val zExp =
        if (s > 0) (s - 1) / sigma else if (s < 0) (s + 1) / sigma else 0.0
      assert(math.abs(z - zExp) < 1e-4, s"$ty z=$z vs $zExp")
      val tx = xs.groupBy(identity).values
        .map(g => g.size.toLong).map(t => t * (t - 1) / 2).sum
      val d0 = n * (n - 1) / 2
      val tauExp = s / math.sqrt((d0 - tx).toDouble * d0)
      assert(math.abs(tau - tauExp) < 1e-4, s"$ty tau")
    }
  }

  test("spearman: rho matches Pearson on tie-averaged ranks") {
    val got = Inference.spearmanByLang(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val docs = Tables.documents(spark, sf)
      .selectExpr("lang", "cast(n_chars as long)",
        "cast(size(filter(split(text, '\\\\s+'), t -> length(t) > 0)) as long)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (lang, n, rho) =>
      val g = docs.filter(_._1 == lang)
      assert(n == g.length)
      def avgRanks(v: Seq[Long]): Seq[Double] = {
        val sorted = v.sorted
        v.map { x =>
          val lo = sorted.indexOf(x) + 1
          val hi = sorted.lastIndexOf(x) + 1
          (lo + hi) / 2.0
        }
      }
      val rx = avgRanks(g.map(_._2).toSeq)
      val ry = avgRanks(g.map(_._3).toSeq)
      val mx = rx.sum / n
      val my = ry.sum / n
      val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = rx.map(a => (a - mx) * (a - mx)).sum
      val vy = ry.map(b => (b - my) * (b - my)).sum
      val exp = cov / math.sqrt(vx * vy)
      assert(math.abs(rho - exp) < 1e-5, s"$lang rho=$rho vs $exp")
    }
  }

  test("anova: F matches the textbook SSB/SSW on exact cents") {
    val row = Inference.anovaPriority(spark, sf).collect().head
    val (k, n, f) = (row.getLong(0), row.getLong(1), row.getDouble(4))
    val cents = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as long)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = cents.groupBy(_._1)
    assert(k == groups.size && n == cents.length)
    val grand = cents.map(_._2.toDouble).sum / n
    val ssw = groups.values.map { g =>
      val m = g.map(_._2.toDouble).sum / g.size
      g.map(x => (x._2 - m) * (x._2 - m)).sum
    }.sum / 1e4
    val ssb = groups.values.map { g =>
      val m = g.map(_._2.toDouble).sum / g.size
      g.size * (m - grand) * (m - grand)
    }.sum / 1e4
    val fExp = (ssb / (k - 1)) / (ssw / (n - k))
    // the operator reports F at 4 dp
    assert(math.abs(f - fExp) < 1e-4, s"F=$f vs $fExp")
  }

  test("mutual info: cell PMIs match counts, and the total MI is non-negative") {
    val got = Inference.mutualInfoCells(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    val docs = Tables.documents(spark, sf).select("lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val byCell = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byLang = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val bySrc = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(got.length == byCell.size)
    got.foreach { case (l, s, cxy, cx, cy, pmi, mi) =>
      assert(cxy == byCell((l, s)) && cx == byLang(l) && cy == bySrc(s))
      val pmiExp = math.log(n.toDouble * cxy / (cx.toDouble * cy))
      assert(math.abs(pmi - pmiExp) < 1e-4, s"($l,$s) pmi")
      assert(math.abs(mi - 1000.0 * cxy / n * pmiExp) < 1e-3, s"($l,$s) mi")
    }
    // MI = sum of contributions is >= 0 up to rounding slack
    assert(got.map(_._7).sum > -1e-3)
  }

  test("cusum: the walk replays the scaled recurrence; a planted shift alarms") {
    val got = TimeSeries.cusumDaily(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (ty, rows) =>
      val xs = daily(ty)
      val s = xs.map(_._2).sum
      val n = xs.length.toLong
      var up = 0L; var dn = 0L
      val exp = xs.map { case (day, cnt) =>
        up = math.max(0L, up + 100 * n * cnt - 101 * s)
        dn = math.max(0L, dn + 99 * s - 100 * n * cnt)
        (ty, day.toLong, cnt, up, dn,
          if (up > 500 * s) 1L else 0L, if (dn > 500 * s) 1L else 0L)
      }
      assert(rows.sortBy(_._2) == exp, s"$ty walk")
    }
    // planted 2x shift on the back half must raise an upward alarm
    import spark.implicits._
    val base = (1 to 60).map(d => (d, 100L)) ++ (61 to 120).map(d => (d, 200L))
    val planted = base.flatMap { case (d, c) => Seq.fill(c.toInt)(d) }
      .toDF("dayn")
      .selectExpr("'x' AS event_type",
        "timestampadd(DAY, dayn, timestamp '2024-01-01') AS ts")
    val save = planted.cache()
    try {
      // reuse the public entry shape through a temp dir-free invocation:
      // replicate cusum arithmetic on the planted series
      val xs2 = save.selectExpr("datediff(to_date(ts), date '2024-01-01') AS day")
        .groupBy("day").count().collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val s2 = xs2.map(_._2).sum
      val n2 = xs2.length.toLong
      var u = 0L
      var alarmed = false
      xs2.foreach { case (_, c) =>
        u = math.max(0L, u + 100 * n2 * c - 101 * s2)
        if (u > 500 * s2) alarmed = true
      }
      assert(alarmed, "2x level shift must cross the 5-mean-day CUSUM threshold")
    } finally save.unpersist()
  }

  test("label propagation: two planted cliques converge to two labels") {
    import spark.implicits._
    // two 5-cliques bridged by nothing; plus one isolated node
    val c1 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val c2 = for (a <- 10L to 14L; b <- (a + 1) to 14L) yield (a, b)
    val edges = (c1 ++ c2).toDF("a", "b")
    val nodes = ((0L to 4L) ++ (10L to 14L) ++ Seq(99L)).toDF("vec_id")
    val got = Graph.labelPropagationEdges(nodes, edges, iters = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // within each clique everyone adopts the clique minimum
    (0L to 4L).foreach(v => assert(got(v) == 0L, s"clique1 node $v"))
    (10L to 14L).foreach(v => assert(got(v) == 10L, s"clique2 node $v"))
    assert(got(99L) == 99L, "isolated node keeps its own label")
  }

  test("matryoshka: full-width arm overlaps completely; overlap is monotone-ish bounded") {
    val got = Similarity.matryoshkaRecall(Tables.embeddings(spark, sf))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.filter(_._2 == 64L).foreach { case (q, _, ov, rec) =>
      assert(ov == 10L && rec == 1.0, s"query $q full-width overlap")
    }
    got.foreach { case (_, _, ov, rec) =>
      assert(ov >= 0L && ov <= 10L && math.abs(rec - ov / 10.0) < 1e-9)
    }
  }
}
