package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EmbeddingStats

class EmbeddingStatsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def emb = Tables.embeddings(spark, sf)

  test("graft_vec_sum equals the posexplode formulation exactly") {
    val viaAgg = emb.groupBy(col("label"))
      .agg(call_function("graft_vec_sum", col("embedding")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toVector).toMap
    val viaExplode = emb
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col").cast("double")).as("x"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    viaAgg.foreach { case (l, v) =>
      v.indices.foreach { i =>
        // same doubles, possibly different add order: exact for the
        // float32-valued testdata at any realistic tolerance
        assert(math.abs(v(i) - viaExplode((l, i))) < 1e-9, s"label $l pos $i")
      }
    }
  }

  test("graft_vec_sum is partitioning-invariant and null-safe") {
    import spark.implicits._
    val df = Seq((1, Some(Array(1.0f, 2.0f))), (1, Some(Array(3.0f, 4.0f))),
        (1, None), (2, Some(Array(0.5f, -0.5f))))
      .toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("g")).agg(call_function("graft_vec_sum", col("v")).as("s"))
        .collect().map(r => r.getInt(0) -> Option(r.getSeq[Double](1)).map(_.toVector)).toMap
    val a = run(df.repartition(1))
    val b = run(df.repartition(5))
    assert(a == b)
    assert(a(1).get == Vector(4.0, 6.0), "null vectors are skipped, not zeroed")
    assert(a(2).get == Vector(0.5, -0.5))
  }

  test("X144: drift cosine matches a driver-side half-centroid recompute") {
    val got = EmbeddingStats.centroidDrift(emb).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val rows = emb.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    def centroid(vs: Seq[Array[Double]]): Array[Double] = {
      val s = vs.reduce((a, b) => a.zip(b).map(t => t._1 + t._2))
      s.map(x => BigDecimal(x / vs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map(t => t._1 * t._2).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byLabel = rows.groupBy(_._2)
    assert(got.keySet == byLabel.keySet && got.nonEmpty)
    byLabel.foreach { case (l, vs) =>
      val a = vs.filter(_._1 % 2 == 0).map(_._3).toSeq
      val b = vs.filter(_._1 % 2 == 1).map(_._3).toSeq
      assert(got(l)._1 == a.size && got(l)._2 == b.size)
      // sf0.001's 2-3-vector halves can even be negatively aligned —
      // the oracle is the recompute, not a sign assumption
      assert(math.abs(got(l)._3 - cos(centroid(a), centroid(b))) < 2e-4, s"label $l")
    }
  }

  test("centroid cosine: own-label mean scores higher than a foreign centroid on average") {
    val cents = EmbeddingStats.groupCentroids(emb).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    assert(cents.values.forall(_.length == 64))
    val got = EmbeddingStats.centroidCosine(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.length == emb.count())
    // brute check a few rows against a driver-side recomputation
    val vecs = emb.limit(20).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getSeq[Float](1).map(_.toDouble).toArray))).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    got.filter(t => vecs.contains(t._1)).foreach { case (id, l, c) =>
      val (lbl, v) = vecs(id)
      assert(lbl == l)
      assert(math.abs(c - BigDecimal(cos(v, cents(l)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-9, s"vec $id")
    }
  }

  test("X161: covariance matrix equals the brute force over quantized components") {
    val emb = Tables.embeddings(spark, sf)
    val vecs = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => BigDecimal(x.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray)
    val d = vecs.head.length
    val n = vecs.length.toDouble
    val got = graft.operators.EmbeddingStats.covarianceMatrix(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == d * (d + 1) / 2, "one row per unordered dim pair")
    // exact integer sums brute-forced, then the identical double formula
    val sx = Array.tabulate(d)(i => vecs.map(_(i)).sum)
    for (i <- 0 until d; j <- i until d if (i * 31 + j) % 97 < 6) { // sampled pairs
      val sxy = vecs.map(v => v(i) * v(j)).sum
      val expect = BigDecimal((n * sxy - sx(i) * sx(j)) / (n * n * 1e12))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got((i.toLong, j.toLong)) - expect) <= 1e-12, s"cov($i,$j)")
    }
    // diagonal entries are variances: non-negative
    (0 until d).foreach(i => assert(got((i.toLong, i.toLong)) >= 0.0))
  }

  test("X163: pc1 projection equals a driver-side double power iteration within rounding") {
    val emb = Tables.embeddings(spark, sf)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val d = vecs.head._2.length
    val n = vecs.size.toDouble
    // plain-double covariance + power iteration (no quantization) —
    // the operator's integer pipeline must land within quantization
    // distance of the analytic result
    val mean = Array.tabulate(d)(i => vecs.values.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      vecs.values.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n)
    var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    (1 to 8).foreach { _ =>
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
    }
    val got = graft.operators.EmbeddingStats.pcaProjection(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == vecs.size)
    vecs.foreach { case (id, x) =>
      val expect = (0 until d).map(i => x(i) * v(i)).sum
      assert(math.abs(got(id) - expect) < 1e-3,
        s"vec $id: got ${got(id)}, analytic $expect")
    }
    // the projection is non-degenerate: spread across vectors
    assert(got.values.toSet.size > vecs.size / 10)
  }

  test("X196 abtt: c1/residual match an exact integer recompute; energy decomposes") {
    val emb = Tables.embeddings(spark, sf)
    val got = EmbeddingStats.allButTop(emb).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val m = EmbeddingStats.topLoadings(emb, 8, "embedding", "vec_id").get
    val vecs = emb.selectExpr("CAST(vec_id AS LONG)", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val d = m.length
    val n = vecs.size.toLong
    // the operator's own quantization chain, recomputed independently
    def q6(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val sx = Array.tabulate(d)(i => vecs.values.map(v => BigInt(q6(v(i)))).sum)
    val muq = Array.tabulate(d) { i =>
      val a = (sx(i).abs * 2 + n) / (2 * n)
      (if (sx(i) < 0) -a else a).toLong
    }
    val b = m.map(x => BigInt(x) * BigInt(x)).sum.toDouble
    assert(got.size == vecs.size)
    vecs.foreach { case (id, v) =>
      val yq = Array.tabulate(d)(i => q6(v(i)) - muq(i))
      val dot = yq.zip(m).map { case (y, mi) => y * mi }.sum
      val n2 = yq.map(y => y * y).sum
      val c1 = dot.toDouble * 1000.0 / b
      val resid = math.sqrt(math.max(n2.toDouble / 1e12 - c1 * c1 * b / 1e18, 0.0))
      val (gc, gr) = got(id)
      assert(math.abs(gc - c1) < 1e-4 + 1e-9, s"vec $id c1: $gc vs $c1")
      assert(math.abs(gr - resid) < 1e-4 + 1e-9, s"vec $id resid: $gr vs $resid")
      // Pythagoras: removed energy + residual energy == centered norm
      // (tolerance covers the 4-dp output rounding: d(r^2) ~ 2r*5e-5)
      assert(gr * gr + c1 * c1 * b / 1e18 <= n2.toDouble / 1e12 + 5e-4)
    }
  }
}
