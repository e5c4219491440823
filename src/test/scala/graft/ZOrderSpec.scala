package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.expr.ZOrderKernels
import graft.sources.ClusteredParquet
import java.nio.file.Files

class ZOrderSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val tmp = Files.createTempDirectory("graft-zorder").toString

  /** Naive reference: place bit i of a at 2i, bit i of b at 2i+1. */
  private def naiveInterleave(a: Long, b: Long): Long = {
    var r = 0L
    for (i <- 0 until 32) {
      r |= ((a >>> i) & 1L) << (2 * i)
      r |= ((b >>> i) & 1L) << (2 * i + 1)
    }
    r
  }

  test("kernel matches a naive bit loop on edges and random values") {
    val edges = Seq(0L, 1L, 2L, 0x7FFFFFFFL, 0xFFFFFFFFL, 0x12345678L)
    val rnd = new scala.util.Random(7)
    val samples = edges ++ Seq.fill(200)(rnd.nextLong() & 0xFFFFFFFFL)
    for (a <- samples.take(30); b <- samples.take(30))
      assert(ZOrderKernels.interleave2(a, b) == naiveInterleave(a, b), s"($a, $b)")
    // inputs beyond 32 bits are taken mod 2^32
    assert(ZOrderKernels.interleave2(0x1FFFFFFFFL, 0L) ==
      ZOrderKernels.interleave2(0xFFFFFFFFL, 0L))
  }

  test("z-order key is monotone in box containment (prefix property on quadrants)") {
    // all points of the lower-left quadrant sort before any point of
    // the upper-right quadrant — the property pruning relies on
    val lo = for (a <- 0L until 8L; b <- 0L until 8L) yield ZOrderKernels.interleave2(a, b)
    val hi = for (a <- 8L until 16L; b <- 8L until 16L) yield ZOrderKernels.interleave2(a, b)
    assert(lo.max < hi.min)
  }

  test("graft_zorder SQL function evaluates the kernel") {
    val r = spark.sql("SELECT graft_zorder(CAST(5 AS BIGINT), CAST(3 AS BIGINT)) AS z")
      .collect().head.getLong(0)
    assert(r == ZOrderKernels.interleave2(5L, 3L))
  }

  test("z-ordered layout prunes a 2-d box at least as well as a 1-d sort, and is correct") {
    // dimensions of comparable, large cardinality (partkey 0..199,
    // orderkey 0..~1500 at sf0.001) — the regime z-order is FOR; a
    // degenerate dimension (e.g. 10-value l_suppkey) adds no
    // information to the curve and only coarsens the other dimension
    val li = Tables.lineitem(spark, sf)
    val boxFilter = col("l_partkey").between(20, 59) && col("l_orderkey").between(100, 399)
    val zPath = s"$tmp/z"
    val onedPath = s"$tmp/oned"
    ClusteredParquet.writeZOrdered(li, zPath, "l_partkey", "l_orderkey",
      numFiles = 4, rowGroupBytes = 1024)
    // baseline: same data clustered on l_partkey only
    ClusteredParquet.write(li, onedPath, "l_partkey", numFiles = 4, rowGroupBytes = 1024)

    val total = li.count()
    val zScan = ClusteredParquet.scanOutputRows(
      ClusteredParquet.read(spark, zPath).where(boxFilter))
    val onedScan = ClusteredParquet.scanOutputRows(
      ClusteredParquet.read(spark, onedPath).where(boxFilter))
    assert(zScan < total / 2, s"z-order should prune most row groups ($zScan of $total)")
    assert(zScan <= onedScan,
      s"2-d box: z-order ($zScan rows) must not scan more than 1-d layout ($onedScan rows)")

    // result correctness vs a direct filter on the source table
    val expect = li.where(boxFilter).select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = ClusteredParquet.read(spark, zPath).where(boxFilter)
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(expect.nonEmpty && got == expect)
    // and the 2-d pruning is genuinely better than 1-d, not just a tie.
    // Margin is deliberately loose: repartitionByRange samples its
    // boundaries with an RDD-id-dependent seed, so the exact row-group
    // layout (and the pruned-row counts) shifts a few percent with how
    // many RDDs earlier suites created — observed 760-1000 rows for
    // zScan across suite orderings against a ~1300-row 1-d baseline.
    assert(zScan < (onedScan * 9) / 10,
      s"z-order ($zScan) should prune well beyond the 1-d layout ($onedScan)")
  }

  test("hilbert kernel is a bijection whose consecutive keys are grid neighbors") {
    // exhaustively over the first 2^16 curve positions of the 2^24
    // grid: d -> (x,y) inverts back, and d, d+1 are manhattan-adjacent
    var d = 0L
    var prev = ZOrderKernels.hilbertInverse(0L)
    assert(ZOrderKernels.hilbert2(prev._1, prev._2) == 0L)
    while (d < 65535L) {
      val next = ZOrderKernels.hilbertInverse(d + 1)
      assert(ZOrderKernels.hilbert2(next._1, next._2) == d + 1, s"xy2d(d2xy(${d + 1}))")
      val manhattan = math.abs(next._1 - prev._1) + math.abs(next._2 - prev._2)
      assert(manhattan == 1, s"positions $d and ${d + 1} are not adjacent")
      prev = next
      d += 1
    }
    // coordinates beyond the order are taken mod 2^24 like the Z path
    assert(ZOrderKernels.hilbert2(1L << 24 | 5L, 3L) == ZOrderKernels.hilbert2(5L, 3L))
  }

  test("graft_hilbert SQL function evaluates the kernel") {
    val r = spark.sql("SELECT graft_hilbert(CAST(5 AS BIGINT), CAST(3 AS BIGINT)) AS h")
      .collect().head.getLong(0)
    assert(r == ZOrderKernels.hilbert2(5L, 3L))
  }

  test("hilbert layout prunes the 2-d box and matches the source-table result") {
    val li = Tables.lineitem(spark, sf)
    val boxFilter = col("l_partkey").between(20, 59) && col("l_orderkey").between(100, 399)
    val hPath = s"$tmp/h"
    ClusteredParquet.writeHilbert(li, hPath, "l_partkey", "l_orderkey",
      numFiles = 4, rowGroupBytes = 1024)
    val total = li.count()
    val hScan = ClusteredParquet.scanOutputRows(
      ClusteredParquet.read(spark, hPath).where(boxFilter))
    assert(hScan < total / 2, s"hilbert should prune most row groups ($hScan of $total)")
    val expect = li.where(boxFilter).select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = ClusteredParquet.read(spark, hPath).where(boxFilter)
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(expect.nonEmpty && got == expect)
  }
}
