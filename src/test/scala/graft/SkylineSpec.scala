package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skyline

class SkylineSpec extends AnyFunSuite {
  import SparkTestSession._

  private def brute(rows: Seq[(Long, Double, Double)]): Set[Long] =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, bx, by) =>
        bx <= x && by >= y && (bx < x || by > y)
      }
    }.map(_._1).toSet

  test("skyline equals the quadratic dominance definition on testdata") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey").cast("long"), col("p_retailprice").cast("double"),
        col("p_size").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val got = Skyline.skyline2D(Tables.part(spark, sf),
      "p_partkey", "p_retailprice", "p_size")
      .collect().map(_.getLong(0)).toSet
    assert(got == brute(parts))
  }

  test("ties and duplicates: equal points both survive, strict dominance kills") {
    import spark.implicits._
    val df = Seq(
      (1L, 1.0, 5.0),  // frontier
      (2L, 1.0, 5.0),  // exact duplicate of 1 — must ALSO survive
      (3L, 2.0, 5.0),  // same y, higher x — dominated by 1
      (4L, 1.0, 4.0),  // same x, lower y — dominated by 1
      (5L, 0.5, 2.0),  // frontier (cheaper, smaller)
      (6L, 3.0, 9.0),  // frontier (pricier, bigger)
      (7L, 3.5, 9.0)   // dominated by 6
    ).toDF("id", "price", "size")
    val got = Skyline.skyline2D(df, "id", "price", "size")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L, 6L))
  }

  test("distributivity: the frontier is partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 500).map { i =>
      // deterministic pseudo-random cloud with a known diagonal frontier
      val x = (i * 2654435761L % 1000) / 10.0
      val y = (i * 40503L % 1000) / 10.0
      (i.toLong, x, y)
    }
    val expected = brute(rows)
    Seq(1, 3, 32).foreach { parts =>
      val df = spark.createDataset(rows).toDF("id", "x", "y").repartition(parts)
      val got = Skyline.skyline2D(df, "id", "x", "y").collect().map(_.getLong(0)).toSet
      assert(got == expected, s"frontier changed under $parts partitions")
    }
  }

  test("local prune keeps the merge input tiny") {
    // the scale claim: partition-local sweeps forward only their own
    // frontiers, so the single-task merge sees O(frontier) rows per
    // partition, not the data
    import spark.implicits._
    val rows = (1 to 10000).map { i =>
      val x = (i * 2654435761L % 100000) / 100.0
      val y = (i * 40503L % 100000) / 100.0
      (i.toLong, x, y)
    }
    val df = spark.createDataset(rows).toDF("id", "x", "y").repartition(16)
    val proj = df.select(col("id").cast("long").as("id"),
      col("x").cast("double").as("x"), col("y").cast("double").as("y"))
    val perPartition = proj.sortWithinPartitions(col("x").asc, col("y").desc)
      .mapPartitions { it =>
        var maxY = Double.NegativeInfinity; var kept = 0L; var seen = 0L
        it.foreach { r => seen += 1; if (r.getDouble(2) > maxY) { maxY = r.getDouble(2); kept += 1 } }
        Iterator.single((seen, kept))
      }(org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect()
    val totalKept = perPartition.map(_._2).sum
    val totalSeen = perPartition.map(_._1).sum
    assert(totalSeen == 10000L)
    assert(totalKept < totalSeen / 20,
      s"local frontiers should be tiny: kept $totalKept of $totalSeen")
  }
}
