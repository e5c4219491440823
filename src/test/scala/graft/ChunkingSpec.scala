package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Chunking

class ChunkingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def brute(tokens: Array[String], window: Int, stride: Int): Seq[(Long, Long, String)] = {
    val nc = if (tokens.length <= window) 1
             else 1 + math.ceil((tokens.length - window).toDouble / stride).toInt
    (0 until nc).map { i =>
      val w = tokens.slice(i * stride, i * stride + window)
      (i.toLong, w.length.toLong, w.mkString(" "))
    }
  }

  test("chunks match a brute-force slicer on testdata") {
    val docs = Tables.documents(spark, sf)
    val got = Chunking.chunkTokens(docs, 64, 32).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty))
    assert(texts.nonEmpty)
    val expected = texts.flatMap { case (id, t) =>
      brute(t, 64, 32).map { case (ci, n, body) => (id, ci) -> (n, body) }
    }.toMap
    assert(got == expected)
    // at least one doc long enough to produce overlap
    assert(expected.keys.exists(_._2 > 0), "testdata should force multi-chunk docs")
  }

  test("stride < window overlaps by window - stride tokens; stride == window partitions") {
    import spark.implicits._
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val overlapping = Chunking.chunkTokens(df, 4, 2).collect()
      .sortBy(_.getLong(1)).map(_.getString(3))
    assert(overlapping.toSeq == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    val disjoint = Chunking.chunkTokens(df, 4, 4).collect()
      .sortBy(_.getLong(1)).map(_.getString(3))
    assert(disjoint.toSeq == Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    // every token of the doc appears in some chunk (full coverage)
    assert(overlapping.flatMap(_.split(" ")).toSet == doc.split(" ").toSet)
  }

  test("degenerate inputs: short and empty docs yield exactly one chunk") {
    import spark.implicits._
    val df = Seq((1L, "only three tokens"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val rows = Chunking.chunkTokens(df, 64, 32).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(rows(1L) == ((0L, 3L, "only three tokens")))
    assert(rows(2L) == ((0L, 0L, "")))
    assert(rows(3L) == ((0L, 0L, "")))
  }

  test("chunking is a zero-shuffle plan") {
    val plan = Chunking.chunkTokens(Tables.documents(spark, sf), 64, 32)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
