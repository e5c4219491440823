package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Quantization, Similarity}

class QuantizationSpec extends AnyFunSuite {
  import SparkTestSession._

  private def emb = Tables.embeddings(spark, sf)

  test("codes are bounded int8 and dequantization error is within scale/2 per element") {
    val rows = Quantization.quantizeInt8(emb).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getSeq[Double](1)
      val scale = r.getDouble(3)
      val q = r.getSeq[Int](4)
      assert(q.forall(c => c >= -127 && c <= 127))
      e.zip(q).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-12,
          s"vec ${r.getLong(0)}: |$x - $c*$scale| exceeds scale/2")
      }
    }
  }

  test("cosine retention of int8 is near-unity on the testdata distribution") {
    val rets = Quantization.quantizeSummary(emb).collect().map(_.getDouble(4))
    assert(rets.forall(_ >= 0.999), s"min retention ${rets.min}")
  }

  test("zero vectors quantize to all-zero codes with zero scale") {
    import spark.implicits._
    val df = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, -2f, 0.5f)))
      .toDF("vec_id", "embedding")
    val byId = Quantization.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getSeq[Int](4))).toMap
    assert(byId(1L) == ((0.0, Seq(0, 0, 0))))
    val (s2, q2) = byId(2L)
    assert(q2 == Seq(64, -127, 32) && math.abs(s2 - 2.0 / 127) < 1e-12)
  }

  test("int8 ANN keeps high recall vs float32 exact top-k") {
    val queries = emb.where(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(queries, emb, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val int8 = Similarity.bruteForceTopK(
        Quantization.dequantized(queries), Quantization.dequantized(emb), 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exact.map { case (q, ids) =>
      int8(q).intersect(ids).size.toDouble / ids.size
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, s"avg recall@10 $avg below 0.9")
  }

  test("quantization is a zero-shuffle per-row transform") {
    val plan = Quantization.quantizeSummary(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization must not shuffle:\n$plan")
  }
}
