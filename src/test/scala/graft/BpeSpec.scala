package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Independent in-memory BPE trainer: symbol sequences as vectors,
    * greedy left-to-right non-overlapping merge application. */
  private def bruteBpe(words: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (i <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (seq, wt) =>
        seq.indices.dropRight(1).foreach { j =>
          val k = (seq(j), seq(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + wt
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((i, l, r, c))
        vocab = vocab.map { case (seq, wt) =>
          val b = Vector.newBuilder[String]
          var j = 0
          while (j < seq.length) {
            if (j + 1 < seq.length && seq(j) == l && seq(j + 1) == r) {
              b += (l + r); j += 2
            } else { b += seq(j); j += 1 }
          }
          (b.result(), wt)
        }
      }
    }
    out.toSeq
  }

  test("BPE merges equal the brute-force trainer, including greedy overlap handling") {
    import spark.implicits._
    // 'aaaa' pins non-overlapping greedy semantics: after merge (a,a),
    // it must re-pair as [aa][aa], NOT [aa][a][a]
    val corpus = Seq(
      "low low low lower lowest aaaa aaaa",
      "new newer newest low aaaa",
      "wider wide new")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val words = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val expect = bruteBpe(words, 8)
    val got = Bpe.trainMerges(df, numMerges = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got == expect, s"\ngot:    $got\nexpect: $expect")
    // merged column is the concatenation
    Bpe.trainMerges(df, numMerges = 3).collect().foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
    }
  }

  test("applyMerges token counts equal brute-force greedy application") {
    import spark.implicits._
    val corpus = Seq("low low lower aaaa", "newest aaaa lowest", "aaaa aaaa new")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val words = corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val merges = bruteBpe(words, 6).map(m => (m._2, m._3))
    def applyAll(w: String): Int = {
      var seq = w.map(_.toString).toVector
      merges.foreach { case (l, r) =>
        val b = Vector.newBuilder[String]
        var j = 0
        while (j < seq.length) {
          if (j + 1 < seq.length && seq(j) == l && seq(j + 1) == r) { b += (l + r); j += 2 }
          else { b += seq(j); j += 1 }
        }
        seq = b.result()
      }
      seq.length
    }
    val expect = corpus.zipWithIndex.map { case (t, i) =>
      val ws = t.split("\\s+").filter(_.nonEmpty)
      (i.toLong, ws.length.toLong, ws.map(applyAll).sum.toLong)
    }.toSet
    val got = graft.operators.Bpe.trainAndEncode(df, numMerges = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"\ngot:    $got\nexpect: $expect")
  }

  test("BPE trainer stops cleanly when the vocabulary is exhausted") {
    import spark.implicits._
    // single-char words have no pairs at all -> zero merges
    val df = Seq((1L, "a b c a")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(df, numMerges = 5).count() == 0L)
    // one two-char word yields exactly one merge then exhausts
    val df2 = Seq((1L, "ab a b")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(df2, numMerges = 5).collect()
    assert(m.length == 1 && m(0).getString(3) == "ab")
  }
}
