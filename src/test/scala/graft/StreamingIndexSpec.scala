package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.InvertedIndex
import graft.streaming.StreamingIndex

class StreamingIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs = Tables.documents(spark, sf)

  private def canon(df: DataFrame) = df
    .select(col("value"), col("chunk"), col("doc_ids"), col("n_docs"))
    .collect()
    .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2), r.getLong(3))).toSet

  test("incrementally maintained index equals a batch rebuild after every commit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_idx").toString
    val batches = Seq(
      docs.where(col("doc_id") % 3 === 0),
      docs.where(col("doc_id") % 3 === 1),
      docs.where(col("doc_id") % 3 === 2))
    var seen = docs.where(lit(false))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingIndex.processBatch(b, i.toLong, dir, "source", 100L, "doc_id", _ => ())
      seen = seen.unionByName(b)
      assert(canon(StreamingIndex.currentIndex(spark, dir)) ==
        canon(InvertedIndex.fieldValuesChunked(seen, "source", chunkSize = 100)),
        s"after batch $i the maintained index must equal the rebuild")
    }
  }

  test("replaying a batch after a simulated crash reproduces the same index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_idx_replay").toString
    val b0 = docs.where(col("doc_id") < 200)
    val b1 = docs.where(col("doc_id") >= 200 && col("doc_id") < 400)
    StreamingIndex.processBatch(b0, 0L, dir, "source", 100L, "doc_id", _ => ())
    StreamingIndex.processBatch(b1, 1L, dir, "source", 100L, "doc_id", _ => ())
    val committed = canon(StreamingIndex.currentIndex(spark, dir))
    // crash-replay of batch 1: it must read v0 (strictly below 1), not
    // its own v1 output, and commit an identical index
    StreamingIndex.processBatch(b1, 1L, dir, "source", 100L, "doc_id", _ => ())
    assert(canon(StreamingIndex.currentIndex(spark, dir)) == committed,
      "a replayed batch must be idempotent on the store")
  }

  test("as-of read returns the snapshot a reader at that version saw") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_idx_asof").toString
    val batches = Seq(
      docs.where(col("doc_id") % 3 === 0),
      docs.where(col("doc_id") % 3 === 1),
      docs.where(col("doc_id") % 3 === 2))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingIndex.processBatch(b, i.toLong, dir, "source", 100L, "doc_id", _ => ())
    }
    // version 1 = batches 0..1; pruning keeps it alongside current
    val asOf = canon(StreamingIndex.indexAsOf(spark, dir, version = 1))
    val rebuild = canon(InvertedIndex.fieldValuesChunked(
      docs.where(col("doc_id") % 3 =!= 2), "source", chunkSize = 100))
    assert(asOf == rebuild)
    assert(canon(StreamingIndex.indexAsOf(spark, dir, version = 99)) ==
      canon(StreamingIndex.currentIndex(spark, dir)),
      "as-of past the head reads the current snapshot")
  }

  test("maintenance loop runs end-to-end on a real stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_idx_e2e").toString
    val q = StreamingIndex.fieldValuesForeachBatch(stream, dir, "source")()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "a"))
      q.processAllAvailable()
      val idx = StreamingIndex.currentIndex(spark, dir).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](2)).toMap
      assert(idx("a") == Seq(1L, 3L) && idx("b") == Seq(2L))
    } finally q.stop()
  }
}
