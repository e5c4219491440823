package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup

case class StreamDedupDoc(ts: java.sql.Timestamp, text: String)

class StreamingDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private type Doc = StreamDedupDoc
  private val Doc = StreamDedupDoc
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("L1 streaming twin: duplicates within the watermark horizon are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.exactWithinWatermark(input.toDF(), watermark = "2 hours")
      .writeStream.format("memory").queryName("graft_stream_dedup")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(ts("2024-01-01 10:00:00"), "alpha"),
        Doc(ts("2024-01-01 10:01:00"), "alpha"),   // in-batch dup
        Doc(ts("2024-01-01 10:02:00"), "beta"))
      q.processAllAvailable()
      input.addData(Doc(ts("2024-01-01 10:30:00"), "alpha")) // cross-batch dup
      q.processAllAvailable()
      val texts = spark.table("graft_stream_dedup").as[Doc].collect().map(_.text)
      assert(texts.sorted.toSeq == Seq("alpha", "beta"),
        s"expected one alpha and one beta, got ${texts.mkString(",")}")
    } finally q.stop()
  }

  test("L2 streaming twin: near-dup pair dedups within the horizon, revives beyond it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val common = (1 to 19).map(i => s"word$i").mkString(" ")
    val original = common + " alpha"
    val nearDup = common + " beta"    // 1 of 20 tokens differs: j ≈ 0.89
    val distinct = (1 to 20).map(i => s"other$i").mkString(" ")

    val stateDir = java.nio.file.Files.createTempDirectory("graft_lsh_state").toString
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = graft.streaming.StreamingDedup.nearDupForeachBatch(
      input.toDF().toDF("doc_id", "ts", "text"), stateDir,
      horizonMinutes = 60, threshold = 0.8) { out =>
      emitted ++= out.collect().map(r => (r.getLong(0), r.getString(2)))
    }
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), original))
      q.processAllAvailable()
      assert(emitted.map(_._1).toSeq == Seq(1L), "original must be emitted")

      // near-dup 30 min later (inside horizon) suppressed; distinct kept
      input.addData(
        (2L, ts("2024-01-01 10:30:00"), nearDup),
        (3L, ts("2024-01-01 10:31:00"), distinct))
      q.processAllAvailable()
      assert(emitted.map(_._1).toSet == Set(1L, 3L),
        s"near-dup inside horizon must be suppressed: ${emitted.map(_._1)}")

      // same near-dup 2 hours later: the original aged out of the
      // horizon, so it no longer suppresses
      input.addData((4L, ts("2024-01-01 12:31:00"), nearDup))
      q.processAllAvailable()
      assert(emitted.map(_._1).toSet == Set(1L, 3L, 4L),
        s"beyond the horizon the pair must revive: ${emitted.map(_._1)}")
    } finally q.stop()
  }

  test("streaming signature dedup drops shingle-set-identical docs within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = graft.streaming.StreamingDedup.signatureWithinWatermark(
        input.toDF().toDF("doc_id", "ts", "text"), watermark = "2 hours")
      .writeStream.format("memory").queryName("graft_stream_sigdedup")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "one two three four five six"),
        // same shingle set ⇒ same full signature — caught with one
        // 8-byte state key per doc, no text in state
        (2L, ts("2024-01-01 10:05:00"), "one two three four five six"),
        (3L, ts("2024-01-01 10:06:00"), "totally different content here now"))
      q.processAllAvailable()
      val ids = spark.table("graft_stream_sigdedup")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("near-dup replay of a batch after a simulated crash recovers (at-least-once)") {
    import spark.implicits._
    val common = (1 to 19).map(i => s"word$i").mkString(" ")
    val original = common + " alpha"
    val nearDup = common + " beta"
    val inBatchDup = common + " gamma"
    val stateDir = java.nio.file.Files.createTempDirectory("graft_lsh_replay").toString
    val emitted = scala.collection.mutable.ArrayBuffer[Long]()
    def run(batchId: Long, rows: (Long, String, String)*): Unit = {
      val df = rows.toSeq.toDF("doc_id", "s", "text")
        .select($"doc_id", $"s".cast("timestamp").as("ts"), $"text")
      graft.streaming.StreamingDedup.processBatch(df, batchId, stateDir,
        "text", "doc_id", "ts", horizonMinutes = 60, threshold = 0.8,
        numHashes = 128, bands = 16, shingleSize = 3, maxBucket = 100,
        sink = out => emitted ++= out.collect().map(_.getLong(0)))
    }
    run(0L, (1L, "2024-01-01 10:00:00", original))
    assert(emitted.toSeq == Seq(1L))
    // batch 1: one dup-vs-state (suppressed), one in-batch near-dup
    // pair (lowest id wins — exact-Jaccard verified), one distinct
    run(1L,
      (2L, "2024-01-01 10:30:00", nearDup),
      (3L, "2024-01-01 10:31:00", (1 to 20).map(i => s"other$i").mkString(" ")),
      (4L, "2024-01-01 10:32:00", inBatchDup))
    assert(emitted.toSet == Set(1L, 3L),
      s"dup-vs-state AND in-batch near-dups must be suppressed: $emitted")
    // simulated crash AFTER the state write of batch 1 but BEFORE the
    // checkpoint commit: the batch replays with the same id. Pre-fix
    // this wedged ('Cannot overwrite a path that is also being read
    // from' — the replay picked v1 as its own prior); post-fix the
    // replay re-reads v0, re-suppresses, re-emits (at-least-once).
    emitted.clear()
    run(1L,
      (2L, "2024-01-01 10:30:00", nearDup),
      (3L, "2024-01-01 10:31:00", (1 to 20).map(i => s"other$i").mkString(" ")),
      (4L, "2024-01-01 10:32:00", inBatchDup))
    assert(emitted.toSet == Set(3L), s"replay must reproduce batch 1: $emitted")
    // next batch reads the replayed v1 state: 1 and 3 still suppress
    emitted.clear()
    run(2L,
      (5L, "2024-01-01 10:40:00", nearDup),
      (6L, "2024-01-01 10:41:00", "completely unrelated fresh content"))
    assert(emitted.toSet == Set(6L), s"state after replay must still suppress: $emitted")
  }

  test("L1 streaming twin: exactForever dedups across unbounded time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.exactForever(input.toDF())
      .writeStream.format("memory").queryName("graft_stream_dedup_forever")
      .outputMode("append").start()
    try {
      input.addData(Doc(ts("2024-01-01 10:00:00"), "x"))
      q.processAllAvailable()
      input.addData(Doc(ts("2024-06-01 10:00:00"), "x"), // months later, still dup
        Doc(ts("2024-06-01 10:00:00"), "y"))
      q.processAllAvailable()
      val texts = spark.table("graft_stream_dedup_forever").as[Doc].collect().map(_.text)
      assert(texts.sorted.toSeq == Seq("x", "y"))
    } finally q.stop()
  }
}
