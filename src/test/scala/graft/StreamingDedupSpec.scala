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
