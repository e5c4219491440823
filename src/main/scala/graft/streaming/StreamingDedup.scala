package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication (L1's streaming twin).
  *
  * Keyed on the 128-bit content hash so the state store holds hashes,
  * not documents. With a watermark + event-time column in the key-set
  * handled via `dropDuplicatesWithinWatermark`, state for hashes older
  * than the watermark is dropped — bounded state on an unbounded
  * stream, which is the only honest way to run exact dedup forever.
  * `exactForever` keeps hashes indefinitely (exactly-once dedup across
  * all time) — correct, but state grows with distinct documents; use
  * the watermarked form unless the key space is known-bounded.
  */
object StreamingDedup {

  /** Dedup within the watermark horizon: a duplicate arriving within
    * `watermark` of the original is dropped; state is evicted after. */
  def exactWithinWatermark(stream: DataFrame, textCol: String = "text",
                           tsCol: String = "ts",
                           watermark: String = "1 hour"): DataFrame =
    stream.withColumn("__h", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Dedup across all time: state holds every distinct content hash. */
  def exactForever(stream: DataFrame, textCol: String = "text"): DataFrame =
    stream.withColumn("__h", md5(col(textCol)))
      .dropDuplicates("__h")
      .drop("__h")
}
