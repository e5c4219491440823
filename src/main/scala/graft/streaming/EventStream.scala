package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-streaming surface (L13): the streaming twin of the batch
  * tumbling-window aggregation (Relational.timeWindow / C9). One
  * transform serves both: batch calls it on a static frame, streaming
  * on a readStream frame with a watermark bounding state.
  *
  * Scale design: the watermark is what makes this run forever on a
  * cluster — window state for (window, event_type) groups is dropped
  * once the watermark passes the window end, so state size is
  * O(active windows × event types), independent of stream length.
  */
object EventStream {

  /** Tumbling daily window counts/sums per event type. `df` may be
    * static or streaming; the watermark only binds in streaming
    * plans (Spark ignores it on batch frames). */
  def windowedCounts(df: DataFrame, watermark: String = "1 hour"): DataFrame =
    df.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))
}
