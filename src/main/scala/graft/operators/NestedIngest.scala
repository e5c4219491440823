package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested ingest (R6) + dotted-field flattening (R5).
  *
  * The reference's record shape (reference src/main.rs:18-58) is a log
  * record with two levels of nested structs, a string list, and a
  * struct list:
  *
  *   { doc_id, timestamp, level, message, payload_size, processed,
  *     source: {ip, host, region},
  *     user:   {id, session_id, metrics: {login_time_ms, clicks,
  *              active_time_secs}},
  *     tags:   [String],
  *     answers:[{nx_domain, response_time_ms}] }
  *
  * The reference flattens nested structs to `_`-joined column names at
  * ingest (src/main.rs:120-194) and queries address them with dotted
  * paths (`user.metrics.clicks` → `user_metrics_clicks`,
  * src/main.rs:260-262: `field_name_to_column`).
  *
  * Spark-first design: ingest is `from_json` with an explicit schema
  * (no inference pass — at 100 TB a schema-inference scan is a full
  * extra read), then a purely structural `flatten` that rewrites
  * struct fields as top-level columns. Both are projections: they ride
  * the scan, preserve column pruning (unused nested leaves are never
  * read — parquet nested column pruning), and add zero shuffles.
  */
object NestedIngest {

  /** The LogRecord schema, explicit so ingest never infers. */
  val logRecordSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("timestamp", StringType),
    StructField("level", StringType),
    StructField("message", StringType),
    StructField("payload_size", LongType),
    StructField("processed", BooleanType),
    StructField("source", StructType(Seq(
      StructField("ip", StringType),
      StructField("host", StringType),
      StructField("region", StringType)))),
    StructField("user", StructType(Seq(
      StructField("id", LongType),
      StructField("session_id", StringType),
      StructField("metrics", StructType(Seq(
        StructField("login_time_ms", LongType),
        StructField("clicks", LongType),
        StructField("active_time_secs", DoubleType))))))),
    StructField("tags", ArrayType(StringType)),
    StructField("answers", ArrayType(StructType(Seq(
      StructField("nx_domain", BooleanType),
      StructField("response_time_ms", DoubleType)))))))

  /** R5 inverse direction of InvertedIndex.fieldNameToColumn: flatten
    * every (arbitrarily deep) struct column to `parent_child` leaves.
    * Arrays are left intact (the reference keeps `tags`/`answers` as
    * list columns too). Pure projection — no shuffle, prunable. */
  def flatten(df: DataFrame): DataFrame = {
    def leaves(prefix: String, c: Column, t: DataType): Seq[Column] = t match {
      case s: StructType =>
        s.fields.flatMap(f => leaves(s"${prefix}_${f.name}", c.getField(f.name), f.dataType)).toSeq
      case _ => Seq(c.as(prefix))
    }
    val cols: Seq[Column] = df.schema.fields.toSeq.flatMap {
      case StructField(name, s: StructType, _, _) =>
        s.fields.toSeq.flatMap(f =>
          leaves(s"${name}_${f.name}", col(name).getField(f.name), f.dataType))
      case StructField(name, _, _, _) => Seq(col(name))
    }
    df.select(cols: _*)
  }

  /** R6: parse a JSON-string column against `logRecordSchema` and
    * flatten — the reference's read path (JSON logs → columnar frame,
    * src/main.rs:120-194) as one projection. */
  def ingestJson(df: DataFrame, jsonCol: String): DataFrame =
    flatten(df.select(from_json(col(jsonCol), logRecordSchema).as("r")).select(col("r.*")))

  /** Deterministic LogRecord-shaped JSON derived from the events
    * table — exercises the full round trip (build nested JSON → parse
    * → flatten) with no synthetic inputs outside the driver's
    * testdata. */
  def eventsAsJson(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the whole build-JSON → parse → flatten round trip is per-row
    // scan-stage CPU — spread a single-split scan to session
    // parallelism first (Parallelize.spreadScan; no-op at scale)
    Parallelize.spreadScan(graft.Tables.events(spark, sfDir)).select(to_json(struct(
      $"event_id".as("doc_id"),
      date_format($"ts", "yyyy-MM-dd'T'HH:mm:ss").as("timestamp"),
      $"event_type".as("level"),
      $"props".as("message"),
      floor($"value" * 100).cast("long").as("payload_size"),
      ($"event_id" % 2 === 0).as("processed"),
      struct(
        concat(lit("10.0."), ($"user_id" % 256).cast("string"), lit("."),
               ($"event_id" % 256).cast("string")).as("ip"),
        concat(lit("host-"), ($"user_id" % 50).cast("string")).as("host"),
        element_at(array(lit("us-east"), lit("us-west"), lit("eu-central")),
                   (($"user_id" % 3) + 1).cast("int")).as("region")).as("source"),
      struct(
        $"user_id".as("id"),
        concat(lit("sess-"), $"user_id", lit("-"), $"event_id" % 7).as("session_id"),
        struct(
          ($"event_id" % 5000).as("login_time_ms"),
          ($"event_id" % 37).as("clicks"),
          round($"value", 2).as("active_time_secs")).as("metrics")).as("user"),
      array(concat(lit("t"), $"event_id" % 5), $"event_type").as("tags"),
      array(struct(($"event_id" % 3 === 0).as("nx_domain"),
                   round($"value" / 7, 3).as("response_time_ms"))).as("answers")
    )).as("json"))
  }

  /** The `ingest_nested_json` queries entry: round-trip + aggregate
    * over flattened dotted-path columns, deterministic output. */
  def ingestNestedJson(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val flat = ingestJson(eventsAsJson(spark, sfDir), "json")
    flat.groupBy($"level", $"source_region")
      .agg(count(lit(1)).as("n"),
           sum($"user_metrics_clicks").as("sum_clicks"),
           round(avg($"payload_size"), 4).as("avg_payload"),
           sum(when($"processed", 1L).otherwise(0L)).as("n_processed"))
      .orderBy($"level", $"source_region")
  }
}
