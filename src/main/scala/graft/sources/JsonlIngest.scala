package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-on-read JSONL ingestion with corrupt-record accounting — the
  * raw-log half of the ingest surface (NestedIngest handles the
  * known-schema nested case; this handles line-delimited feeds where
  * malformed lines are a fact of life).
  *
  * Always reads with an EXPLICIT schema: schema inference is its own
  * full pass over the data (doubling the 100 TB scan) and can silently
  * widen types between runs. Malformed lines land in
  * `_corrupt_record` under PERMISSIVE mode instead of failing the job
  * — the standard quarantine-and-count pattern: the pipeline reports
  * corruption instead of either crashing (FAILFAST) or silently
  * dropping (DROPMALFORMED).
  */
object JsonlIngest {

  val CorruptCol = "_corrupt_record"

  /** Read a JSONL directory with `schema` plus corrupt capture. The
    * returned frame is cached: Spark (correctly) refuses plans that
    * touch ONLY the corrupt column of an unparsed source, and the
    * cache also keeps the clean/corrupt split to one parse pass. */
  def readWithCorruptCapture(spark: SparkSession, path: String,
                             schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()

  /** The `ingest_jsonl` queries entry: round-trip the events table
    * through line-delimited JSON, inject three known-malformed lines,
    * read back with the explicit schema, and roll up per event type —
    * clean rows aggregated, corrupt rows counted under a sentinel
    * `__corrupt` type. Proves the full path: distributed JSONL write,
    * schema-on-read parse, permissive quarantine, aggregation over the
    * parsed columns. */
  def ingestEntry(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .write.mode("overwrite").json(tmp)
    // malformed lines appended as extra part files in the same dir
    Seq("{\"event_id\": oops", "not json at all", "{\"value\": }")
      .toDS().write.mode("append").text(tmp)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val read = readWithCorruptCapture(spark, tmp, schema)
    val clean = read.where(col(CorruptCol).isNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
    val corrupt = read.where(col(CorruptCol).isNotNull)
      .agg(count(lit(1)).as("__n"))
      .select(lit("__corrupt").as("event_type"), col("__n").as("n"),
        lit(0.0).as("sum_value"))
    clean.union(corrupt).orderBy(col("event_type"))
  }
}
