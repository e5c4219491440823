package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the driver-generated TPC-H-ish tables.
  *
  * The reference engine scans one clustered parquet file lazily
  * (reference: src/main.rs:297 `LazyFrame::scan_parquet`); the Spark
  * analog is `spark.read.parquet`, which gives Catalyst the scan to
  * push filters/projections into.
  */
object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Event-time normalization to session-TZ (UTC) TIMESTAMP — the
    * type every event-time operator (unix_micros, watermarks, window)
    * expects — from whichever physical type the driver-generated
    * parquet carries:
    *  - TIMESTAMP(NANOS): under spark.sql.legacy.parquet.nanosAsLong
    *    (set by GraftSession) it scans as Long nanos; integral DIV,
    *    not `/` — epoch nanos (~1.7e18) exceed a double's 2^53
    *    mantissa, so float division silently loses microseconds;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): scans as
    *    TIMESTAMP_NTZ; the cast reinterprets the wall clock in the
    *    session TZ, which GraftSession pins to UTC — value-preserving
    *    on epoch micros and identical to DuckDB's naive reading.
    * Column pruning/pushdown still reach the scan untouched. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case Some(TimestampNTZType) => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(table(spark, sfDir, "events"))
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
