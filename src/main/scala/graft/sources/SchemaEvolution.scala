package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution ingest (X141): a long-lived dataset's files do not
  * all share one schema — columns get added over time, and the reader
  * must widen old files with NULLs instead of failing or silently
  * dropping data. Spark's native answer is `mergeSchema` on the
  * parquet scan: footers are merged at planning time, each file is
  * read with ITS OWN physical schema, and absent columns materialize
  * as NULL — no rewrite of historical data. (The reference engine
  * scans a single fixed-schema file, main.rs:297; evolution is the
  * capability a growing corpus adds on top.)
  *
  * Scale shape: schema merge cost is per-FOOTER (a driver-side
  * planning step over file metadata, parallelized by Spark for large
  * file counts), not per-row; the scan itself stays columnar with
  * pushdown intact. The verification aggregate is one
  * map-side-combined pass with exact DECIMAL sums. */
object SchemaEvolution {

  /** Write two generations of the same logical dataset (v1: orderkey +
    * quantity; v2 adds price, drops nothing) into one directory, then
    * read it back with mergeSchema and aggregate per generation —
    * the round-trip is result-invisible, which the driver oracle
    * checks against the original table. */
  def ingestEvolved(spark: SparkSession, sfDir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, sfDir)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_evolve_${sfDir.hashCode.abs}"
    // plain v1/v2 dir names — a key=value name would trigger hive
    // partition inference on top of the physical gen column
    li.where(col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_quantity"), lit(1).as("gen"))
      .write.mode("overwrite").parquet(s"$path/v1")
    li.where(col("l_linenumber") === 2)
      .select(col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), lit(2).as("gen"))
      .write.mode("overwrite").parquet(s"$path/v2")
    spark.read.option("mergeSchema", "true").parquet(s"$path/v1", s"$path/v2")
      .groupBy(col("gen").cast("long").as("gen"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("l_extendedprice")).as("n_price"),
        cast2(sum(col("l_quantity").cast("decimal(18,2)"))).as("sum_qty"),
        coalesce(cast2(sum(col("l_extendedprice").cast("decimal(18,2)"))), lit(0.0))
          .as("sum_price"))
      .orderBy(col("gen"))
  }

  private def cast2(c: org.apache.spark.sql.Column) = c.cast("double")
}
