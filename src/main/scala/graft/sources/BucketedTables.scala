package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables: the co-located-join tool for
  * repeated fact-fact joins on the same key.
  *
  * `bucketBy(n, key) + sortBy(key)` at write time persists the hash
  * partitioning into the table layout, so every later equi-join or
  * aggregation on that key runs with ZERO exchange — the shuffle is
  * paid once at ingest instead of per query. At 100 TB this is the
  * difference between re-shuffling the fact table on every join and
  * reading co-located buckets; bucket counts should match across
  * tables that join together (or divide evenly, which Spark can
  * coalesce).
  */
object BucketedTables {

  /** Persist `df` as a bucketed, in-bucket-sorted parquet table.
    * Idempotent across sessions: an in-memory catalog forgets the
    * table between JVMs while its warehouse directory survives, and
    * CREATE refuses a managed-table location that already exists — so
    * drop the catalog entry AND clear any orphaned location first. */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (loc.exists()) rm(loc)
    df.write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two tables bucketed on `key`; with matching bucket counts
    * the plan contains no shuffle exchange. */
  def join(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
