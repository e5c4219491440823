package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: every entrypoint (Verify, Bench, tests)
  * builds its session here so plans run under identical configs.
  *
  * Scale rationale:
  *  - shuffle.partitions sized to cores for local mode (a cluster
  *    deployment overrides via spark-submit; AQE coalesces anyway);
  *  - AQE on: runtime re-plan handles skewed LSH buckets / join skew;
  *  - nanosAsLong: the events table carries TIMESTAMP(NANOS) parquet,
  *    which vanilla Spark 4 rejects; we read nanos as long and
  *    normalize in Tables.events.
  */
object GraftSession {
  def builder(master: Option[String] = None,
              shufflePartitions: Option[String] = None): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession.builder()
      .master(master.getOrElse(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", shufflePartitions.getOrElse(cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // bucketed-table metadata (BucketedTables) lives outside any repo
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
    b
  }

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
