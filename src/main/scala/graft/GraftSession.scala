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
              shufflePartitions: Option[String] = None,
              lowMemory: Boolean = false): SparkSession.Builder = {
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
    if (lowMemory) (lowMemoryConfs ++ lowMemoryBuildConfs)
      .foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
    else b
  }

  /** The reference DSL's `low_memory` flag (reference src/main.rs:275,
    * 699 — Polars' streaming scan) mapped to its Spark analog: Spark
    * already streams batches through operators and spills, so "low
    * memory" here means smaller units of everything that IS sized by
    * config — scan splits, reader batches, shuffle fan-in, broadcast
    * ceilings — trading task-count overhead for a lower per-task
    * footprint. All SQLConf-scoped, so `applyLowMemory` can also
    * retrofit a running session (`spark.newSession()` for isolation).
    */
  val lowMemoryConfs: Seq[(String, String)] = Seq(
    // quarter-size scan splits: more, smaller input tasks
    "spark.sql.files.maxPartitionBytes" -> "33554432",
    // quarter-size vectorized parquet reader batches
    "spark.sql.parquet.columnarReaderBatchSize" -> "1024",
    // smaller shuffle blocks per reducer; AQE still coalesces tiny ones
    "spark.sql.shuffle.partitions" -> "256",
    // broadcasts hold a full table copy per executor — cap them low
    "spark.sql.autoBroadcastJoinThreshold" -> "4194304",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "4194304")

  /** Low-memory confs that are session-STATIC (core Spark, not
    * SQLConf): only the builder can set these. */
  val lowMemoryBuildConfs: Seq[(String, String)] = Seq(
    // flush in-memory shuffle sorters earlier instead of growing them
    "spark.shuffle.spill.numElementsForceSpillThreshold" -> "1000000")

  /** Apply the low-memory profile to an existing session's SQLConf. */
  def applyLowMemory(spark: SparkSession): SparkSession = {
    lowMemoryConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark
  }

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
