package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Runtime row- and partition-filtering — the two Catalyst features
  * that decide whether a 100 TB fact scan reads 100 TB or the sliver a
  * selective dimension actually reaches:
  *
  *  - **Dynamic partition pruning** (`dppScan`): when the fact table is
  *    hive-partitioned on the join key, the dimension side executes
  *    first and its key set becomes a PARTITION filter on the fact scan
  *    — whole directories never open. The pruning predicate is
  *    invisible in the result (the join would drop those rows anyway);
  *    what it buys is I/O proportional to the surviving partitions.
  *
  *  - **Runtime bloom-filter join** (`bloomJoin`): when the fact is NOT
  *    partitioned on the join key, a bloom filter built from the
  *    filtered dimension's keys is pushed into the fact scan as a
  *    `might_contain` row predicate — rows that cannot join die at the
  *    scan instead of crossing the shuffle. False positives only cost
  *    wasted shuffle bytes; the join itself stays exact.
  *
  * Both entries hash-verify against oracles computed WITHOUT any
  * pruning, proving the filters are pure I/O optimizations.
  */
object RuntimeFilters {

  /** Build the fact layout + the query for `q_dpp_scan`; split out so
    * the spec can assert the plan carries a DynamicPruning partition
    * filter. Dimension = event types whose exact DECIMAL value sum
    * exceeds 50/event (an aggregate-derived, runtime-only key set — a
    * static predicate would be constant-folded and prove nothing);
    * fact = the same events hive-partitioned by type. */
  def dppQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_dpp_${sfDir.hashCode.abs}"
    Tables.events(spark, sfDir)
      .select($"event_id", $"event_type", $"value")
      .write.mode("overwrite").partitionBy("event_type").parquet(path)
    // the exact-decimal HAVING keeps the dim's key set engine-
    // independent (a double avg's last ulp could flip a type in/out)
    val dim = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(sum($"value".cast("decimal(18,2)")).as("sv"), count(lit(1)).as("n"))
      .where($"sv" > $"n".cast("decimal(18,2)") * 50)
      .select($"event_type")
    spark.read.parquet(path)
      .join(broadcast(dim), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy($"event_type")
  }

  /** The `q_bloom_join` queries entry: lineitem joined to a highly
    * selective orders slice with the join pinned to shuffle-hash (the
    * 100 TB shape — a fact too big to broadcast against) and the
    * bloom-filter threshold opened so the filtered orders keys reach
    * the lineitem SCAN as a `might_contain` predicate. The plan is
    * materialized to parquet while the conf is set (queries entries
    * are lazy — the driver executes them later, after this function
    * returned and restored the session conf), then read back. */
  /** The confs that make the tiny-SF testbed look like the 100 TB
    * shape to InjectRuntimeFilter: the app-side scan threshold drops
    * to 0 (stands in for a petabyte fact) and auto-broadcast turns
    * off (Catalyst refuses a bloom filter when the dim could
    * broadcast — correct at 100 TB where it can't). */
  val bloomConfs: Seq[(String, String)] = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  def bloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val saved = bloomConfs.map { case (k, _) => k -> spark.conf.getOption(k) }
    bloomConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_bloom_${sfDir.hashCode.abs}"
      bloomQuery(spark, sfDir).write.mode("overwrite").parquet(out)
      spark.read.parquet(out).orderBy(col("o_orderpriority"))
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  /** The join itself, conf-independent; the spec sets the threshold
    * conf and asserts `might_contain` lands in this plan. */
  def bloomQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hot = Tables.orders(spark, sfDir)
      .where($"o_totalprice" > 400000)
      .select($"o_orderkey", $"o_orderpriority")
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_extendedprice")
      .hint("shuffle_hash")
      .join(hot, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy($"o_orderpriority")
  }
}
