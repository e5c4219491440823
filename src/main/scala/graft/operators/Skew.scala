package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §5.4).
  *
  * AQE's skew-join splitting handles most runtime skew; these are the
  * explicit tools for the cases AQE can't fix: a single pathological
  * key in a shuffle join (salt the probe side, replicate the build
  * side) and a skewed aggregation key (two-phase salted aggregation).
  * Both are deterministic — the salt is a hash of the whole row mixed
  * with the input partition id, not a random draw, so retries and
  * speculative tasks agree (a retried task re-reads the same input
  * partition and reproduces the same salts).
  */
object Skew {

  /** Hash of (all columns, input partition id). The partition-id mix
    * matters for exact duplicate rows — a common source of hot-key
    * skew — which would otherwise all hash to one salt and still land
    * on a single reducer; with the mix, duplicates spread across as
    * many salts as input partitions they occupy. Duplicates within a
    * single input partition still share a salt, bounding any residual
    * hot spot at one input partition's worth of rows. */
  private def rowSalt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toSeq: _*), spark_partition_id()),
      lit(factor.toLong))

  /** Inner equi-join where `big`'s join key is skewed: each big-side
    * row gets one of `factor` salts; `small` is replicated `factor`
    * times so every (key, salt) bucket can match. The shuffle spreads
    * a hot key over `factor` reducers at the cost of shipping `small`
    * `factor` times — use when `small` is too big to broadcast but far
    * smaller than the skewed side. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int = 8): DataFrame = {
    require(factor > 1, "factor must be > 1")
    val saltedBig = big.withColumn("__salt", rowSalt(big, factor))
    // shuffle_hash hint: this operator exists precisely for the
    // small-but-not-broadcastable regime, so pin the join to the
    // salted shuffle distribution it is designed to spread — a
    // broadcast plan would make the salt dead weight
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L)))).hint("shuffle_hash")
    saltedBig.join(replicatedSmall,
      saltedBig(key) === replicatedSmall(key) &&
        saltedBig("__salt") === replicatedSmall("__salt"))
      .drop(replicatedSmall(key))
      .drop("__salt")
  }

  /** Two-phase salted sum/count aggregation for a skewed grouping key:
    * partial aggregate on (key, salt) — bounded fan-in per reducer —
    * then final aggregate on key. Algebraic aggregates only (sums,
    * counts) because the phases must compose. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     factor: Int = 8): DataFrame = {
    require(factor > 1, "factor must be > 1")
    df.withColumn("__salt", rowSalt(df, factor))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }
}
