package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of big-side rows share one key — the salted path must not
    // change the result, only the shuffle distribution
    val big = spark.range(0, 2000)
      .select((when(col("id") % 10 === 0, col("id") % 7).otherwise(0L)).as("k"),
        col("id").as("v"))
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k").select("k", "v", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salted aggregation equals direct groupBy") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(li, "l_returnflag", "l_quantity")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join plans the salted shuffle, not a broadcast") {
    import spark.implicits._
    val big = spark.range(0, 2000).select(lit(0L).as("k"), col("id").as("v"))
    val small = Seq((0L, "hot"), (1L, "a")).toDF("k", "name")
    val plan = Skew.saltedJoin(big, small, "k")
      .queryExecution.executedPlan.toString
    // a broadcast plan would make the salt dead weight: every replica
    // of the small side would reach every task anyway
    assert(!plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      plan.take(2000))
  }

  test("salted join spreads a hot key across salt buckets") {
    import spark.implicits._
    val big = spark.range(0, 1000).select(lit(0L).as("k"), col("id").as("v"))
    val salts = big.withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("v"))), lit(8L)))
      .groupBy("__salt").count().collect()
    assert(salts.length > 4, "hash salt must actually spread rows")
  }
}
