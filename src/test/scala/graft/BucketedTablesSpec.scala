package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.BucketedTables

class BucketedTablesSpec extends AnyFunSuite {
  import SparkTestSession._

  /** A fresh test JVM gets a fresh metastore, but warehouse dirs from
    * earlier runs survive on disk — drop both sides. */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val dir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_warehouse/$name")
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete())
      dir.delete()
    }
  }

  test("joining two co-bucketed tables plans zero shuffle exchanges") {
    resetTable("b_orders")
    resetTable("b_customer")
    BucketedTables.write(Tables.orders(spark, sf), "b_orders", "o_custkey", 8)
    BucketedTables.write(
      Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", "o_custkey", 8)
    // force the sort-merge path so the assertion sees the bucketed scan,
    // not a broadcast that would hide the exchange question entirely
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.join(spark, "b_orders", "b_customer", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // correctness: same result as the plain join
      val expected = Tables.orders(spark, sf).join(
        Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey").count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("aggregation on the bucket key also runs without an exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.table("b_orders").groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")).as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"aggregation on the bucket key must reuse the layout:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
