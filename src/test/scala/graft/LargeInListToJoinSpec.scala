package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class LargeInListToJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("SQL giant IN list rewrites to a semi-join plus a pushed range predicate") {
    Tables.documents(spark, sf).createOrReplaceTempView("liit_docs")
    val ids = (0 until 1500).map(_ * 2L)
    val df = spark.sql(
      s"SELECT doc_id, lang FROM liit_docs WHERE doc_id IN (${ids.mkString(",")})")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"),
      s"expected a semi-join against the id relation:\n$optimized")
    assert(!optimized.contains("IN ("),
      s"the giant In must be gone from the optimized plan:\n$optimized")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThanOrEqual(doc_id") &&
           physical.contains("LessThanOrEqual(doc_id"),
      s"range conjunct must reach the scan for row-group pruning:\n$physical")
    // correctness: even ids present in the table
    val expected = Tables.documents(spark, sf)
      .where(col("doc_id") % 2 === 0).count()
    assert(df.count() == expected)
  }

  test("DataFrame isin (arriving as InSet) rewrites like SQL IN") {
    // .isin literals carry no type-coercion Casts, so OptimizeIn
    // converts them to InSet before this rule's turn in the batch —
    // the rule must match that form too or the DataFrame surface
    // silently misses the optimization
    val keys = SparkEntry.largeInKeys
    val df = Tables.lineitem(spark, sf)
      .where(col("l_partkey").isin(keys: _*)).select("l_orderkey")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"),
      s"expected a semi-join for the InSet form:\n${optimized.take(1500)}")
    assert(!optimized.contains("INSET"),
      s"the giant InSet must be gone:\n${optimized.take(1500)}")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThanOrEqual(l_partkey") &&
           physical.contains("LessThanOrEqual(l_partkey"),
      s"range conjunct must reach the scan:\n${physical.take(1500)}")
    // correctness vs a client-side membership count (independent of
    // any In/InSet evaluation path the rule could touch)
    val keySet = keys.toSet
    val expected = Tables.lineitem(spark, sf).select("l_partkey").collect()
      .count(r => keySet.contains(r.getLong(0)))
    assert(df.count() == expected && expected > 0)
  }

  test("small IN lists are left untouched") {
    Tables.documents(spark, sf).createOrReplaceTempView("liit_docs2")
    val df = spark.sql("SELECT doc_id FROM liit_docs2 WHERE doc_id IN (1, 2, 3)")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("LeftSemi"), s"small lists must stay In:\n$optimized")
    assert(df.count() == 3)
  }
}
