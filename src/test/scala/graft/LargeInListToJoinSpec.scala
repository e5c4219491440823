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

  test("small IN lists are left untouched") {
    Tables.documents(spark, sf).createOrReplaceTempView("liit_docs2")
    val df = spark.sql("SELECT doc_id FROM liit_docs2 WHERE doc_id IN (1, 2, 3)")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("LeftSemi"), s"small lists must stay In:\n$optimized")
    assert(df.count() == 3)
  }
}
