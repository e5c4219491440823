package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(Some("local[4]"), Some("4")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns a schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q1_agg groups are complete and ordered") {
    val rows = operators.Relational.q1Agg(spark, sf).collect()
    assert(rows.length >= 4)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted))
  }

  test("topk is sorted desc and bounded") {
    val rows = operators.Relational.topK(spark, sf).collect()
    assert(rows.length <= 10)
    val prices = rows.map(_.getDouble(2))
    assert(prices.sameElements(prices.sorted.reverse))
  }

  test("scan filter pushes predicates into the parquet scan") {
    val plan = operators.Relational.scanFilter(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), "expected pushed filters in scan")
    assert(plan.contains("l_discount"), "expected l_discount filter pushed")
  }

  test("broadcast join actually broadcasts the dim side") {
    val plan = operators.Relational.joinBroadcast(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
