package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.RuntimeFilters

class RuntimeFiltersSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dpp: the fact scan carries a DynamicPruning partition filter") {
    val df = RuntimeFilters.dppQuery(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the fact scan:\n$plan")
    // and pruning is result-invisible: same rollup off the raw table
    val expect = {
      val ev = Tables.events(spark, sf)
        .select(col("event_type"), col("value").cast("decimal(18,2)").as("y"))
      val keep = ev.groupBy(col("event_type"))
        .agg(sum(col("y")).as("sv"), count(lit(1)).as("n"))
        .where(col("sv") > col("n").cast("decimal(18,2)") * 50)
        .collect().map(_.getString(0)).toSet
      ev.collect().map(r => (r.getString(0), r.getDecimal(1)))
        .filter(t => keep(t._1)).groupBy(_._1)
        .map { case (t, vs) =>
          t -> ((vs.length.toLong,
            vs.map(v => BigDecimal(v._2)).sum.toDouble))
        }
    }
    val got = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expect, s"pruned join diverged: $got vs $expect")
    assert(got.nonEmpty && got.size < 5,
      "the dim filter must actually prune some partitions at sf0.001")
  }

  test("bloom join: might_contain reaches the fact side, result unchanged") {
    val plain = RuntimeFilters.bloomQuery(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val saved = RuntimeFilters.bloomConfs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    RuntimeFilters.bloomConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = RuntimeFilters.bloomQuery(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the lineitem scan:\n$plan")
      val filtered = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(filtered == plain,
        "bloom filtering must be result-invisible (exactness lives in the join)")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    // the entry wrapper restores the confs after materializing
    val entry = RuntimeFilters.bloomJoin(spark, sf).collect()
    assert(entry.length == plain.length)
    saved.foreach { case (k, v) =>
      assert(spark.conf.getOption(k) == v, s"entry must restore $k")
    }
  }
}
