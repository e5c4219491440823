package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.MaterializedView

class MaterializedViewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mv merge: split point is invisible — any increment boundary, same view") {
    val full = Tables.events(spark, sf)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"),
        col("value").cast("decimal(18,2)").as("y"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sv"))
      .select(col("day"), col("event_type"), col("n"),
        round(col("sv").cast("double") / col("n"), 4).as("avg_value"),
        round(col("sv").cast("double"), 2).as("sum_value"))
      .orderBy(col("day"), col("event_type"))
      .collect().toSeq
    Seq("2024-03-01", "2024-05-01", "2024-12-31").foreach { split =>
      val merged = MaterializedView.mvMerge(spark, sf, split).collect().toSeq
      assert(merged == full, s"merge at $split diverged from the full recompute")
    }
  }

  test("mv merge: the refresh plan reads the stored MV, not base fact rows") {
    // the merged plan's scans: one parquet scan of the MV temp dir
    // (graft-mv*) + one scan of events for the delta — never two
    // full events scans
    val df = MaterializedView.mvMerge(spark, sf)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.exists(_.contains("graft-mv")),
      s"expected a stored-MV scan in:\n${scans.mkString("\n")}")
    val eventScans = scans.count(_.contains("events.parquet"))
    assert(eventScans == 1,
      s"delta refresh must scan events exactly once, saw $eventScans")
  }
}
