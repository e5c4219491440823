package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Narrow bridge to `Dataset.ofRows` (private[sql]) — the only
  * supported way to wrap a hand-built `LogicalPlan` (graft's custom
  * posting-list node) in a user-facing DataFrame. Same pattern the
  * Spark ecosystem uses for custom plan nodes; nothing else in graft
  * reaches into the sql package.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
