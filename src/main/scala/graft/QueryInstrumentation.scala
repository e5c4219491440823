package graft

import org.apache.spark.sql.{DataFrame, Row}

/** Per-query stats instrumentation (R9).
  *
  * The reference wraps every query in a `QueryStats` recorder that
  * captures per-phase wall times and result row counts (reference
  * src/query_stats.rs:35-156; every DSL call returns
  * `(result, stats)`).
  *
  * Spark analog: the phases that exist here are Catalyst's —
  * analysis, optimization, physical planning, execution — and each is
  * forced explicitly so its cost is attributable. Execution rows come
  * from the collected result; `materialize` offers the
  * no-driver-result variant (noop sink) for big outputs, where only
  * the executed plan's row metric is read back. Instrumentation adds
  * no extra Spark jobs.
  */
object QueryInstrumentation {

  final case class QueryStats(
      name: String,
      phaseMs: Seq[(String, Double)],
      outputRows: Long) {
    def totalMs: Double = phaseMs.map(_._2).sum
    def phase(p: String): Double =
      phaseMs.collectFirst { case (`p`, ms) => ms }.getOrElse(0.0)
    def pretty: String =
      f"[$name] rows=$outputRows total=${totalMs}%.1fms " +
        phaseMs.map { case (p, ms) => f"$p=${ms}%.1fms" }.mkString(" ")
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e6)
  }

  /** Run `df` to a driver-side result with per-phase timings —
    * the reference's `(result, stats)` contract. */
  def run(name: String, df: DataFrame): (Array[Row], QueryStats) = {
    val qe = df.queryExecution
    val (_, tAnalyze) = timed(qe.analyzed)
    val (_, tOptimize) = timed(qe.optimizedPlan)
    val (_, tPlan) = timed(qe.executedPlan)
    val (rows, tExec) = timed(df.collect())
    (rows, QueryStats(name, Seq(
      "analyze" -> tAnalyze, "optimize" -> tOptimize,
      "plan" -> tPlan, "execute" -> tExec), rows.length.toLong))
  }

  /** Run `df` through the noop sink (nothing returns to the driver) —
    * the right shape when the result is itself big data. */
  def materialize(name: String, df: DataFrame): QueryStats = {
    val qe = df.queryExecution
    val (_, tAnalyze) = timed(qe.analyzed)
    val (_, tOptimize) = timed(qe.optimizedPlan)
    val (_, tPlan) = timed(qe.executedPlan)
    val (_, tExec) = timed(df.write.format("noop").mode("overwrite").save())
    QueryStats(name, Seq(
      "analyze" -> tAnalyze, "optimize" -> tOptimize,
      "plan" -> tPlan, "execute" -> tExec), -1L)
  }
}
