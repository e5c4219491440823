package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, Row}

/** Per-query stats instrumentation (R9).
  *
  * The reference wraps every query in a `QueryStats` recorder that
  * captures per-phase wall times, result row counts, AND memory
  * impact (reference src/query_stats.rs:35-156, memory_before/after/
  * peak at :42-44; every DSL call returns `(result, stats)`).
  *
  * Spark analog: the phases that exist here are Catalyst's —
  * analysis, optimization, physical planning, execution — and each is
  * forced explicitly so its cost is attributable. Memory comes from
  * task metrics gathered by a registered `SparkListener`: the peak
  * execution memory of any task (the per-task analog of the
  * reference's process-peak sample), plus spill and shuffle byte
  * counts, which are the numbers that matter on a cluster — a
  * process-RSS sample is meaningless across executors. Instrumentation
  * adds no extra Spark jobs.
  */
object QueryInstrumentation {

  final case class QueryStats(
      name: String,
      phaseMs: Seq[(String, Double)],
      outputRows: Long,
      peakTaskMemory: Long = 0L,
      shuffleReadBytes: Long = 0L,
      shuffleWriteBytes: Long = 0L,
      spilledBytes: Long = 0L) {
    def totalMs: Double = phaseMs.map(_._2).sum
    def phase(p: String): Double =
      phaseMs.collectFirst { case (`p`, ms) => ms }.getOrElse(0.0)
    def pretty: String =
      f"[$name] rows=$outputRows total=${totalMs}%.1fms " +
        phaseMs.map { case (p, ms) => f"$p=${ms}%.1fms" }.mkString(" ") +
        f" peakTaskMem=${peakTaskMemory / 1024.0 / 1024.0}%.2fMB" +
        f" shuffleR=${shuffleReadBytes / 1024.0}%.1fKB" +
        f" shuffleW=${shuffleWriteBytes / 1024.0}%.1fKB" +
        (if (spilledBytes > 0) f" spilled=${spilledBytes / 1024.0}%.1fKB" else "")
  }

  /** Task-metric collector for one instrumented query: max task peak
    * execution memory + summed shuffle/spill bytes across tasks. */
  private final class TaskMetricsListener extends SparkListener {
    val peak = new AtomicLong(0L)
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    val spilled = new AtomicLong(0L)

    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      val m = taskEnd.taskMetrics
      if (m != null) {
        peak.getAndAccumulate(m.peakExecutionMemory, math.max)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spilled.addAndGet(m.memoryBytesSpilled)
      }
    }
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e6)
  }

  /** Runs `action` with a task-metrics listener attached, waits for
    * the (async) listener bus to drain, and returns the measurements.
    * The listener sees every task that ends while attached — for the
    * single-query-at-a-time contract this is the query's own tasks. */
  private def withTaskMetrics[T](df: DataFrame)(action: => T): (T, Double, TaskMetricsListener) = {
    val sc = df.sparkSession.sparkContext
    val l = new TaskMetricsListener
    sc.addSparkListener(l)
    try {
      val (r, ms) = timed(action)
      org.apache.spark.graft.SparkInternals.waitListenerBusEmpty(sc)
      (r, ms, l)
    } finally sc.removeSparkListener(l)
  }

  /** Run `df` to a driver-side result with per-phase timings and
    * memory impact — the reference's `(result, stats)` contract. */
  def run(name: String, df: DataFrame): (Array[Row], QueryStats) = {
    val qe = df.queryExecution
    val (_, tAnalyze) = timed(qe.analyzed)
    val (_, tOptimize) = timed(qe.optimizedPlan)
    val (_, tPlan) = timed(qe.executedPlan)
    val (rows, tExec, l) = withTaskMetrics(df)(df.collect())
    (rows, QueryStats(name, Seq(
      "analyze" -> tAnalyze, "optimize" -> tOptimize,
      "plan" -> tPlan, "execute" -> tExec), rows.length.toLong,
      l.peak.get(), l.shuffleRead.get(), l.shuffleWrite.get(), l.spilled.get()))
  }

  /** Run `df` through the noop sink (nothing returns to the driver) —
    * the right shape when the result is itself big data. */
  def materialize(name: String, df: DataFrame): QueryStats = {
    val qe = df.queryExecution
    val (_, tAnalyze) = timed(qe.analyzed)
    val (_, tOptimize) = timed(qe.optimizedPlan)
    val (_, tPlan) = timed(qe.executedPlan)
    val (_, tExec, l) = withTaskMetrics(df)(
      df.write.format("noop").mode("overwrite").save())
    QueryStats(name, Seq(
      "analyze" -> tAnalyze, "optimize" -> tOptimize,
      "plan" -> tPlan, "execute" -> tExec), -1L,
      l.peak.get(), l.shuffleRead.get(), l.shuffleWrite.get(), l.spilled.get())
  }
}
