package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
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
      spilledBytes: Long = 0L,
      /** tasks from OTHER jobs that ended while this query ran —
        * nonzero means something else (a streaming query, another
        * thread) was executing concurrently; its metrics are NOT in
        * the numbers above, but its resource pressure may be. */
      foreignTasks: Long = 0L) {
    def totalMs: Double = phaseMs.map(_._2).sum
    def phase(p: String): Double =
      phaseMs.collectFirst { case (`p`, ms) => ms }.getOrElse(0.0)
    def pretty: String =
      f"[$name] rows=$outputRows total=${totalMs}%.1fms " +
        phaseMs.map { case (p, ms) => f"$p=${ms}%.1fms" }.mkString(" ") +
        f" peakTaskMem=${peakTaskMemory / 1024.0 / 1024.0}%.2fMB" +
        f" shuffleR=${shuffleReadBytes / 1024.0}%.1fKB" +
        f" shuffleW=${shuffleWriteBytes / 1024.0}%.1fKB" +
        (if (spilledBytes > 0) f" spilled=${spilledBytes / 1024.0}%.1fKB" else "") +
        (if (foreignTasks > 0) s" foreignTasks=$foreignTasks" else "")
  }

  /** Task-metric collector for one instrumented query, SCOPED to the
    * query's own job group: `onJobStart` records the stage ids of jobs
    * carrying our group id, and `onTaskEnd` folds in only tasks from
    * those stages — tasks from concurrent jobs (another thread, a
    * streaming micro-batch, a lingering speculative task) are counted
    * in `foreign` instead of polluting the numbers. */
  private final class TaskMetricsListener(groupId: String) extends SparkListener {
    val peak = new AtomicLong(0L)
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    val spilled = new AtomicLong(0L)
    val foreign = new AtomicLong(0L)
    private val myStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

    override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
      val props = jobStart.properties
      if (props != null && groupId == props.getProperty("spark.jobGroup.id"))
        jobStart.stageIds.foreach(myStages.add(_))
    }

    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      if (!myStages.contains(taskEnd.stageId)) { foreign.incrementAndGet(); return }
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

  /** Runs `action` under a fresh job group with a group-scoped
    * task-metrics listener attached, waits for the (async) listener
    * bus to drain, and returns the measurements. Attribution is by
    * job group, so concurrent jobs on the shared SparkContext cannot
    * pollute the numbers (they surface as `foreignTasks`). */
  private def withTaskMetrics[T](df: DataFrame, name: String)(action: => T): (T, Double, TaskMetricsListener) = {
    val sc = df.sparkSession.sparkContext
    val groupId = s"graft-qi-$name-${java.util.UUID.randomUUID()}"
    val l = new TaskMetricsListener(groupId)
    sc.addSparkListener(l)
    sc.setJobGroup(groupId, s"graft instrumented query: $name",
      interruptOnCancel = false)
    try {
      val (r, ms) = timed(action)
      org.apache.spark.graft.SparkInternals.waitListenerBusEmpty(sc)
      (r, ms, l)
    } finally {
      sc.clearJobGroup()
      sc.removeSparkListener(l)
    }
  }

  /** Run `df` to a driver-side result with per-phase timings and
    * memory impact — the reference's `(result, stats)` contract. */
  def run(name: String, df: DataFrame): (Array[Row], QueryStats) = {
    val qe = df.queryExecution
    val (_, tAnalyze) = timed(qe.analyzed)
    val (_, tOptimize) = timed(qe.optimizedPlan)
    val (_, tPlan) = timed(qe.executedPlan)
    val (rows, tExec, l) = withTaskMetrics(df, name)(df.collect())
    (rows, QueryStats(name, Seq(
      "analyze" -> tAnalyze, "optimize" -> tOptimize,
      "plan" -> tPlan, "execute" -> tExec), rows.length.toLong,
      l.peak.get(), l.shuffleRead.get(), l.shuffleWrite.get(), l.spilled.get(),
      l.foreign.get()))
  }

  /** Run `df` through the noop sink (nothing returns to the driver) —
    * the right shape when the result is itself big data. */
  def materialize(name: String, df: DataFrame): QueryStats = {
    val qe = df.queryExecution
    val (_, tAnalyze) = timed(qe.analyzed)
    val (_, tOptimize) = timed(qe.optimizedPlan)
    val (_, tPlan) = timed(qe.executedPlan)
    val (_, tExec, l) = withTaskMetrics(df, name)(
      df.write.format("noop").mode("overwrite").save())
    QueryStats(name, Seq(
      "analyze" -> tAnalyze, "optimize" -> tOptimize,
      "plan" -> tPlan, "execute" -> tExec), -1L,
      l.peak.get(), l.shuffleRead.get(), l.shuffleWrite.get(), l.spilled.get(),
      l.foreign.get())
  }
}
