package graft
import org.apache.spark.sql.DataFrame

/** Benchmark main: one JSON line with per-query seconds.
  *
  * Measurement discipline (a correct number needs all three):
  *  - materialize through the `noop` sink, not `count()` — count lets
  *    Catalyst prune projections and drop sorts, under-measuring the
  *    real work a user's query does;
  *  - one warm-up pass over every query first, so session startup,
  *    codegen compilation, and filesystem cache effects don't land on
  *    whichever query happens to run first;
  *  - median of SPARK_GRAFT_BENCH_REPS (default 3) timed runs per
  *    query, robust to one-off GC/scheduler noise.
  */
object Bench {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // fail fast on a malformed core count — interpolated unquoted into
    // the JSON artifact below, so "32 "/"8g" would silently corrupt it
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").trim.toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // pre-session system load: a concurrent sweep on the same box
    // contaminates every wall time ~uniformly (the round-9 phantom
    // 27% regression). Stamp it so a loaded run is visibly loaded.
    val loadAvg =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    if (loadAvg > 0.25 * cpus)
      System.err.println(f"[bench] WARNING: 1-min loadavg $loadAvg%.1f on $cpus cores " +
        "before the run — results are contention-contaminated; rerun on an idle box")
    val spark = GraftSession.builder(Some(s"local[$cpus]"), Some(cpus.toString)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev affordance mirroring Verify's SPARK_GRAFT_ONLY: restrict the
    // run to named entries for ISOLATED measurement (full-sweep wall
    // ratios carry cross-query contention; scale triage needs both).
    // The driver never sets it — full sweep by default.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      try materialize(SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] warmup $n failed: ${e.getMessage}") }
    }
    val results = names.map { n =>
      // a failed rep must not masquerade as a fast one: failures are
      // reported as -1 for the query and excluded from the total
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          materialize(SparkEntry.queries(n)(spark, sfDir))
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $n failed: ${e.getMessage}")
            None
        }
      }.sorted
      n -> (if (times.length < reps) -1.0 else times(times.length / 2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a partial total must not read as a speedup: any failed query
    // poisons the total to -1, and the failures are named explicitly
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total =
      if (failed.nonEmpty) -1.0
      else results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // cpus is stamped so cross-artifact wall ratios (10x vs 1x) can be
    // read as data scaling, not a silent core-count change
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"reps":$reps,"cpus":$cpus,"loadavg_pre":$loadAvg,"sf":"$sfDir"}"""
    println(line)
    // the driver's captured stdout truncates to a short tail, losing
    // the per-query map — persist the full line as an artifact too
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }
    spark.stop()
  }
}
