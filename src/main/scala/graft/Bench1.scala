package graft

/** Micro-bench: run ONE named query from SparkEntry.queries repeatedly.
  * `runMain graft.Bench1 <query> [reps]` against SPARK_GRAFT_SF_DIR.
  * Prints per-rep seconds; used for plan iteration without paying for
  * the whole suite.
  */
object Bench1 {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(Some(s"local[$cpus]"), Some(cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (0 until reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[bench1] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
