package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named entries to individual files —
  * the optimization-round evidence artifact (plans/r17/<name>_<tag>.txt).
  * `runMain graft.PlanDumpOne <sfDir> <outDir> <tag> <name,...>`.
  */
object PlanDumpOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(Some(s"local[$cpus]"), Some(cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"), txt)
      println(s"[plandump1] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
