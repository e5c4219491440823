package graft
// temporary diagnostics main — not part of the library surface
object ProbeMain {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators._
    val spark = GraftSession.builder(Some("local[8]"), Some("8")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_scale10x")) {
      val docs = Tables.documents(spark, dir)
      val pairs = Dedup.minhashLshPairs(docs)
      println(s"DIR $dir pairs=${pairs.count()}")
    }
    spark.stop()
  }
}
