package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Driver-run recall measurement for the sorted-neighborhood family:
  * single-pass and multi-pass SNM pair sets scored against the EXACT
  * Jaccard-threshold ground truth that `Dedup.ppjoinPairs` computes
  * over the same corpus at the same threshold (the prefix principle
  * is lossless, so PPJoin's output IS every J ≥ t pair — no sampling,
  * no estimate).
  *
  * This turns the family's documented trade into a number: the SNM
  * window cap (clamp-256, Dedup.autoWindow) bounds candidate cost
  * linearly, and the cost is paid FOR recall — so recall at the cap
  * must be measured, not asserted. Run at 1x and at the 10x sweep
  * scale; tools/scale10x_summary.py folds the artifacts into
  * SCALE10X.json next to the snm_isolated wall-time table.
  *
  * Both SNM verifiers apply the same exact-Jaccard ≥ t filter as the
  * ground truth, so SNM pairs ⊆ truth by construction (precision 1.0);
  * `subset_ok` asserts that invariant held, and recall = hits/|truth|.
  *
  * Usage: runMain graft.SnmRecall <sfDir> [outJson] */
object SnmRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = if (args.length > 1) args(1) else "/tmp/graft_snm_recall.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(Some(s"local[$cpus]"), Some(cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val threshold = 0.5 // the gated entries' shared Jaccard threshold
    val docs = Tables.documents(spark, sfDir)

    // blocking-key context: the resolved auto window explains WHERE on
    // the cap transition this corpus sits (window < 256 = pre-cap,
    // 256 = capped). Keying MUST mirror Dedup.resolveWindow's NULL-safe
    // sentinel concat — a bare countDistinct drops NULL keys and the
    // reported window could then differ from the one the scored runs
    // actually resolved.
    val keyed = docs.agg(count(lit(1)),
      countDistinct(Dedup.blockingKey(Seq("n_chars")))).head()
    val (nDocs, dk) = (keyed.getLong(0), keyed.getLong(1))
    val window = Dedup.autoWindow(nDocs, dk)

    val truth = Dedup.ppjoinPairs(docs, threshold = threshold)
      .select("id1", "id2").persist()
    val nTruth = truth.count()

    def score(pairs: DataFrame): (Long, Long) = {
      val p = pairs.select("id1", "id2").persist()
      val n = p.count()
      val hits = truth.join(p, Seq("id1", "id2"), "left_semi").count()
      p.unpersist()
      (n, hits)
    }
    val (nSingle, hitSingle) = score(Dedup.sortedNeighborhoodPairs(
      docs, sortCols = Seq("n_chars"), window = 0, minJaccard = threshold))
    val (nMulti, hitMulti) = score(Dedup.sortedNeighborhoodMultiPass(
      docs, keySets = Seq(Seq("n_chars"), Seq("lang", "n_chars")),
      window = 0, minJaccard = threshold))

    def ratio(h: Long): Double =
      if (nTruth == 0) -1.0 else h.toDouble / nTruth
    // Locale.ROOT, not the f-interpolator: under a comma-decimal JVM
    // locale (de_DE) "%.4f" renders 0,9123 and the artifact stops
    // being JSON
    def fmt(d: Double): String = String.format(java.util.Locale.ROOT, "%.4f", d)
    val json =
      s"""{"sf_dir": "$sfDir", "threshold": $threshold, "n_docs": $nDocs,
         | "distinct_blocking_keys": $dk, "auto_window": $window,
         | "truth_pairs": $nTruth,
         | "snm_single": {"pairs": $nSingle, "hits": $hitSingle,
         |  "recall": ${fmt(ratio(hitSingle))}, "subset_ok": ${hitSingle == nSingle}},
         | "snm_multipass": {"pairs": $nMulti, "hits": $hitMulti,
         |  "recall": ${fmt(ratio(hitMulti))}, "subset_ok": ${hitMulti == nMulti}}}
         |""".stripMargin.replace("\n", "") + "\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(s"[snm-recall] truth=$nTruth single=${ratio(hitSingle)} " +
      s"multi=${ratio(hitMulti)} window=$window -> $outPath")
    spark.stop()
  }
}
