package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — match points to the intervals containing
  * them. Spark plans a naive `p >= lo AND p < hi` join as a nested
  *-loop cartesian; the scale-safe formulation bins the domain:
  *
  *  - every interval registers in each bin it overlaps (replication
  *    factor = interval width / binWidth, bounded and chosen);
  *  - every point lives in exactly ONE bin, so the equi-join on the
  *    bin id is a plain hash join and each (point, interval) pair
  *    meets at most once — no post-dedup;
  *  - the exact `[lo, hi)` predicate rides the join condition, so
  *    false bin-mates are dropped inside the join.
  *
  * One shuffle on the bin id; binWidth trades interval replication
  * against bin selectivity (rule of thumb: median interval width).
  */
object RangeJoin {

  /** Join `points` (carrying numeric `pointCol`) to `intervals`
    * (carrying `loCol`, `hiCol`), interval-inclusive on the low end:
    * lo <= p < hi. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        // hi is exclusive, but an interval ending exactly on a bin
        // edge still owns that edge's bin start; ceil-1 would miss
        // in-bin endpoints, so cover through hi's bin
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv,
      p("__bin") === iv("__bin") &&
        p(pointCol) >= iv(loCol) && p(pointCol) < iv(hiCol))
      .drop(p("__bin")).drop(iv("__bin"))
  }
}
