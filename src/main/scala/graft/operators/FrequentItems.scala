package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Heavy hitters (frequent items) at unbounded cardinality — "which
  * tokens/domains/urls exceed φ of the corpus" without a full
  * group-by of every distinct item.
  *
  * Two bounded passes:
  *  1. a Misra-Gries sketch (`graft_freqitems`, O(cap) state) whose
  *     candidate set provably contains every item with share >
  *     1/(cap+1) — so with cap ≥ 1/φ no true heavy hitter can be
  *     missed, regardless of row order or partitioning;
  *  2. an exact re-count restricted to the ≤ cap candidates (broadcast
  *     semi-join gate), because MG estimates are order-dependent — the
  *     re-count makes the final answer exact and deterministic.
  *
  * At 100 TB the difference vs `GROUP BY item HAVING n > φ·N` is the
  * shuffle: the group-by moves every distinct item's counter; this
  * moves cap counters in pass 1 and only candidate rows' counts in
  * pass 2.
  */
object FrequentItems {

  /** Exact items with share > `phi`, via the sketch-then-recount plan.
    * Returns (item, cnt, share), share rounded to 4. */
  def heavyHitters(items: DataFrame, itemCol: String, phi: Double,
                   capacity: Int = 0): DataFrame = {
    require(phi > 0.0 && phi < 1.0, "phi in (0,1)")
    val cap = if (capacity > 0) capacity else math.ceil(2.0 / phi).toInt
    require(cap >= math.ceil(1.0 / phi).toInt - 1,
      s"capacity $cap cannot guarantee recall at phi=$phi")
    val sketch = items
      .agg(call_function("graft_freqitems", col(itemCol).cast("string"), lit(cap)).as("sk"))
      .select(col("sk.n").as("n_total"), explode(col("sk.items")).as("c"))
      .select(col("n_total"), col("c.item").as("__cand"))
    items
      .join(broadcast(sketch.select(col("__cand"))),
        col(itemCol).cast("string") === col("__cand"), "left_semi")
      .groupBy(col(itemCol).cast("string").as("item"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(sketch.groupBy().agg(max(col("n_total")).as("n_total"))))
      .where(col("cnt") > col("n_total") * phi)
      .select(col("item"), col("cnt"),
        round(col("cnt") / col("n_total"), 4).as("share"))
  }
}
