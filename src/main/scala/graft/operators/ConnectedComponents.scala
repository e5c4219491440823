package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step
  * that turns pairwise dedup output (L2/L3/L5) into actionable
  * CLUSTERS: each component keeps one canonical document (the lowest
  * id) and drops the rest. Without this step, pairwise output
  * under-deletes: pairs (a,b), (b,c) without (a,c) would keep both a
  * and c if deletion is done per-pair.
  *
  * Algorithm: min-label propagation with pointer jumping (the
  * map-reduce connected-components family of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each
  * round every node takes the minimum label in its 1-hop
  * neighborhood, then labels are resolved one extra hop
  * (label := label(label)) — the pointer-jumping step that collapses
  * label chains and gives O(log n) rounds on a path instead of O(n).
  *
  * Scale shape: each round is two key-partitioned joins + one
  * aggregation over the EDGE list — no per-node adjacency list is
  * ever materialized, so a hub node with millions of neighbors costs
  * map-side-combined min aggregation, not an in-memory list. The
  * driver sees one boolean-sized aggregate per round (the converged
  * check) and `localCheckpoint` truncates lineage so round r's plan
  * does not replay rounds 1..r-1. Dedup clusters in practice have
  * tiny diameter (near-dups of near-dups), so rounds ≈ 2-3.
  */
object ConnectedComponents {

  /** (id, component) for every node appearing in `edges` (id1, id2);
    * component = the minimum node id reachable from the node. */
  def components(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    val e = edges.select(col("id1").cast("long").as("a"), col("id2").cast("long").as("b"))
    // symmetric, self-loop-free edge list
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)

    // label(id) starts at min(id, min neighbor) — one round for free
    var assign = sym.groupBy(col("a").as("id"))
      .agg(least(min(col("b")), col("a")).as("comp"))
      .localCheckpoint(true)

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // 1-hop min: each node pulls the smallest label among its
      // neighbors' labels and its own
      val nbrMin = sym
        .join(assign.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("comp")).as("nmin"))
      val hop = assign.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("__old"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
      // pointer jump: comp := comp(comp) — labels are node ids, so
      // resolving through the assignment collapses label chains. The
      // previous label rides along as __old so the convergence check
      // is a filter over this round's (checkpointed) result, not an
      // extra join.
      val jumped = hop
        .join(assign.select(col("id").as("__l_id"), col("comp").as("__l_comp")),
          hop("comp") === col("__l_id"), "left")
        .select(col("id"), col("__old"),
          coalesce(col("__l_comp"), col("comp")).as("comp"))
        .localCheckpoint(true)
      converged = jumped.where(col("comp") =!= col("__old")).limit(1).count() == 0
      assign = jumped.select(col("id"), col("comp"))
      round += 1
    }
    assign
  }

  /** Cluster summary: one row per component with its size and sorted
    * member list — the dedup "keep component id, drop the rest" view. */
  def clusters(edges: DataFrame, maxRounds: Int = 25): DataFrame =
    components(edges, maxRounds)
      .groupBy(col("comp").as("component"))
      .agg(count(lit(1)).as("n_members"),
        array_join(array_sort(collect_list(col("id"))), ",").as("members"))

  /** Drop every non-canonical member of every cluster from `docs`:
    * the end-to-end "pairs → survivors" dedup contract. */
  def dropClustered(docs: DataFrame, edges: DataFrame,
                    idCol: String = "doc_id", maxRounds: Int = 25): DataFrame = {
    val losers = components(edges, maxRounds)
      .where(col("id") =!= col("comp"))
      .select(col("id"))
    docs.join(losers.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }
}
