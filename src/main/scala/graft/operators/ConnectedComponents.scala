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
  * check) and the checkpoint fence (Checkpoints.fence — executor-local
  * by default, reliable FS under `spark.graft.reliableCheckpoints`)
  * truncates lineage so round r's plan does not replay rounds 1..r-1. Dedup clusters in practice have
  * tiny diameter (near-dups of near-dups), so rounds ≈ 2-3.
  */
object ConnectedComponents {

  /** (id, component) for every node appearing in `edges` (id1, id2);
    * component = the minimum node id reachable from the node. */
  def components(edges: DataFrame, maxRounds: Int = 25,
                 jumpsPerRound: Int = 1): DataFrame = {
    val e = edges.select(col("id1").cast("long").as("a"), col("id2").cast("long").as("b"))
    // symmetric, self-loop-free edge list
    val sym = Checkpoints.fence(
      e.union(e.select(col("b").as("a"), col("a").as("b")))
        .where(col("a") =!= col("b"))
        .distinct())

    // label(id) starts at min(id, min neighbor) — one round for free
    var assign = Checkpoints.fence(
      sym.groupBy(col("a").as("id"))
        .agg(least(min(col("b")), col("a")).as("comp")))

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
      // pointer jump 1: comp := comp(comp) resolved through the
      // round-start map — collapses one level of label chain. The
      // result is CHECKPOINTED before further jumping: a jump must
      // self-join the map it just produced to actually double (the
      // un-checkpointed form doubles the PLAN per jump instead —
      // measured 70s where this runs in 3s).
      var lab = hop
        .join(assign.select(col("id").as("__l_id"), col("comp").as("__l_comp")),
          hop("comp") === col("__l_id"), "left")
        .select(col("id"), col("__old"),
          coalesce(col("__l_comp"), col("comp")).as("comp"))
      // OPTIONAL pointer-DOUBLING jumps 2..j: checkpoint the map just
      // built, then self-join it — resolved chain depth doubles per
      // jump at the cost of one extra action + materialization per
      // jump (self-joining WITHOUT the checkpoint doubles the PLAN
      // instead: measured 70s vs 3s). Default is 1: on the sparse
      // chain-y graphs dedup produces, the extra per-round actions
      // cost more than the rounds they save (measured 12 rounds/3.2s
      // single-jump vs fewer-but-pricier rounds ~10s doubled at
      // sf0.01); raise it only for graphs with deep label chains
      // where per-round shuffle volume, not round count × fixed job
      // overhead, dominates.
      var j = 1
      while (j < jumpsPerRound) {
        val m = Checkpoints.fence(lab)
        lab = m
          .join(m.select(col("id").as("__l_id"), col("comp").as("__l_comp")),
            col("comp") === col("__l_id"), "left")
          .select(col("id"), col("__old"),
            coalesce(col("__l_comp"), col("comp")).as("comp"))
        j += 1
      }
      // the convergence count rides the last jump's materialization as
      // an observed metric — no separate changed-rows job
      val obs = org.apache.spark.sql.Observation()
      val jumped = Checkpoints.fence(lab
        .observe(obs, coalesce(sum(when(col("comp") =!= col("__old"), 1L).otherwise(0L)),
          lit(0L)).as("changed")))
      converged = obs.get("changed").asInstanceOf[Long] == 0L
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

  /** X135: canonical-keeper selection — dedup's POLICY step: within
    * each near-dup cluster, which member survives? `dropClustered`
    * hard-codes "smallest id"; real pipelines keep the best document
    * (longest, preferred source, then id as the tiebreak). One
    * component-keyed window over the cluster membership joined to the
    * doc metadata — component cardinality is high and cluster sizes
    * are bounded by dedup density, so the sort parallelizes like any
    * high-cardinality window. Returns one row per multi-member
    * cluster: (component, keeper_id, n_members, n_removed). */
  def canonicalKeepers(docs: DataFrame, edges: DataFrame,
                       lengthCol: String = "n_chars",
                       idCol: String = "doc_id",
                       maxRounds: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val member = components(edges, maxRounds)
      .join(docs.select(col(idCol).cast("long").as("id"),
        col(lengthCol).as("__len")), Seq("id"))
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("__len").desc, col("id"))
    member
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(Window.partitionBy(col("comp"))))
      .where(col("__rn") === 1 && col("n_members") > 1)
      .select(col("comp").as("component"), col("id").as("keeper_id"),
        col("n_members"), (col("n_members") - 1).as("n_removed"))
      .orderBy(col("component"))
  }

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
