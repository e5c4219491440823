package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over the embedding table — the workhorse clustering
  * every training-data pipeline runs (IVF coarse quantizers, SemDeDup
  * cluster stage, topic bucketing for mixture design). The reference
  * engine has no clustering; this is the Spark-first shape for it.
  *
  * Scale shape per iteration: assignment is a per-row fold over a
  * BROADCAST k×dim literal centroid array (no join, no shuffle —
  * scan-stage arithmetic exactly like the silhouette scorer), and the
  * update is ONE map-side-combined aggregation (`graft_vec_sum`,
  * O(dim) state per cluster) whose k-row result returns to the driver
  * — bounded metadata, the ann_ivf centroid precedent. Nothing
  * data-sized ever sits on the driver and no iteration shuffles more
  * than k×dim numbers.
  *
  * Cross-engine determinism (the DuckDB twin replays every step):
  *  - components quantize once to the 10⁻⁶ integer grid (exact
  *    integers in doubles — sums are ORDER-FREE up to 2^53, the
  *    embed_abtt discipline);
  *  - seeding is the k smallest vec_ids (no RNG);
  *  - assignment ties break toward the smaller cluster id via an
  *    (dist, cl) struct min — a total order;
  *  - centroid updates round half-away-from-zero to the integer grid
  *    (BigDecimal HALF_UP here ≡ DuckDB `round`), so both engines
  *    enter every iteration with IDENTICAL centroids;
  *  - empty clusters keep their previous centroid on both sides.
  */
object Clustering {

  /** X218: k-means assignment after `iters` Lloyd iterations.
    * Returns (vec_id, cluster, dist) with dist the unquantized-scale
    * Euclidean distance to the final centroid, round(6). */
  def kmeans(df: DataFrame, k: Int = 8, iters: Int = 3,
             vecCol: String = "embedding",
             idCol: String = "vec_id"): DataFrame = {
    require(k >= 2 && iters >= 1)
    // k × dim distance arithmetic per row per iteration rides the scan
    // stage — spread the narrow projection of a single-split scan to
    // session parallelism, quantize above it
    val qv = Parallelize.spreadScan(
      df.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v")))
      .select(col("__id"),
        transform(col("__v"), x => round(x.cast("double") * 1e6)).as("__qv"))

    // deterministic seeding: the k smallest ids — bounded k×dim driver
    // metadata (the IVF-centroid precedent), never data-sized
    var cents: Array[(Long, Array[Double])] = qv.orderBy(col("__id"))
      .limit(k).collect()
      .sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](1).toArray) }

    def best: Column = {
      val centArr = array(cents.map { case (cl, c) =>
        struct(lit(cl).as("cl"), array(c.map(lit): _*).as("cv"))
      }: _*)
      array_min(transform(centArr, s => struct(
        aggregate(zip_with(col("__qv"), s.getField("cv"),
          (a, b) => (a - b) * (a - b)), lit(0.0), (a, x) => a + x).as("d"),
        s.getField("cl").as("cl"))))
    }

    (1 to iters).foreach { _ =>
      val sums = qv.select(col("__qv"), best.getField("cl").as("__cl"))
        .groupBy(col("__cl"))
        .agg(call_function("graft_vec_sum", col("__qv")).as("__s"),
          count(lit(1)).as("__n"))
        .collect() // k rows of dim-length sums — bounded metadata
      val updated = sums.map { r =>
        val s = r.getSeq[Double](1)
        val n = java.math.BigDecimal.valueOf(r.getLong(2))
        r.getLong(0) -> s.map(x =>
          java.math.BigDecimal.valueOf(x)
            .divide(n, 0, java.math.RoundingMode.HALF_UP)
            .doubleValue()).toArray
      }.toMap
      cents = cents.map { case (cl, old) => (cl, updated.getOrElse(cl, old)) }
    }

    qv.select(col("__id"), best.as("__b"))
      .select(col("__id").as(idCol), col("__b.cl").as("cluster"),
        round(sqrt(col("__b.d")) / 1e6, 6).as("dist"))
      .orderBy(col(idCol))
  }

  /** X226: DBSCAN density clustering (Ester et al. 1996), cosine form,
    * over the banded LSH candidate graph:
    *  - neighbors(p) = candidates with cosine ≥ `tau` (the SAME banded
    *    pair machinery as the embedding-dedup family — recall-bounded
    *    by construction, never all-pairs; the twin replays the
    *    identical banding so both engines see the same graph);
    *  - CORE: ≥ `minPts` neighbors (self excluded);
    *  - clusters: connected components over core–core edges (label =
    *    min reachable core id — the deterministic replacement for
    *    textbook DBSCAN's visit-order-dependent expansion); a core
    *    with no core neighbor keeps its own id;
    *  - BORDER: non-core with ≥ 1 core neighbor, assigned the MIN of
    *    its core neighbors' clusters (again determinism over visit
    *    order); everything else is NOISE (cluster −1).
    *
    * Scale shape: one banded candidate pass (capped buckets), one
    * degree aggregation, the pointer-jumping CC rounds on the SPARSE
    * core edge list, two bounded label joins — the vector table never
    * self-joins and nothing is driver-sized. */
  def dbscan(emb: DataFrame, tau: Double = 0.35,
             minPts: Int = 3): DataFrame = {
    // fenced ONCE: sym feeds three independent consumers (core
    // degrees, coreEdges, borderClusters) plus CC's own fence — the
    // banded candidate pass + cosine verify would otherwise recompute
    // per consumer (measured ~0.5 s × 3 extra at sf0.1; at scale,
    // three extra full passes over the vector table)
    val pairs = Checkpoints.fence(
      Dedup.embeddingPairs(emb, threshold = tau)
        .select(col("id1"), col("id2")))
    // candidates are distinct with id1 < id2, so both directions union
    // without a dedup pass
    val sym = pairs.unionByName(
      pairs.select(col("id2").as("id1"), col("id1").as("id2")))
    val core = sym.groupBy(col("id1").as("id"))
      .agg(count(lit(1)).as("d"))
      .where(col("d") >= minPts).select(col("id"))
    val coreEdges = sym
      .join(core.select(col("id").as("id1")), "id1")
      .join(core.select(col("id").as("id2")), "id2")
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
    val comp = ConnectedComponents.components(coreEdges)
    val coreClusters = core
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("cluster"))
    val borderClusters = sym
      .join(coreClusters.select(col("id").as("id2"), col("cluster")), "id2")
      .join(core.select(col("id").as("id1")), Seq("id1"), "left_anti")
      .groupBy(col("id1").as("id"))
      .agg(min(col("cluster")).as("cluster"))
    val assigned =
      coreClusters.select(col("id"), col("cluster"), lit("core").as("role"))
        .unionByName(borderClusters.select(col("id"), col("cluster"),
          lit("border").as("role")))
    emb.select(col("vec_id").cast("long").as("id"))
      .join(assigned, Seq("id"), "left")
      .select(col("id").as("vec_id"),
        coalesce(col("role"), lit("noise")).as("role"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
      .orderBy(col("vec_id"))
  }
}
