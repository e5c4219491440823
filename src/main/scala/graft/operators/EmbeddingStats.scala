package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.cosine

/** Group-level embedding statistics — the semantic-space profiling a
  * training-data pipeline runs over its embedding table: per-group
  * mean vectors (centroids) and each vector's cosine to its own
  * group's centroid (an outlier score: low cosine = the document sits
  * far from its group's semantic center, a candidate for relabeling
  * or filtering).
  *
  * Scale shape: the centroid is ONE ordinary aggregation using the
  * O(dim)-state `graft_vec_sum` TypedImperativeAggregate — map-side
  * combined, one dim-length array per (partition, group) through the
  * exchange — instead of the posexplode → groupBy(group, pos) →
  * re-collect formulation, which shuffles rows×dim narrow rows and
  * needs a second shuffle to reassemble arrays. The centroid table
  * (one row per group) broadcasts back onto the vectors for scoring,
  * so the embedding column itself never shuffles at all.
  */
object EmbeddingStats {

  /** (group, centroid array<double>, n): per-group mean embedding.
    * Components are rounded to 6 decimals so downstream consumers
    * (and cross-engine twins) see a stable centroid regardless of
    * double-summation order across partitions. */
  def groupCentroids(df: DataFrame, groupCol: String = "label",
                     vecCol: String = "embedding"): DataFrame =
    df.groupBy(col(groupCol))
      .agg(call_function("graft_vec_sum", col(vecCol)).as("__s"),
        count(col(vecCol)).as("n"))
      .select(col(groupCol),
        transform(col("__s"), x => round(x / col("n"), 6)).as("centroid"),
        col("n"))

  /** (id, group, c_cos): each vector's cosine to its own group's
    * centroid — ascending c_cos ranks semantic outliers. */
  def centroidCosine(df: DataFrame, groupCol: String = "label",
                     vecCol: String = "embedding",
                     idCol: String = "vec_id"): DataFrame =
    df.join(broadcast(groupCentroids(df, groupCol, vecCol)), groupCol)
      .select(col(idCol), col(groupCol),
        round(cosine(col(vecCol), col("centroid")), 4).as("c_cos"))

  /** X161: exact dimension-covariance matrix — the PCA/whitening
    * precursor (which dimensions co-vary tells you the embedding
    * space's effective rank and feeds any downstream projection).
    *
    * Exactness strategy: components are quantized to integers
    * (round(x·10⁶) — floats carry ~7 significant digits, nothing is
    * lost) and every sum runs over DECIMAL — exact and ORDER-
    * INDEPENDENT, so the result is partition-count-invariant and
    * reproducible cross-engine (the stats_regression precedent; a
    * double Σ would depend on accumulation order). Covariance is then
    * closed-form double arithmetic over exact sums, rounded at 6 dp.
    *
    * Scale shape: the d²-per-row generate (pair of posexplodes) is
    * scan-stage CPU, immediately partially aggregated — the exchange
    * carries ≤ partitions × d(d+1)/2 rows, never rows × d². The
    * marginal-sum table (d rows) broadcasts back. Exact-sum magnitude
    * stays < 2⁵³ up to ~10⁹ unit-norm vectors; past that, raise the
    * final division to DECIMAL too. Returns (i, j, cov) for i ≤ j. */
  def covarianceMatrix(emb: DataFrame, vecCol: String = "embedding",
                       idCol: String = "vec_id"): DataFrame = {
    // quantized vector, then pairs generated IN-ROW: two stacked
    // generates (outer dim i, then the j >= i tail via slice) stay in
    // one scan stage with no shuffle between them — the id-keyed
    // self-join alternative hash-shuffles the rows×d exploded table
    // twice before any pair exists
    val qv = emb.select(
      transform(col(vecCol),
        x => round(x.cast("double") * 1e6, 0).cast("decimal(38,0)")).as("qv"))
    val withI = qv.select(col("qv"), posexplode(col("qv")).as(Seq("i", "xi")))
    val marg = withI.groupBy(col("i").cast("long").as("i"))
      .agg(sum(col("xi")).as("sx"), count(lit(1)).as("n"))
    val pairs = withI
      .select(col("i").cast("long").as("i"), col("xi"),
        posexplode(slice(col("qv"), col("i") + 1, size(col("qv")) - col("i")))
          .as(Seq("dj", "xj")))
      .select(col("i"), (col("i") + col("dj")).as("j"),
        (col("xi") * col("xj")).as("xy"))
      .groupBy(col("i"), col("j")).agg(sum(col("xy")).as("sxy"))
    pairs
      .join(broadcast(marg.select(col("i"), col("sx").as("sxi"), col("n"))), Seq("i"))
      .join(broadcast(marg.select(col("i").as("j"), col("sx").as("sxj"))), Seq("j"))
      .select(col("i"), col("j"),
        round((col("n").cast("double") * col("sxy").cast("double") -
               col("sxi").cast("double") * col("sxj").cast("double")) /
              (col("n").cast("double") * col("n").cast("double") * lit(1e12)), 6)
          .as("cov"))
      .orderBy(col("i"), col("j"))
  }

  /** X163: top-principal-component projection — PCA's first axis over
    * the X161 exact covariance matrix, the canonical embedding-space
    * health check (how much variance one direction eats) and the
    * projection every whitening/visualization step starts from.
    *
    * Determinism strategy: power iteration runs on INTEGERS end to
    * end — covariance at 10⁻⁶ (exact from X161's rounded output),
    * iterate v at 10⁻⁹ — so every matvec and norm is an exact
    * integer sum (order-free); the only floating steps are the
    * norm's sqrt and the final rounding, identical double ops in
    * both engines. Fixed v₀ = e₀ and a fixed iteration count make
    * the result (including the eigenvector's sign) reproducible
    * everywhere.
    *
    * Scale shape: the d×d matrix is BOUNDED METADATA (the IVF
    * centroid-collect precedent — 2080 rows at d=64), so the
    * iteration runs driver-side in microseconds and the loadings
    * broadcast back as literals; the actual data pass is the per-row
    * integer dot product (one generate-free projection inside the
    * scan, exact long arithmetic). Returns (vec_id, pc1). */
  def pcaProjection(emb: DataFrame, iters: Int = 8,
                    vecCol: String = "embedding",
                    idCol: String = "vec_id"): DataFrame = {
    val covRows = covarianceMatrix(emb, vecCol, idCol).collect()
    // empty input → empty projection (not a driver-side .max crash)
    if (covRows.isEmpty)
      return emb.select(col(idCol).cast("long").as("vec_id"),
        lit(0.0).as("pc1")).limit(0)
    val d = covRows.map(_.getLong(1)).max.toInt + 1
    val c = Array.ofDim[Long](d, d)
    covRows.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      val v = BigDecimal(r.getDouble(2) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      c(i)(j) = v; c(j)(i) = v
    }
    var m = Array.tabulate(d)(i => if (i == 0) 1000000000L else 0L) // v₀ = e₀ at 1e-9
    (1 to iters).foreach { _ =>
      val s = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * m(j)).sum) // exact
      val n = s.map(si => BigDecimal(si.toDouble / 1e15 * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      val normSq = n.map(x => BigInt(x) * BigInt(x)).sum
      val norm = math.sqrt(normSq.toDouble / 1e18)
      m = n.map { ni =>
        val v = BigDecimal(ni.toDouble / 1e9 / norm)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        BigDecimal(v * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    }
    val loadings = array(m.map(lit): _*)
    emb.select(col(idCol).cast("long").as("vec_id"),
        aggregate(
          zip_with(
            transform(col(vecCol), x => round(x.cast("double") * 1e6, 0).cast("long")),
            loadings, (q, l) => q * l),
          lit(0L), (acc, x) => acc + x).as("__dot"))
      .select(col("vec_id"),
        round(col("__dot").cast("double") / 1e15, 4).as("pc1"))
      .orderBy(col("vec_id"))
  }

  /** X144: embedding drift — per-group centroid agreement between two
    * deterministic halves of the corpus (even/odd ids stand in for
    * snapshot A/B; with real snapshots the split column is the
    * snapshot id). Completes the drift family: stats_ks watches a
    * numeric column, stats_psi the categorical mix, this the SEMANTIC
    * space — a label whose half-centroids diverge (low cosine) is
    * drifting or mislabeled. Two groupCentroids aggregates (map-side
    * combined, O(dim) state) + a |groups|-row join; the embedding
    * column never shuffles. */
  def centroidDrift(df: DataFrame, groupCol: String = "label",
                    vecCol: String = "embedding",
                    idCol: String = "vec_id"): DataFrame = {
    val a = groupCentroids(df.where(col(idCol) % 2 === 0), groupCol, vecCol)
      .select(col(groupCol), col("centroid").as("ca"), col("n").as("n_a"))
    val b = groupCentroids(df.where(col(idCol) % 2 === 1), groupCol, vecCol)
      .select(col(groupCol), col("centroid").as("cb"), col("n").as("n_b"))
    a.join(b, groupCol)
      .select(col(groupCol), col("n_a"), col("n_b"),
        round(cosine(col("ca"), col("cb")), 4).as("drift_cos"))
      .orderBy(col(groupCol))
  }
}
