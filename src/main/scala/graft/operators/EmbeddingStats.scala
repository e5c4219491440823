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
    // rows × d(d+1)/2 pair terms are generated IN the scan stage — it
    // must not run at a single unsplittable split's parallelism.
    // Spread the NARROW projection first (Parallelize.spreadScan,
    // no-op when the scan already splits), quantize above it so the
    // per-component compute runs at session parallelism too.
    val qv = Parallelize.spreadScan(emb.select(col(vecCol).as("__v")))
      .select(transform(col("__v"),
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
  /** The shared power-iteration core: top-eigenvector loadings at
    * 10⁻⁹ (integer), from the X161 exact covariance — None on empty
    * input. Driver-side over the d×d BOUNDED-METADATA matrix; see
    * [[pcaProjection]] for the determinism argument. */
  private[graft] def topLoadings(emb: DataFrame, iters: Int,
                                 vecCol: String, idCol: String): Option[Array[Long]] = {
    val covRows = covarianceMatrix(emb, vecCol, idCol).collect()
    if (covRows.isEmpty) return None
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
    Some(m)
  }

  def pcaProjection(emb: DataFrame, iters: Int = 8,
                    vecCol: String = "embedding",
                    idCol: String = "vec_id"): DataFrame = {
    val mOpt = topLoadings(emb, iters, vecCol, idCol)
    // empty input → empty projection (not a driver-side .max crash)
    if (mOpt.isEmpty)
      return emb.select(col(idCol).cast("long").as("vec_id"),
        lit(0.0).as("pc1")).limit(0)
    val m = mOpt.get
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

  /** X196: all-but-the-top embedding post-processing (Mu & Viswanath
    * 2018, "All-but-the-Top: Simple and Effective Postprocessing for
    * Word Representations"): mean-center each vector and remove its
    * projection onto the top principal direction — the anisotropy fix
    * that reliably improves similarity quality of trained embeddings.
    * Per vector this returns the removed coefficient c₁ = v̂ᵀ(x−μ)/‖v̂‖²
    * and the residual norm ‖(x−μ) − c₁v̂‖ — the two diagnostics a
    * pipeline reads (how much common-direction energy each vector
    * carried, what survives).
    *
    * Determinism: μ is quantized at 10⁻⁶ by exact integer
    * half-away-from-zero division of the DECIMAL dim sums, v̂ is the
    * integer power-iteration loadings ([[topLoadings]]), and every
    * per-row sum (dot, squared norm) is EXACT LONG arithmetic —
    * |y|≤2·10⁶, |m|≤10⁹, d=64 keeps everything under 2⁶³. The final
    * c₁/residual combination is a fixed sequence of IEEE double ops
    * mirrored verbatim by the DuckDB twin.
    *
    * Scale shape: two bounded-metadata driver artifacts (the d-row
    * dim sums and the d loadings) broadcast back as literals; the
    * data pass is one generate-free per-row projection inside the
    * scan — the same shape as [[pcaProjection]]. */
  def allButTop(emb: DataFrame, iters: Int = 8,
                vecCol: String = "embedding",
                idCol: String = "vec_id"): DataFrame = {
    val mOpt = topLoadings(emb, iters, vecCol, idCol)
    if (mOpt.isEmpty)
      return emb.select(col(idCol).cast("long").as("vec_id"),
        lit(0.0).as("c1"), lit(0.0).as("resid_norm")).limit(0)
    val m = mOpt.get
    // d-row exact dim sums -> quantized mean (bounded metadata, the
    // covariance marg shape)
    val sums = emb
      .select(posexplode(transform(col(vecCol),
        x => round(x.cast("double") * 1e6, 0).cast("decimal(38,0)")))
        .as(Seq("i", "xq")))
      .groupBy(col("i")).agg(sum(col("xq")).as("sx"), count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> (BigInt(r.getDecimal(1).toBigInteger), r.getLong(2)))
      .toMap
    val d = m.length
    val n = sums.head._2._2
    val muq = Array.tabulate(d) { i =>
      val sx = sums(i)._1
      // exact half-away-from-zero integer division sx / n at 10^-6
      val q = (sx.abs * 2 + n) / (2 * n)
      (if (sx < 0) -q else q).toLong
    }
    val bDouble = m.map(x => BigInt(x) * BigInt(x)).sum.toDouble
    val muArr = array(muq.map(lit): _*)
    val mArr = array(m.map(lit): _*)
    val xq = transform(col(vecCol), x => round(x.cast("double") * 1e6, 0).cast("long"))
    val yq = zip_with(xq, muArr, (a, b) => a - b)
    val dot = aggregate(zip_with(yq, mArr, (a, b) => a * b), lit(0L), _ + _)
    val n2 = aggregate(transform(yq, a => a * a), lit(0L), _ + _)
    val c1 = dot.cast("double") * lit(1000.0) / lit(bDouble)
    val resid = sqrt(greatest(
      n2.cast("double") / lit(1e12) - c1 * c1 * lit(bDouble) / lit(1e18), lit(0.0)))
    emb.select(col(idCol).cast("long").as("vec_id"),
        round(c1, 4).as("c1"), round(resid, 4).as("resid_norm"))
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
  /** X204: leave-one-out kNN label classification over the banded
    * kNN graph — the label-quality audit (a vector whose neighbors
    * vote a DIFFERENT label is a mislabel/boundary candidate, and the
    * aggregate accuracy scores the labeling itself). Prediction =
    * most frequent label among the top-k neighbors, ties toward the
    * SMALLEST label — a total order, all integers.
    *
    * Takes the prebuilt (q_id, rank, c_id, …) kNN table so the edge
    * substrate is shared with the graph family (banded: no all-pairs
    * scorer); the label join broadcasts the id→label table against
    * the kN-bounded edge list, and only vectors the banding gave ≥1
    * neighbor are classified (coverage is the banded graph's). */
  def knnClassify(knn: DataFrame, labels: DataFrame,
                  idCol: String = "vec_id",
                  labelCol: String = "label"): DataFrame = {
    val lab = labels.select(col(idCol).cast("long").as("__id"),
      col(labelCol).cast("long").as("__lab"))
    val votes = knn
      .join(lab.select(col("__id").as("c_id"), col("__lab").as("nbr_label")),
        "c_id")
      .groupBy(col("q_id"), col("nbr_label"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("q_id"))
      .agg(min_by(col("nbr_label"),
        struct((-col("cnt")).as("nc"), col("nbr_label"))).as("predicted"))
    votes.join(lab.select(col("__id").as("q_id"), col("__lab").as("label")),
        "q_id")
      .select(col("q_id").as(idCol), col("label"), col("predicted"),
        when(col("label") === col("predicted"), 1L).otherwise(0L)
          .as("correct"))
      .orderBy(col(idCol))
  }

  /** X205: simplified silhouette score per vector (Rousseeuw 1987,
    * cosine-distance form) — the cluster-quality readout over the
    * label column: a ≈ mean distance to own group, b = best other
    * group, s = (b − a)/max(a, b) ∈ [−1, 1]; negative s marks vectors
    * sitting closer to another label's cloud than their own.
    *
    * The n² pairwise formulation collapses via linearity: the mean
    * cosine of v to group G is dot(v̂, Σ_{u∈G} û)/|G|, so ONE
    * aggregation builds per-label sums of NORMALIZED vectors
    * (`graft_vec_sum`, components rounded at 6 dp — the
    * [[groupCentroids]] stabilization), the |labels|-row table
    * broadcasts, and each vector computes |labels| fixed-order dot
    * products inside its scan stage — O(n·|labels|·dim) total, no
    * pairwise join anywhere. The own-group mean excludes self:
    * (dot − 1)/(n_g − 1). Singleton-group vectors have no a and drop
    * (the standard convention). Distances are 1 − mean cosine;
    * round(4) absorbs the engines' sub-ulp dot wobble. */
  def silhouette(df: DataFrame, groupCol: String = "label",
                 vecCol: String = "embedding",
                 idCol: String = "vec_id"): DataFrame = {
    // widen BEFORE multiplying: a float×float square would round at
    // float precision where the twin squares doubles
    def sq_(c: String) = aggregate(transform(col(c),
      x => x.cast("double") * x.cast("double")),
      lit(0.0), (a, x) => a + x)
    // normalization + |labels| per-row dot products are scan-stage CPU
    // — spread the narrow projection first (no-op at scale), compute
    // above it so it runs at session parallelism
    val normed = Parallelize.spreadScan(
      df.select(col(idCol).cast("long").as("__id"),
        col(groupCol).cast("long").as("__g"), col(vecCol).as("__v")))
      .select(col("__id"), col("__g"),
        transform(col("__v"), x => x.cast("double") / sqrt(sq_("__v"))).as("__nv"))
    val sums = normed.groupBy(col("__g"))
      .agg(call_function("graft_vec_sum", col("__nv")).as("__s"),
        count(lit(1)).as("__n"))
      .select(col("__g").as("__sg"),
        transform(col("__s"), x => round(x, 6)).as("__sv"), col("__n"))
    // Collapse the |labels| sum rows into ONE array row: scoring is a
    // 1-row broadcast + a per-row fold over the label sums, so neither
    // an n-row join nor a re-aggregation by id ever exists in the plan
    // — the n×|labels| intermediate of the split-leg formulation never
    // materializes. Array order is irrelevant: the own entry is found
    // by key, the other-group best by an order-free min.
    val packed = sums.agg(collect_list(
      struct(col("__sg"), col("__sv"), col("__n"))).as("__gs"))
    val dots = transform(col("__gs"), g => struct(
      aggregate(zip_with(col("__nv"), g.getField("__sv"), (a, b) => a * b),
        lit(0.0), (a, x) => a + x).as("d"),
      g.getField("__sg").as("sg"), g.getField("__n").as("n")))
    val scored = normed.crossJoin(broadcast(packed))
      .select(col("__id"), col("__g"), dots.as("__dots"))
    val ownArr = filter(col("__dots"),
      d => d.getField("sg") === col("__g") && d.getField("n") > 1)
    val othersArr = transform(
      filter(col("__dots"), d => d.getField("sg") =!= col("__g")),
      d => struct((lit(1.0) - d.getField("d") /
        d.getField("n").cast("double")).as("od"),
        d.getField("sg").as("__sg")))
    scored
      .select(col("__id"), col("__g"), ownArr.as("__own"),
        array_min(othersArr).as("b"))
      // singleton-own-group vectors have no a (standard convention);
      // a lone label has no b — both drop, as the old inner join did
      .where(size(col("__own")) === 1 && col("b").isNotNull)
      .select(col("__id"), col("__g"),
        (lit(1.0) - (element_at(col("__own"), 1).getField("d") - 1.0) /
          (element_at(col("__own"), 1).getField("n") - 1).cast("double"))
          .as("a_dist"),
        col("b.od").as("b_dist"), col("b.__sg").as("nearest_other"))
      .select(col("__id").as(idCol), col("__g").as(groupCol),
        round(col("a_dist"), 4).as("a_dist"),
        round(col("b_dist"), 4).as("b_dist"),
        col("nearest_other"),
        round((col("b_dist") - col("a_dist")) /
          greatest(col("a_dist"), col("b_dist")), 4).as("sil"))
      .orderBy(col(idCol))
  }

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
