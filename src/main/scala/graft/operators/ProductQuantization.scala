package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.expr.GraftHash
import graft.functions.TextFunctions.{cosine, topk}

/** Product quantization (PQ) for vector search at corpus scale
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): split each d-dim vector into `m` subvectors,
  * quantize each against its own K-entry codebook, store m small
  * codes — here 8 subspaces × 16 centroids = 8 nibbles per 64-dim
  * vector, a 64× cut vs float32 — and score queries against codes via
  * an ADC (asymmetric distance computation) lookup table without ever
  * reconstructing candidates.
  *
  * Codebooks are DATA-INDEPENDENT ±1 matrices from the library's
  * splitmix64 chain (the ann_ivf_fixed trick): reproducible from the
  * seed alone, identical on every executor, and embeddable in the
  * DuckDB oracle — at the cost of codebooks that tile direction space
  * uniformly instead of adapting to the data (k-means-trained
  * codebooks slot in by replacing `codebooks`).
  *
  * Scale shape:
  *  - encoding = one subspace explode + broadcast-codebook argmax +
  *    one shuffle on id (index build, amortized over queries);
  *  - scoring = broadcast the per-query LUT (m·K doubles per query),
  *    evaluate score as a FIXED-ORDER fold over the code array (a
  *    per-row expression — candidates and their codes never shuffle),
  *    reduce with the bounded-heap `graft_topk`, so only k rows per
  *    (partition, query) cross the exchange.
  */
object ProductQuantization {

  /** [m][K][dsub] ±1 codebooks; seed block 8192 keeps them disjoint
    * from the SRP planes (4096-offset IVF cells). */
  def codebooks(m: Int, numK: Int, dsub: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m, numK, dsub) { (j, c, d) =>
      if ((GraftHash.splitmix64(
        GraftHash.permSeed(8192 + j * numK + c) ^ (d * 0x9e3779b97f4a7c15L)) & 1L) == 1L) 1.0
      else -1.0
    }

  private def codebookDF(spark: org.apache.spark.sql.SparkSession,
                         m: Int, numK: Int, dsub: Int): DataFrame = {
    val rows = for {
      (cb, j) <- codebooks(m, numK, dsub).zipWithIndex
      (c, k) <- cb.zipWithIndex
    } yield Row(j, k, c.toSeq)
    val schema = StructType(Seq(
      StructField("j", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("cvec", ArrayType(DoubleType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** (id, j, sub): the m subvectors of each embedding, as doubles. */
  private def subvectors(emb: DataFrame, m: Int, dsub: Int,
                         vecCol: String, idCol: String): DataFrame = {
    val e = transform(col(vecCol), x => x.cast("double"))
    val subs = array((0 until m).map(j =>
      struct(lit(j).as("j"), slice(e, j * dsub + 1, dsub).as("sub"))): _*)
    emb.select(col(idCol).cast("long").as("id"), explode(subs).as("s"))
      .select(col("id"), col("s.j").as("j"), col("s.sub").as("sub"))
  }

  /** PQ encoding: (id, codes array<int>, position j holds subspace
    * j's code). Assignment = cosine argmax against the broadcast
    * codebook (±1 centroids share a norm per subspace, so cosine and
    * dot argmax agree); ties go to the HIGHEST code, the ann_ivf_fixed
    * convention. */
  def encode(emb: DataFrame, m: Int = 8, numK: Int = 16,
             vecCol: String = "embedding", idCol: String = "vec_id",
             dim: Int = 64): DataFrame = {
    require(dim % m == 0, "m must divide dim")
    val dsub = dim / m
    val cb = codebookDF(emb.sparkSession, m, numK, dsub)
    subvectors(emb, m, dsub, vecCol, idCol)
      .join(broadcast(cb), "j")
      .select(col("id"), col("j"), col("code"),
        call_function("graft_cosine", col("sub"), col("cvec")).as("s"))
      .groupBy(col("id"), col("j"))
      .agg(max(struct(col("s"), col("code"))).as("best"))
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("best.code").as("code")))),
        x => x.getField("code")).as("codes"))
  }

  /** (q_id, lut): per-query flattened m·K lookup table,
    * lut[j*K + code] = dot(q_sub_j, centroid_{j,code}); the dot is a
    * sequential fold, matching DuckDB's list_dot_product. */
  private def queryLut(queries: DataFrame, m: Int, numK: Int, dsub: Int,
                       vecCol: String, idCol: String): DataFrame = {
    val cb = codebookDF(queries.sparkSession, m, numK, dsub)
    subvectors(queries, m, dsub, vecCol, idCol)
      .join(broadcast(cb), "j")
      .select(col("id").as("q_id"), (col("j") * numK + col("code")).as("slot"),
        aggregate(zip_with(col("sub"), col("cvec"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x).as("w"))
      .groupBy(col("q_id"))
      .agg(transform(array_sort(collect_list(struct(col("slot"), col("w")))),
        x => x.getField("w")).as("lut"))
  }

  /** The ADC score: fixed-order fold Σ_j lut[j·K + code_j] over the
    * broadcast LUT — approximating ⟨q, reconstruction(x)⟩ as a per-row
    * expression. Expects `codes` and `lut` columns in scope. */
  private def adcScore(m: Int, numK: Int): Column =
    aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
        (c, j) => element_at(col("lut"), (j * numK + c + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x)

  /** Bounded-heap top-k + rank explode shared by the ADC variants. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("q_id"))
      .agg(topk(col("c_id"), col("score"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rank0", "t")))
      .select(col("q_id"), (col("rank0") + 1).as("rank"),
        col("t.id").as("c_id"), col("t.score").as("score"))

  /** ADC top-k over the FULL code store: every candidate's codes are
    * scored against each query's LUT. Returns (q_id, rank, c_id,
    * score). */
  def adcTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              m: Int = 8, numK: Int = 16,
              vecCol: String = "embedding", idCol: String = "vec_id",
              dim: Int = 64): DataFrame = {
    require(dim % m == 0, "m must divide dim")
    val dsub = dim / m
    val lut = queryLut(queries, m, numK, dsub, vecCol, idCol)
    val codes = encode(candidates, m, numK, vecCol, idCol, dim)
    rankTopK(
      codes.crossJoin(broadcast(lut))
        .where(col("q_id") =!= col("id"))
        .select(col("q_id"), col("id").as("c_id"), adcScore(m, numK).as("score")),
      k)
  }

  /** IVF-PQ: the composition a billion-vector index actually ships
    * (Jégou TPAMI'11 §IV) — IVF cells bound WHICH candidates a query
    * scores (nProbe/numCells of the corpus instead of all of it), PQ
    * codes bound the BYTES per scored candidate (m nibbles, 64× vs
    * float32 here).
    *
    * Index build = PQ codes + fixed-centroid cell per id, one id-keyed
    * join (both sides derive from the same scan; amortized over
    * queries). Query = broadcast (probe cells ⨝ LUT) per query — at
    * most nProbe rows × (m·K doubles) each — joined to the code store
    * ON CELL, so candidates outside probed cells are never read, the
    * ADC fold stays a per-row expression, and only k rows per
    * (partition, query) cross the final exchange. A candidate has
    * exactly one cell and probes are distinct, so no dedup stage is
    * needed between the cell join and the heap. */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                m: Int = 8, numK: Int = 16, numCells: Int = 16, nProbe: Int = 4,
                vecCol: String = "embedding", idCol: String = "vec_id",
                dim: Int = 64): DataFrame = {
    require(dim % m == 0, "m must divide dim")
    val dsub = dim / m
    val lut = queryLut(queries, m, numK, dsub, vecCol, idCol)
    val probes = Similarity.probeFixedCells(queries, vecCol, idCol, numCells, nProbe, dim)
    val indexed = encode(candidates, m, numK, vecCol, idCol, dim)
      .join(Similarity.assignFixedCells(candidates, vecCol, idCol, numCells, dim), "id")
    rankTopK(
      indexed.join(broadcast(probes.join(lut, "q_id")), "cell")
        .where(col("q_id") =!= col("id"))
        .select(col("q_id"), col("id").as("c_id"), adcScore(m, numK).as("score")),
      k)
  }

  /** Two-stage retrieval — the production serving shape: a cheap
    * approximate stage (IVF-PQ: probed cells bound WHICH candidates,
    * codes bound BYTES per candidate) nominates a pool of `poolSize`
    * ids per query, then ONLY that pool is re-scored against the full
    * float vectors for an exact final ranking. Recovers most of the
    * accuracy ADC quantization gives up while still never exact-scoring
    * more than |queries|·poolSize candidates.
    *
    * Scale shape: stage 1 is ivfPqTopK unchanged; the pool
    * (|queries|·poolSize id pairs — query-side-sized, never
    * corpus-sized) broadcasts to the candidate store, so the full
    * vectors are read WHERE THEY SIT: no corpus shuffle, the exact
    * cosine rides the candidate scan, and the bounded-heap top-k again
    * moves only k rows per (partition, query). */
  def rerankTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                 poolSize: Int = 30,
                 m: Int = 8, numK: Int = 16, numCells: Int = 16, nProbe: Int = 4,
                 vecCol: String = "embedding", idCol: String = "vec_id",
                 dim: Int = 64): DataFrame = {
    val pool = ivfPqTopK(queries, candidates, poolSize, m, numK, numCells,
        nProbe, vecCol, idCol, dim)
      .select(col("q_id"), col("c_id"))
    val cv = candidates.select(col(idCol).cast("long").as("c_id"), col(vecCol).as("__cv"))
    val qv = queries.select(col(idCol).cast("long").as("q_id"), col(vecCol).as("__qv"))
    rankTopK(
      cv.join(broadcast(pool), "c_id").join(broadcast(qv), "q_id")
        .select(col("q_id"), col("c_id"), cosine(col("__qv"), col("__cv")).as("score")),
      k)
  }
}
