package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.{cosine, shingleHashes}

/** Benchmark decontamination — remove training documents that overlap
  * an evaluation/benchmark set (the standard n-gram-overlap rule used
  * before pre-training: a doc sharing any sufficiently long n-gram
  * with a benchmark item is suspect).
  *
  * Scale shape: the benchmark set is tiny relative to the corpus
  * (thousands of eval items vs billions of docs), so its DISTINCT
  * shingle set is built once and BROADCAST; the corpus side explodes
  * shingles in the scan stage and probes the broadcast hash relation —
  * the 100 TB corpus never shuffles. The per-doc hit count then
  * aggregates on doc id with map-side combine. If the benchmark
  * shingle set ever outgrows broadcast range, the same query runs as
  * a shuffled semi-join — the code is identical minus the hint.
  */
object Decontaminate {

  /** Distinct n-gram shingle HASHES of the benchmark set (the fused
    * single-pass kernel; strings never materialize — a 64-bit FNV
    * collision is the only false-positive source, negligible at any
    * corpus size). */
  def benchmarkShingles(benchmark: DataFrame, textCol: String = "text",
                        n: Int = 5): DataFrame =
    benchmark.where(col(textCol).isNotNull)
      .select(explode(shingleHashes(col(textCol), n)).as("shingle"))
      .distinct()

  /** Per-document contamination report: (doc_id, n_hits) for every
    * corpus doc sharing ≥1 distinct n-gram with any benchmark doc.
    * n_hits counts the doc's DISTINCT contaminated shingles. */
  def contaminationHits(corpus: DataFrame, benchmark: DataFrame,
                        textCol: String = "text", idCol: String = "doc_id",
                        n: Int = 5): DataFrame = {
    val bench = benchmarkShingles(benchmark, textCol, n)
    corpus.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(shingleHashes(col(textCol), n)).as("shingle"))
      .join(broadcast(bench), "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The decontaminated corpus: drop docs with ≥ `minHits` overlapping
    * shingles (minHits=1 is the standard strict rule). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id",
                    n: Int = 5, minHits: Long = 1L): DataFrame = {
    val hits = contaminationHits(corpus, benchmark, textCol, idCol, n)
      .where(col("n_hits") >= minHits)
      .select(col("doc_id").as(idCol))
    corpus.join(hits, Seq(idCol), "left_anti")
  }

  /** Embedding-level decontamination — the semantic leg of the family:
    * a train vector is contaminated when its cosine to ANY benchmark
    * vector reaches `tau` (catches the paraphrased/translated
    * benchmark leakage the n-gram rule cannot see; the complement of
    * `contaminationHits`, same report shape).
    *
    * Scale shape mirrors the n-gram path: the benchmark side is tiny
    * and BROADCAST; each train vector's max-benchmark-cosine is
    * computed where the train rows live with the fused codegen cosine,
    * and only (id, max) crosses the exchange — the corpus never
    * shuffles, the join never materializes train×bench rows beyond the
    * scan stage. Returns (vec_id, max_cos, contaminated) for every
    * train vector. */
  def semanticHits(train: DataFrame, benchmark: DataFrame, tau: Double = 0.3,
                   vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val b = benchmark.select(col(idCol).cast("long").as("b_id"), col(vecCol).as("b_vec"))
    val t = train.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("t_vec"))
    t.crossJoin(broadcast(b))
      .select(col("vec_id"), cosine(col("t_vec"), col("b_vec")).as("cos"))
      .groupBy(col("vec_id"))
      .agg(max(col("cos")).as("mc"))
      .select(col("vec_id"), round(col("mc"), 4).as("max_cos"),
        (col("mc") >= tau).as("contaminated"))
  }

  // ---- Bloom-prefiltered variant (the 100 TB escape hatch) -----------

  /** Serialized Bloom sketch over the benchmark's distinct shingle
    * hashes (Spark's split-block BloomFilter, the same machinery
    * behind runtime join filters). Sized for `fpp` at the observed
    * item count; ~1.2 bytes/shingle at 1% — 10–20× smaller than the
    * exact hash relation the broadcast join would build. None when
    * the benchmark has no shingles. */
  def benchmarkBloomBytes(benchmark: DataFrame, textCol: String = "text",
                          n: Int = 5, fpp: Double = 0.01): Option[Array[Byte]] = {
    require(fpp > 0 && fpp < 1, "fpp in (0,1)")
    val bench = benchmarkShingles(benchmark, textCol, n)
    val items = bench.count()
    if (items == 0L) None
    else {
      val ln2 = math.log(2)
      val numBits = math.max(64L, math.ceil(-items * math.log(fpp) / (ln2 * ln2)).toLong)
      Some(bench.agg(
          call_function("graft_bloom_agg", col("shingle"), lit(items), lit(numBits)))
        .head.getAs[Array[Byte]](0))
    }
  }

  /** `contaminationHits`, re-planned for a benchmark shingle set too
    * large to broadcast as an exact hash relation. The corpus probes a
    * broadcast Bloom SKETCH first (no false negatives, so no hit is
    * lost), which drops all but ~fpp of the non-contaminated shingles
    * BEFORE any exchange; only the survivors take the shuffled exact
    * join that removes Bloom false positives. Output is row-identical
    * to `contaminationHits` — the sketch only prunes, the exact join
    * decides. At 100 TB this converts a full-corpus-shingle shuffle
    * into a shuffle of roughly corpus_hits + fpp·corpus_shingles rows. */
  def contaminationHitsBloom(corpus: DataFrame, benchmark: DataFrame,
                             textCol: String = "text", idCol: String = "doc_id",
                             n: Int = 5, fpp: Double = 0.01): DataFrame =
    benchmarkBloomBytes(benchmark, textCol, n, fpp) match {
      case None =>
        corpus.select(col(idCol).cast("long").as("doc_id"),
          lit(0L).as("n_hits")).where(lit(false))
      case Some(sketch) =>
        val bench = benchmarkShingles(benchmark, textCol, n)
        corpus.where(col(textCol).isNotNull)
          .select(col(idCol).cast("long").as("doc_id"),
            explode(shingleHashes(col(textCol), n)).as("shingle"))
          .where(call_function("graft_bloom_contains", lit(sketch), col("shingle")))
          .join(bench.hint("shuffle_hash"), "shingle")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_hits"))
    }

  /** `decontaminate` on the Bloom-prefiltered path; result-identical. */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String = "text", idCol: String = "doc_id",
                         n: Int = 5, minHits: Long = 1L, fpp: Double = 0.01): DataFrame = {
    val hits = contaminationHitsBloom(corpus, benchmark, textCol, idCol, n, fpp)
      .where(col("n_hits") >= minHits)
      .select(col("doc_id").as(idCol))
    corpus.join(hits, Seq(idCol), "left_anti")
  }
}
