package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.shingleHashes

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
}
