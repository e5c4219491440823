package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.wordShingles

/** Distribution-level repetition signals (the Gopher/RefinedWeb-style
  * quality rules that need per-n-gram counts, not just per-row
  * expressions like L9's repetitionRatio).
  *
  * Scale shape: explode n-grams in the scan stage, count per
  * (doc, gram) with map-side combine, then collapse per doc — two
  * shuffles on natural keys whose cardinality shrinks at each step.
  * No collected state, no windows over unbounded partitions.
  */
object TextStats {

  /** Per-document n-gram repetition: `top_frac` = share of the doc's
    * n-gram occurrences taken by its single most frequent n-gram,
    * `dup_frac` = share of occurrences beyond each gram's first
    * (1 - distinct/total). High values of either flag boilerplate /
    * template/spam docs for the quality filter. */
  def ngramRepetition(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", n: Int = 2): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(wordShingles(col(textCol), n)).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("total"),
        max(col("c")).as("top_n"),
        count(lit(1)).as("n_distinct"))
      .select(col("doc_id"), col("total"),
        round(col("top_n").cast("double") / col("total"), 4).as("top_frac"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("total"), 4).as("dup_frac"))
}
