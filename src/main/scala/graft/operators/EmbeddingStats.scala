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
