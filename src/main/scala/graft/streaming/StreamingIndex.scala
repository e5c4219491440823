package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.InvertedIndex

/** Streaming index maintenance: keep a chunked inverted index
  * (InvertedIndex.fieldValuesChunked schema) current as documents
  * stream in — the reference engine's index surface, maintained
  * incrementally instead of rebuilt per query.
  *
  * Per micro-batch: build the DELTA index from just the batch's
  * documents (one small aggregation), merge it into the prior index
  * version with `InvertedIndex.mergeChunked` — a full-outer join on
  * (value, chunk) in which untouched chunks pass through and only
  * chunks the batch actually touches rewrite — and commit the result
  * as the next store version. Merge cost per batch is
  * O(delta + touched chunks), never O(corpus); at cluster scale the
  * store lives bucketed on (value, chunk) so the join shuffles only
  * the delta.
  *
  * Crash safety is the VersionedStore contract: a replayed batch
  * re-reads the version strictly below its id (never its own crashed
  * half-write) and re-produces the SAME merged index, so the store is
  * effectively exactly-once even though the loop is at-least-once.
  * Precondition (append-only log, same as mergeChunked): doc ids never
  * repeat across batches.
  */
object StreamingIndex {

  /** Start the maintenance loop. `onCommit` (optional) receives the
    * freshly committed full index each batch. */
  def fieldValuesForeachBatch(stream: DataFrame, stateDir: String, fieldName: String,
                              chunkSize: Long = 1 << 20,
                              docIdCol: String = "doc_id")
                             (onCommit: DataFrame => Unit = _ => ()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, stateDir, fieldName, chunkSize, docIdCol, onCommit)
      }
      .outputMode("append")
      .start()

  private[graft] def processBatch(batch: DataFrame, batchId: Long, stateDir: String,
                                  fieldName: String, chunkSize: Long,
                                  docIdCol: String,
                                  onCommit: DataFrame => Unit): Unit = {
    val spark = batch.sparkSession
    val delta = InvertedIndex.fieldValuesChunked(batch, fieldName, chunkSize, docIdCol)
    val priorVersion = VersionedStore.latestBelow(spark, stateDir, batchId)
    val merged = priorVersion match {
      case Some(v) => InvertedIndex.mergeChunked(
        spark.read.parquet(VersionedStore.path(stateDir, v)), delta)
      case None => delta
    }
    VersionedStore.commit(spark, merged, stateDir, batchId)
    VersionedStore.prune(spark, stateDir, keepFrom = priorVersion.getOrElse(batchId))
    onCommit(currentIndex(spark, stateDir))
  }

  /** The latest committed index (empty-schema error if none yet). */
  def currentIndex(spark: SparkSession, stateDir: String): DataFrame = {
    val vs = VersionedStore.versions(spark, stateDir)
    require(vs.nonEmpty, s"no committed index versions under $stateDir")
    spark.read.parquet(VersionedStore.path(stateDir, vs.max))
  }

  /** Time travel: the committed index AS OF `version` — the latest
    * commit ≤ version, i.e. exactly what a reader at that batch would
    * have seen. The store's crash-safety pruning keeps the prior
    * version alongside the current one, so the immediately preceding
    * snapshot is always addressable; deeper history is a retention
    * policy (skip the prune), not a format change — every version is
    * a self-contained parquet snapshot. */
  def indexAsOf(spark: SparkSession, stateDir: String, version: Long): DataFrame = {
    val v = VersionedStore.latestBelow(spark, stateDir, version + 1)
    require(v.nonEmpty, s"no committed index version <= $version under $stateDir")
    spark.read.parquet(VersionedStore.path(stateDir, v.get))
  }
}
