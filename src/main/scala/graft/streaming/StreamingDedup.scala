package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup
import graft.functions.TextFunctions.minhashText

/** Streaming deduplication (L1/L2's streaming twins).
  *
  * Exact: keyed on the 128-bit content hash so the state store holds
  * hashes, not documents. With a watermark + event-time column handled
  * via `dropDuplicatesWithinWatermark`, state for hashes older than
  * the watermark is dropped — bounded state on an unbounded stream,
  * which is the only honest way to run exact dedup forever.
  * `exactForever` keeps hashes indefinitely (exactly-once dedup across
  * all time) — correct, but state grows with distinct documents; use
  * the watermarked form unless the key space is known-bounded.
  *
  * Near-dup: "drop a document if ANY of its LSH bands matches an
  * earlier document" needs doc-level aggregation across band buckets,
  * which no single stateful-operator key can express — so
  * `nearDupForeachBatch` runs the batch LSH machinery per micro-batch
  * against a compact signature store (ids + MinHash signatures, never
  * documents), the standard production shape for streaming near-dup.
  */
object StreamingDedup {

  /** Dedup within the watermark horizon: a duplicate arriving within
    * `watermark` of the original is dropped; state is evicted after. */
  def exactWithinWatermark(stream: DataFrame, textCol: String = "text",
                           tsCol: String = "ts",
                           watermark: String = "1 hour"): DataFrame =
    stream.withColumn("__h", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")

  /** Dedup across all time: state holds every distinct content hash. */
  def exactForever(stream: DataFrame, textCol: String = "text"): DataFrame =
    stream.withColumn("__h", md5(col(textCol)))
      .dropDuplicates("__h")
      .drop("__h")

  /** Single-operator near-EXACT variant: dedup on the full MinHash
    * signature within the watermark. Catches documents whose shingle
    * SETS are identical (reordered sentences, repeated paragraphs,
    * whitespace variants) at the cost of one 8-byte state key per doc
    * — but it is NOT near-dup: a single changed token changes the
    * signature. For true near-dup semantics use nearDupForeachBatch. */
  def signatureWithinWatermark(stream: DataFrame, textCol: String = "text",
                               tsCol: String = "ts", watermark: String = "1 hour",
                               shingleSize: Int = 3, numHashes: Int = 128): DataFrame =
    stream.where(col(textCol).isNotNull)
      .withColumn("__sig", xxhash64(minhashText(col(textCol), shingleSize, numHashes)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")

  /** L2 streaming twin: MinHash+LSH near-dup dedup over a stream.
    *
    * Per micro-batch: signatures ride the scan (fused expression),
    * LSH banding generates candidates within the batch AND against the
    * signature store of previously emitted docs, candidates are
    * verified with the signature-estimated Jaccard (the store holds
    * (id, ts, sig) — ~1 KB/doc at 128 hashes — never text), survivors
    * are handed to `sink` and appended to the store, and store entries
    * older than `horizonMinutes` behind the batch's max event time are
    * pruned — the watermark analog that keeps state bounded on an
    * unbounded stream. Within a batch the lowest id of a verified pair
    * survives, matching the batch pipeline's keep-first rule.
    *
    * The store is a versioned parquet directory (state/v<batchId>) so
    * a restart resumes from the last committed batch's state. Crash
    * safety: batch N reads the max version STRICTLY BELOW N — so a
    * replay of batch N after a crash between the state write and the
    * streaming checkpoint commit re-reads the same prior state it read
    * the first time, never its own half-written output — and writes go
    * to a temp path renamed into place, so a partially written version
    * is never picked up. The previous version is kept until the NEXT
    * batch commits (replay of N still needs it); older versions are
    * pruned. The sink is AT-LEAST-ONCE: a replayed batch re-invokes
    * `sink` with the same survivors — idempotent sinks (overwrite by
    * batch id, upsert by doc id) see exactly-once results. At cluster
    * scale the same loop runs unchanged with the store on a real table
    * format; the per-batch cost is one band-key join of batch × store.
    */
  def nearDupForeachBatch(stream: DataFrame, stateDir: String,
                          textCol: String = "text", idCol: String = "doc_id",
                          tsCol: String = "ts", horizonMinutes: Long = 60,
                          threshold: Double = 0.8, numHashes: Int = 128,
                          bands: Int = 16, shingleSize: Int = 3,
                          maxBucket: Int = 100)
                         (sink: DataFrame => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch, batchId, stateDir, textCol, idCol, tsCol,
          horizonMinutes, threshold, numHashes, bands, shingleSize, maxBucket, sink)
      }
      .outputMode("update")
      .start()

  private[graft] def processBatch(batch: DataFrame, batchId: Long, stateDir: String,
                           textCol: String, idCol: String, tsCol: String,
                           horizonMinutes: Long, threshold: Double, numHashes: Int,
                           bands: Int, shingleSize: Int, maxBucket: Int,
                           sink: DataFrame => Unit): Unit = {
    val spark = batch.sparkSession
    val sigs = batch.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        col(textCol).as("text"),
        minhashText(col(textCol), shingleSize, numHashes).as("sig"))
      .persist()
    try {
      if (sigs.isEmpty) { sink(sigs.select("id", "ts", "text")); return }
      val bandedNew = Dedup.bandSignatures(sigs.select("id", "sig"), numHashes, bands)
      // the horizon prunes BEFORE matching: an entry older than
      // horizonMinutes behind this batch's max event time no longer
      // suppresses anything (and is dropped from the next store
      // version) — the watermark analog for the signature store
      val maxTs = sigs.agg(max(col("ts"))).head.getTimestamp(0)
      val cutoff = new java.sql.Timestamp(maxTs.getTime - horizonMinutes * 60000L)
      // strictly-below-batchId: a replayed batch must re-read the same
      // prior state, not the version its crashed first attempt wrote
      val priorVersion = VersionedStore.latestBelow(spark, stateDir, batchId)
      val prior = priorVersion
        .map(v => spark.read.parquet(VersionedStore.path(stateDir, v))
          .where(col("ts") >= cutoff))

      // duplicates of previously emitted docs: band-key join against
      // the store, verified with the signature-estimated Jaccard
      val dupVsState = prior match {
        case Some(st) =>
          val bandedOld = Dedup.bandSignatures(
            st.select(col("id"), col("sig")), numHashes, bands)
            .withColumnRenamed("id", "old_id")
          bandedNew.join(bandedOld, Seq("band", "bhash"))
            .where(col("id") =!= col("old_id"))
            .select("id", "old_id").distinct()
            .join(sigs.select(col("id"), col("sig")), "id")
            .join(st.select(col("id").as("old_id"), col("sig").as("old_sig")), "old_id")
            .where(Dedup.estimatedJaccard(col("sig"), col("old_sig"), numHashes) >= threshold)
            .select("id").distinct()
        case None => spark.emptyDataFrame.select(lit(0L).as("id")).limit(0)
      }
      // duplicates within the batch: keep the lowest id of each pair.
      // The raw text IS present in the batch, so verify with exact
      // n-gram Jaccard — same rule as the batch twin (minhashLshPairs);
      // the signature ESTIMATE is reserved for matches against the
      // store, where signatures are genuinely all that remains.
      val dupInBatch = Dedup.verifyJaccard(
          Dedup.bucketPairs(bandedNew, maxBucket), sigs,
          textCol = "text", idCol = "id", shingleSize = shingleSize)
        .where(col("jaccard") >= threshold)
        .select(col("id2").as("id")).distinct()

      val dupIds = dupVsState.union(dupInBatch).distinct()
      val survivors = sigs.join(dupIds, Seq("id"), "left_anti").persist()
      try {
        sink(survivors.select("id", "ts", "text"))
        // new store version: prior entries still inside the horizon +
        // this batch's survivors
        val newState = prior match {
          case Some(k) => k.select("id", "ts", "sig")
            .unionByName(survivors.select("id", "ts", "sig"))
          case None => survivors.select("id", "ts", "sig")
        }
        VersionedStore.commit(spark, newState, stateDir, batchId)
        // keep the version this batch read (a replay of this batch
        // still needs it); prune everything older
        VersionedStore.prune(spark, stateDir, keepFrom = priorVersion.getOrElse(batchId))
      } finally survivors.unpersist()
    } finally sigs.unpersist()
  }

}
