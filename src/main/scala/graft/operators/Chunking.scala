package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sliding-window document chunking — the context-window slicer every
  * LLM training pipeline runs between cleaning and packing: each
  * document's token stream is cut into windows of `window` tokens
  * advancing by `stride` (stride < window ⇒ overlapping chunks, the
  * standard trick so no span is ever split across a training example
  * boundary).
  *
  * Scale shape: everything is a per-row array transform riding the
  * scan — tokenize, window-index enumeration, and slicing all happen
  * inside one projection, and the only row-count change is the explode
  * whose fan-out is ⌈len/stride⌉ per doc (bounded by design; a 100 TB
  * corpus chunks with zero shuffles and chunks inherit the input
  * partitioning). Contrast with a posexplode-then-group-by-window
  * formulation, which would shuffle every token.
  *
  * Chunk count follows the reference tokenizer convention: one chunk
  * when len ≤ window, else 1 + ⌈(len − window)/stride⌉ — the final
  * chunk may be shorter than `window` but always starts ≤ len−1.
  */
object Chunking {

  /** (doc_id, chunk_idx, n_toks, chunk) rows; `chunk` is the
    * re-joined token window text. */
  def chunkTokens(docs: DataFrame, window: Int, stride: Int,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(window > 0, "window must be positive")
    require(stride > 0 && stride <= window, "stride in [1, window]")
    val t = TextFunctions.tokens(col(textCol))
    val nChunks = when(size(col("t")) <= window, lit(1))
      .otherwise(ceil((size(col("t")) - window) / lit(stride.toDouble)).cast("int") + 1)
    docs
      .select(col(idCol).cast("long").as("doc_id"), t.as("t"))
      .select(col("doc_id"), col("t"), nChunks.as("nc"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("nc") - 1), i =>
          struct(i.cast("long").as("chunk_idx"),
            slice(col("t"), i * stride + 1, lit(window)).as("toks")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        size(col("c.toks")).cast("long").as("n_toks"),
        concat_ws(" ", col("c.toks")).as("chunk"))
  }

  /** Driver-entry summary: chunk hashes instead of chunk bodies so the
    * oracle compare stays compact while still pinning exact content. */
  def chunkSummary(docs: DataFrame, window: Int, stride: Int): DataFrame =
    chunkTokens(docs, window, stride)
      .select(col("doc_id"), col("chunk_idx"), col("n_toks"),
        md5(col("chunk")).as("h"))
}
