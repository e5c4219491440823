package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of embedding columns — the standard 4×
  * compression for vector search at corpus scale (a 100 TB float32
  * embedding store becomes 25 TB of int8 + one float scale per
  * vector, cutting memory traffic for every distance computation).
  *
  * Per-vector symmetric max-abs quantization:
  * scale = max|x| / 127, q_i = round(x_i / max|x| · 127), so
  * dequantized q_i·scale differs from x_i by at most scale/2 and the
  * quantized cosine stays within ~1e-3 of exact for typical
  * distributions (QuantizationSpec pins both bounds).
  *
  * Everything is a per-row array transform riding the scan — no
  * shuffle, no UDF; the rounding is `floor(x + 0.5)` (half-up) so any
  * engine reproducing the same doubles reproduces the same ints.
  */
object Quantization {

  private def toDouble(vecCol: Column): Column =
    transform(vecCol, x => x.cast("double"))

  /** (vec_id, e, maxabs, scale, q): original doubles, per-vector
    * scale, int8 codes. `maxabs = 0` (the zero vector) quantizes to
    * all-zero codes with scale 0. */
  def quantizeInt8(emb: DataFrame, vecCol: String = "embedding",
                   idCol: String = "vec_id"): DataFrame = {
    val e = col("e")
    val maxabs = array_max(transform(e, x => abs(x)))
    emb.select(col(idCol).cast("long").as("vec_id"), toDouble(col(vecCol)).as("e"))
      .select(col("vec_id"), e, maxabs.as("maxabs"))
      .select(col("vec_id"), e, col("maxabs"),
        (col("maxabs") / lit(127.0)).as("scale"),
        when(col("maxabs") === 0.0, transform(e, _ => lit(0)))
          .otherwise(transform(e, x =>
            floor(x / col("maxabs") * 127.0 + 0.5).cast("int"))).as("q"))
  }

  /** Codes decoded back to doubles: (vec_id, embedding) with
    * embedding_i = q_i · scale — drop-in for any cosine operator, so
    * the whole ANN family runs unchanged over the compressed store. */
  def dequantized(emb: DataFrame, vecCol: String = "embedding",
                  idCol: String = "vec_id"): DataFrame =
    quantizeInt8(emb, vecCol, idCol)
      .select(col("vec_id"),
        transform(col("q"), x => x.cast("double") * col("scale")).as(vecCol))

  /** Driver-entry summary per vector: saturation count, code sum
    * (pins every code exactly), scale, and the cosine between the
    * original and its dequantized self (retention — the quality
    * metric that decides whether int8 is safe for a given corpus). */
  def quantizeSummary(emb: DataFrame, vecCol: String = "embedding",
                      idCol: String = "vec_id"): DataFrame =
    quantizeInt8(emb, vecCol, idCol)
      .select(col("vec_id"),
        size(filter(col("q"), x => abs(x) === 127)).cast("long").as("n_sat"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("sum_q"),
        round(col("scale"), 6).as("scale"),
        round(call_function("graft_cosine", col("e"),
          transform(col("q"), x => x.cast("double") * col("scale"))), 4).as("cos_ret"))
}
