package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text→signature expressions: tokenize + shingle + hash in ONE
  * imperative pass over the raw UTF-8 bytes.
  *
  * The composable path (split → filter → transform(slice, concat_ws)
  * → array_distinct → signature) materializes every token and every
  * shingle as a UTF8String array per row; higher-order functions are
  * never whole-stage-codegen'd, so all of it runs interpreted with
  * per-element allocation. These fused variants hash token byte
  * regions in place — no token array, no shingle strings, no
  * intermediate ArrayData — which measured ~4× faster end-to-end on
  * the dedup pipelines and is the difference between CPU-bound and
  * allocation-bound at 100 TB (signatures run on every row scanned).
  * eval and doGenCode share the SignatureKernels statics, so the
  * expressions participate in whole-stage codegen.
  *
  * Hash compatibility: token hashes are GraftHash.fnv64 over token
  * bytes — identical to the array-input variants fed
  * split(text,'\\s+') — so SimHashText(text) == SimHash64(tokens) and
  * WinnowFingerprintText(text) == WinnowFingerprint(tokens). Shingle
  * hashes for MinHash use the order-sensitive combine of token hashes
  * (not a hash of the joined string), which is internal to signature
  * space and never compared across variants.
  */
object TextTokenizer {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** FNV-1a hash of each whitespace-delimited token, in order.
    * Primitive long array with manual growth — an ArrayBuffer[Long]
    * would box every hash on this per-row path. */
  def tokenHashes(s: UTF8String): Array[Long] = {
    val bytes = s.getBytes
    var out = new Array[Long](math.max(8, bytes.length / 6 + 1))
    var m = 0
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        var h = GraftHash.FnvOffset
        while (i < n && !isWs(bytes(i))) {
          h ^= (bytes(i) & 0xffL)
          h *= GraftHash.FnvPrime
          i += 1
        }
        if (m == out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
        out(m) = h
        m += 1
      }
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }

  /** Order-sensitive k-gram hashes of the token stream; shorter docs
    * collapse to one whole-doc gram (mirrors wordShingles fallback). */
  def gramHashes(tok: Array[Long], k: Int): Array[Long] = {
    val nGrams = tok.length - k + 1
    if (nGrams <= 0) {
      var acc = GraftHash.FnvOffset
      var j = 0
      while (j < tok.length) { acc = GraftHash.combine(acc, tok(j)); j += 1 }
      return Array(acc)
    }
    val out = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var acc = GraftHash.FnvOffset
      var j = 0
      while (j < k) { acc = GraftHash.combine(acc, tok(i + j)); j += 1 }
      out(i) = acc
      i += 1
    }
    out
  }
}

/** MinHash signature straight from text: `string -> array<long>`. */
case class MinHashText(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 1024, "numHashes in (0,1024]")
  require(shingleSize > 0, "shingleSize must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.string(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_text"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.minhashText(input.asInstanceOf[UTF8String], shingleSize, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SignatureKernels.minhashText($c, $shingleSize, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct shingle hashes straight from text:
  * `string -> array<long>` — the join key material for
  * decontamination-style n-gram overlap probes. */
case class ShingleHashesText(child: Expression, shingleSize: Int)
    extends UnaryExpression {
  require(shingleSize > 0, "shingleSize must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.string(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.shingleHashes(input.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SignatureKernels.shingleHashes($c, $shingleSize);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word-shingle strings straight from text:
  * `string -> array<string>` — the exact value of
  * array_distinct(wordShingles(text, k)) as one fused pass, for
  * Jaccard verification where the shingle STRINGS (not hashes) must
  * survive so the oracle can recompute them. */
case class WordShinglesText(child: Expression, shingleSize: Int)
    extends UnaryExpression {
  require(shingleSize > 0, "shingleSize must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.string(child, prettyName)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.wordShingleStrings(input.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SignatureKernels.wordShingleStrings($c, $shingleSize);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass n-gram repetition stats straight from text:
  * `string -> struct<total, top, dist>` (gram occurrences, the mode
  * gram's count, distinct grams) — the Gopher-style repetition rule's
  * per-row form. */
case class RepetitionStatsText(child: Expression, shingleSize: Int)
    extends UnaryExpression {
  require(shingleSize > 0, "shingleSize must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.string(child, prettyName)
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("dist", LongType, nullable = false)))
  override def prettyName: String = "graft_repetition"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.repetitionStats(input.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SignatureKernels.repetitionStats($c, $shingleSize);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass token unigram entropy straight from text:
  * `string -> struct<total, dist, ent>` (token count, type count,
  * Shannon entropy in nats) — the vocabulary-diversity quality signal
  * (low entropy = template/spam text; with total it also yields the
  * type-token ratio). */
case class EntropyStatsText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.string(child, prettyName)
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("dist", LongType, nullable = false),
    StructField("ent", DoubleType, nullable = false)))
  override def prettyName: String = "graft_entropy"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.entropyStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SignatureKernels.entropyStats($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash straight from text: `string -> long`; equals
  * SimHash64(split tokens) bit for bit. */
case class SimHashText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.string(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_text"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.simhashText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SignatureKernels.simhashText($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprint straight from text: `string -> array<long>`;
  * equals WinnowFingerprint(split tokens) element for element. */
case class WinnowFingerprintText(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.string(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_fingerprint_text"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.fingerprintText(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SignatureKernels.fingerprintText($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
