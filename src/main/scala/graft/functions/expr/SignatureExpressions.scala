package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic 64-bit hashing used by every signature expression.
  *
  * FNV-1a over UTF-8 bytes for the base token hash, splitmix64 as the
  * per-seed finalizer — both public-domain constructions. One base
  * hash per token, then m cheap integer mixes, so an m-permutation
  * MinHash costs O(tokens · m) integer ops with zero allocation per
  * permutation.
  */
object GraftHash {
  val FnvOffset = 0xcbf29ce484222325L
  val FnvPrime = 0x100000001b3L

  def fnv64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Seed for the i-th MinHash permutation. */
  def permSeed(i: Int): Long = splitmix64(0x5851f42d4c957f2dL * (i + 1))

  /** Order-sensitive combine for k-gram hashes. */
  def combine(acc: Long, h: Long): Long = splitmix64(acc ^ h)
}

/** MinHash signature of a token/shingle set (L2 building block).
  *
  * Per-row Catalyst expression: `array<string> -> array<long>` of
  * `numHashes` minima. This is THE scale decision for MinHash dedup:
  * signatures are computed inside the scan stage — no explode of
  * shingles, no shuffle — so the only shuffle in the whole LSH
  * pipeline is the band-bucket exchange whose key count is
  * rows × bands, not rows × shingles.
  *
  * Reference behavior anchor: the reference engine computes per-doc
  * derived columns inside its scan pipeline too (lazy column exprs,
  * reference src/main.rs:297-340); this is the same idea for
  * signatures.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes > 0 && numHashes <= 1024, "numHashes in (0,1024]")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.stringArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = GraftHash.fnv64(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < numHashes) {
          val v = GraftHash.splitmix64(base ^ GraftHash.permSeed(j))
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (L3 building block).
  *
  * `array<string> -> long`: per-bit vote sum over token hashes, sign
  * bit per position. Same scale property as MinHashSignature — per-row
  * in the scan stage, zero shuffle.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.stringArray(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = GraftHash.fnv64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing document fingerprint (L11).
  *
  * `array<string> -> array<long>`: hash every k-token gram, slide a
  * w-gram window, keep each window's minimum (classic winnowing —
  * Schleimer/Wilkerson/Aiken, SIGMOD'03 public algorithm), emit the
  * distinct sorted minima. Guarantees any shared run of
  * k + w - 1 tokens between two documents shares a fingerprint.
  * Shorter docs fall back to one combined hash so every doc has at
  * least one fingerprint.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.stringArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val tokenHashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      tokenHashes(i) =
        if (arr.isNullAt(i)) GraftHash.FnvOffset
        else GraftHash.fnv64(arr.getUTF8String(i).getBytes)
      i += 1
    }
    val nGrams = n - k + 1
    if (nGrams <= 0) {
      var acc = GraftHash.FnvOffset
      var j = 0
      while (j < n) { acc = GraftHash.combine(acc, tokenHashes(j)); j += 1 }
      return new GenericArrayData(Array(GraftHash.splitmix64(acc)))
    }
    val gramHashes = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      var acc = GraftHash.FnvOffset
      var j = 0
      while (j < k) { acc = GraftHash.combine(acc, tokenHashes(i + j)); j += 1 }
      gramHashes(i) = acc
      i += 1
    }
    val picks = scala.collection.mutable.SortedSet.empty[Long]
    val nWindows = math.max(1, nGrams - w + 1)
    i = 0
    while (i < nWindows) {
      var m = Long.MaxValue
      var j = 0
      val lim = math.min(w, nGrams - i)
      while (j < lim) {
        if (gramHashes(i + j) < m) m = gramHashes(i + j)
        j += 1
      }
      picks += m
      i += 1
    }
    new GenericArrayData(picks.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity of two numeric vectors (L5/L6/L7 building block).
  *
  * `(array<float|double>, array<float|double>) -> double`, one fused
  * pass over both arrays (dot product and both norms together) — the
  * zip_with + aggregate composition of built-ins walks the arrays
  * three times and allocates an intermediate array; this allocates
  * nothing. Null or length-mismatched inputs yield null.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float|double> args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val aFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val bFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, i, aFloat)
      val y = get(b, i, bFloat)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared input-type checks (AbstractDataType/ExpectsInputTypes are
  * private[sql], so the checks are spelled out). */
object GraftTypeChecks {
  def stringArray(child: Expression, fn: String): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects array<string>, got ${other.simpleString}")
  }

  def string(child: Expression, fn: String): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fn expects string, got ${other.simpleString}")
  }
}
