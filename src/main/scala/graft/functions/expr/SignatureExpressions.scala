package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

/** MinHash signature of a token/shingle set (L2 building block).
  *
  * Per-row Catalyst expression: `array<string> -> array<long>` of
  * `numHashes` minima. This is THE scale decision for MinHash dedup:
  * signatures are computed inside the scan stage — no explode of
  * shingles, no shuffle — so the only shuffle in the whole LSH
  * pipeline is the band-bucket exchange whose key count is
  * rows × bands, not rows × shingles.
  *
  * Both eval and doGenCode delegate to SignatureKernels, so the
  * expression participates in whole-stage codegen (the generated code
  * is one static call — CodegenFallback would knock the whole operator
  * out of codegen).
  *
  * Reference behavior anchor: the reference engine computes per-doc
  * derived columns inside its scan pipeline too (lazy column exprs,
  * reference src/main.rs:297-340); this is the same idea for
  * signatures.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0 && numHashes <= 1024, "numHashes in (0,1024]")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.stringArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.minhashArray(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SignatureKernels.minhashArray($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (L3 building block).
  *
  * `array<string> -> long`: per-bit vote sum over token hashes, sign
  * bit per position. Same scale property as MinHashSignature — per-row
  * in the scan stage, zero shuffle, whole-stage-codegen-participating.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.stringArray(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.simhashArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SignatureKernels.simhashArray($c);")

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
    extends UnaryExpression {
  require(k > 0 && w > 0, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.stringArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.fingerprintArray(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expr.SignatureKernels.fingerprintArray($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity of two numeric vectors (L5/L6/L7 building block).
  *
  * `(array<float|double>, array<float|double>) -> double`, one fused
  * pass over both arrays (dot product and both norms together) — the
  * zip_with + aggregate composition of built-ins walks the arrays
  * three times and allocates an intermediate array; this allocates
  * nothing and stays inside whole-stage codegen. Null or
  * length-mismatched inputs yield null (kernel signals with NaN).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

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

  private def aFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def bFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val v = SignatureKernels.cosine(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], aFloat, bFloat)
    if (java.lang.Double.isNaN(v)) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.expr.SignatureKernels.cosine($a, $b, $aFloat, $bFloat);
         |if (java.lang.Double.isNaN(${ev.value})) { ${ev.isNull} = true; ${ev.value} = 0.0; }
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
