package graft.functions.expr

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-row kernels behind the signature expressions. Both the
  * interpreted eval path and the generated code call these statics
  * (Scala objects compile with static forwarders, so codegen emits a
  * plain `SignatureKernels.minhashText(...)` Java call) — one
  * implementation, two execution modes, and the expressions stay
  * inside whole-stage codegen instead of forcing their operators to
  * fall back (CollapseCodegenStages rejects CodegenFallback).
  */
object SignatureKernels {

  def minhashText(s: UTF8String, shingleSize: Int, numHashes: Int): ArrayData =
    minhashFromGrams(
      TextTokenizer.gramHashes(TextTokenizer.tokenHashes(s), shingleSize), numHashes)

  def minhashArray(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val grams = new Array[Long](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        grams(m) = GraftHash.fnv64(arr.getUTF8String(i).getBytes)
        m += 1
      }
      i += 1
    }
    minhashFromGrams(if (m == n) grams else java.util.Arrays.copyOf(grams, m), numHashes)
  }

  private def minhashFromGrams(grams: Array[Long], numHashes: Int): ArrayData = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < grams.length) {
      val base = grams(i)
      var j = 0
      while (j < numHashes) {
        val v = GraftHash.splitmix64(base ^ GraftHash.permSeed(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Sorted DISTINCT k-gram shingle hashes straight from text — the
    * decontamination probe's per-row form (mirrors
    * array_distinct(wordShingles(text, k)) with hashes standing in
    * for the shingle strings; 64-bit FNV collisions are the only
    * semantic difference, negligible at any corpus size). */
  def shingleHashes(s: UTF8String, k: Int): ArrayData = {
    val grams = TextTokenizer.gramHashes(TextTokenizer.tokenHashes(s), k)
    java.util.Arrays.sort(grams)
    var m = 0
    var i = 0
    while (i < grams.length) {
      if (m == 0 || grams(m - 1) != grams(i)) { grams(m) = grams(i); m += 1 }
      i += 1
    }
    new GenericArrayData(
      if (m == grams.length) grams else java.util.Arrays.copyOf(grams, m))
  }

  /** Distinct word-shingle STRINGS in first-occurrence order — the
    * exact value of `array_distinct(wordShingles(text, k))` (split on
    * whitespace, k tokens joined by a single space; docs shorter than
    * k collapse to one whole-doc shingle, a token-less doc to [""]),
    * computed in one pass over the UTF-8 bytes instead of the
    * interpreted transform/slice/concat_ws HOF chain (~1 ms/doc → the
    * pair-verification stage's former bottleneck). Kept as strings,
    * not hashes, so the DuckDB oracle can reproduce values exactly. */
  def wordShingleStrings(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token byte ranges (same \s+ split as TextFunctions.tokens)
    var starts = new Array[Int](math.max(8, n / 6 + 1))
    var lens = new Array[Int](starts.length)
    var m = 0
    var i = 0
    while (i < n) {
      while (i < n && isWsByte(bytes(i))) i += 1
      if (i < n) {
        val s0 = i
        while (i < n && !isWsByte(bytes(i))) i += 1
        if (m == starts.length) {
          starts = java.util.Arrays.copyOf(starts, starts.length * 2)
          lens = java.util.Arrays.copyOf(lens, lens.length * 2)
        }
        starts(m) = s0
        lens(m) = i - s0
        m += 1
      }
    }
    def joined(from: Int, count: Int): UTF8String = {
      if (count <= 0) return UTF8String.EMPTY_UTF8
      var total = count - 1 // single-space separators
      var j = 0
      while (j < count) { total += lens(from + j); j += 1 }
      val out = new Array[Byte](total)
      var pos = 0
      j = 0
      while (j < count) {
        if (j > 0) { out(pos) = ' '; pos += 1 }
        System.arraycopy(bytes, starts(from + j), out, pos, lens(from + j))
        pos += lens(from + j)
        j += 1
      }
      UTF8String.fromBytes(out)
    }
    if (m < k) return new GenericArrayData(Array[Any](joined(0, m)))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    while (i <= m - k) { seen.add(joined(i, k)); i += 1 }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  @inline private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** One-pass n-gram repetition stats: (total grams, top gram count,
    * distinct grams) from the sorted gram-hash array — run lengths of
    * a sorted array are gram multiplicities. */
  def repetitionStats(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val grams = TextTokenizer.gramHashes(TextTokenizer.tokenHashes(s), k)
    java.util.Arrays.sort(grams)
    var top = 0L
    var dist = 0L
    var run = 0L
    var i = 0
    while (i < grams.length) {
      if (i == 0 || grams(i) != grams(i - 1)) { dist += 1; run = 1L } else run += 1
      if (run > top) top = run
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](grams.length.toLong, top, dist))
  }

  /** Token unigram entropy stats: (total tokens, distinct tokens,
    * Shannon entropy in nats = ln n − Σ c·ln c / n). Same fused byte
    * tokenization as every kernel; multiplicities are run lengths of
    * the sorted token-hash array, so the pass needs no hash map. */
  def entropyStats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = TextTokenizer.tokenHashes(s)
    java.util.Arrays.sort(toks)
    var dist = 0L
    var sumClnC = 0.0
    var run = 0L
    var i = 0
    while (i < toks.length) {
      if (i == 0 || toks(i) != toks(i - 1)) {
        if (run > 0) { dist += 1; sumClnC += run * math.log(run.toDouble) }
        run = 1L
      } else run += 1
      i += 1
    }
    if (run > 0) { dist += 1; sumClnC += run * math.log(run.toDouble) }
    val n = toks.length
    val ent = if (n == 0) 0.0 else math.log(n.toDouble) - sumClnC / n
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, dist, ent))
  }

  def simhashText(s: UTF8String): Long =
    simhashFromHashes(TextTokenizer.tokenHashes(s))

  def simhashArray(arr: ArrayData): Long = {
    val n = arr.numElements()
    val hs = new scala.collection.mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) hs += GraftHash.fnv64(arr.getUTF8String(i).getBytes)
      i += 1
    }
    simhashFromHashes(hs.toArray)
  }

  private def simhashFromHashes(tok: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < tok.length) {
      val h = tok(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
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

  def fingerprintText(s: UTF8String, k: Int, w: Int): ArrayData =
    fingerprintFromHashes(TextTokenizer.tokenHashes(s), k, w)

  def fingerprintArray(arr: ArrayData, k: Int, w: Int): ArrayData = {
    // null elements are skipped, matching minhashArray/simhashArray —
    // one null policy across the signature family (the text variants
    // can never produce the null case)
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        hs(m) = GraftHash.fnv64(arr.getUTF8String(i).getBytes)
        m += 1
      }
      i += 1
    }
    fingerprintFromHashes(if (m == n) hs else java.util.Arrays.copyOf(hs, m), k, w)
  }

  private def fingerprintFromHashes(tok: Array[Long], k: Int, w: Int): ArrayData = {
    val nGrams = tok.length - k + 1
    if (nGrams <= 0) {
      var acc = GraftHash.FnvOffset
      var j = 0
      while (j < tok.length) { acc = GraftHash.combine(acc, tok(j)); j += 1 }
      return new GenericArrayData(Array(GraftHash.splitmix64(acc)))
    }
    val grams = TextTokenizer.gramHashes(tok, k)
    val picks = scala.collection.mutable.SortedSet.empty[Long]
    val nWindows = math.max(1, grams.length - w + 1)
    var i = 0
    while (i < nWindows) {
      var m = Long.MaxValue
      var j = 0
      val lim = math.min(w, grams.length - i)
      while (j < lim) {
        if (grams(i + j) < m) m = grams(i + j)
        j += 1
      }
      picks += m
      i += 1
    }
    new GenericArrayData(picks.toArray)
  }

  /** Sign of the ±1 hyperplane component (i, d) — MUST stay identical
    * to Similarity.hyperplanes so expression and driver-side paths
    * agree. */
  @inline private def planeSign(i: Int, d: Int): Double =
    if ((GraftHash.splitmix64(
      GraftHash.permSeed(i) ^ (d * 0x9e3779b97f4a7c15L)) & 1L) == 1L) 1.0
    else -1.0

  /** All SRP sign bits in one call: bit i set iff ⟨v, plane_i⟩ > 0. */
  def srpSignBits(v: ArrayData, numPlanes: Int, isFloat: Boolean): Long = {
    val n = v.numElements()
    var bits = 0L
    var i = 0
    while (i < numPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        if (!v.isNullAt(d)) {
          val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
          dot += x * planeSign(i, d)
        }
        d += 1
      }
      if (dot > 0) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Fused cosine; returns NaN to signal null-result (length mismatch
    * or null element) so generated code can map NaN -> isNull without
    * an exception path. Zero-norm inputs yield 0.0. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
