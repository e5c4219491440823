package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.expr.{SignatureKernels, TextTokenizer}

/** Property-style tests for the signature kernels — pure JVM, no Spark
  * jobs, seeded generators, hundreds of cases per property. */
class SignatureKernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(1234)

  private def token(): String = {
    val n = 1 + rnd.nextInt(8)
    Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
  }
  private def doc(min: Int = 0, max: Int = 60): List[String] =
    List.fill(min + rnd.nextInt(max - min + 1))(token())

  private def minhashOf(tokens: Seq[String], k: Int, m: Int): Seq[Long] =
    SignatureKernels.minhashText(UTF8String.fromString(tokens.mkString(" ")), k, m)
      .toLongArray().toSeq

  test("tokenizer matches Java \\s+ split semantics across messy whitespace") {
    (1 to 300).foreach { _ =>
      val parts = List.fill(rnd.nextInt(20))(
        if (rnd.nextBoolean()) token()
        else Seq(" ", "\t", "\n", "  ", "\r")(rnd.nextInt(5)))
      val s = parts.mkString(if (rnd.nextBoolean()) " " else "")
      val viaKernel = TextTokenizer.tokenHashes(UTF8String.fromString(s)).length
      val viaRegex = s.split("\\s+").count(_.nonEmpty)
      assert(viaKernel == viaRegex, s"for input ${s.map(_.toInt)}")
    }
  }

  test("word-shingle kernel matches the array_distinct(wordShingles) reference") {
    def reference(s: String, k: Int): Seq[String] = {
      val t = s.split("\\s+").filter(_.nonEmpty).toSeq
      val raw = if (t.length >= k) t.sliding(k).map(_.mkString(" ")).toSeq
                else Seq(t.mkString(" "))
      raw.distinct
    }
    val ks = Seq(1, 2, 3, 5)
    (1 to 300).foreach { _ =>
      // messy whitespace, short docs, repeated tokens (exercise distinct)
      val parts = List.fill(rnd.nextInt(25))(
        if (rnd.nextInt(4) == 0) Seq(" ", "\t", "\n", "  ")(rnd.nextInt(4))
        else Seq("a", "b", "ab", token())(rnd.nextInt(4)))
      val s = parts.mkString(if (rnd.nextBoolean()) " " else "")
      val k = ks(rnd.nextInt(ks.length))
      val got = SignatureKernels.wordShingleStrings(UTF8String.fromString(s), k)
      val gotSeq = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
      assert(gotSeq == reference(s, k), s"k=$k input=${s.map(_.toInt)}")
    }
    // degenerate cases: empty text / all-whitespace collapse to [""]
    Seq("", "   ", "\t\n").foreach { s =>
      val got = SignatureKernels.wordShingleStrings(UTF8String.fromString(s), 3)
      assert(got.numElements() == 1 && got.getUTF8String(0).toString == "")
    }
    // multi-byte UTF-8 survives byte-level slicing
    val uni = SignatureKernels.wordShingleStrings(UTF8String.fromString("héllo wörld héllo wörld ünïcode"), 2)
    val uniSeq = (0 until uni.numElements()).map(i => uni.getUTF8String(i).toString)
    assert(uniSeq == Seq("héllo wörld", "wörld héllo", "wörld ünïcode"))
  }

  test("minhash is deterministic with the declared width") {
    (1 to 100).foreach { _ =>
      val d = doc()
      val a = minhashOf(d, 3, 64)
      assert(a == minhashOf(d, 3, 64))
      assert(a.size == 64)
    }
  }

  test("one-token mutation moves few simhash bits") {
    (1 to 100).foreach { _ =>
      val d = doc(min = 20)
      val s = d.mkString(" ")
      val sim1 = SignatureKernels.simhashText(UTF8String.fromString(s))
      val mutated = (d.head + "X") :: d.tail
      val simM = SignatureKernels.simhashText(UTF8String.fromString(mutated.mkString(" ")))
      assert(java.lang.Long.bitCount(sim1 ^ simM) <= 24,
        s"one-token change moved too many bits for: $s")
    }
  }

  test("winnowing guarantee: a shared run of k+w-1 tokens shares a fingerprint") {
    val k = 5; val w = 4
    def fp(tokens: Seq[String]): Set[Long] =
      SignatureKernels.fingerprintText(
        UTF8String.fromString(tokens.mkString(" ")), k, w).toLongArray().toSet
    (1 to 200).foreach { _ =>
      val shared = List.fill(k + w - 1)(token())
      val d1 = doc(min = 8) ++ shared
      val d2 = shared ++ doc(min = 8)
      assert((fp(d1) & fp(d2)).nonEmpty,
        s"docs sharing a ${k + w - 1}-token run must share a fingerprint")
    }
  }

  test("cosine kernel matches a straightforward implementation") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    (1 to 200).foreach { _ =>
      val n = 2 + rnd.nextInt(31)
      val a = Array.fill(n)(rnd.nextDouble() * 10 - 5)
      val b = Array.fill(n)(rnd.nextDouble() * 10 - 5)
      val got = SignatureKernels.cosine(
        new GenericArrayData(a), new GenericArrayData(b), false, false)
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      val want = if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
      assert(math.abs(got - want) < 1e-9)
    }
  }

  test("minhash agreement approximates Jaccard over token sets") {
    (1 to 50).foreach { i =>
      val shared = 10 + rnd.nextInt(31)
      val only1 = rnd.nextInt(31)
      val only2 = rnd.nextInt(31)
      // distinct 1-gram shingles so Jaccard is exactly the set overlap
      val s = (0 until shared).map(j => s"s$j")
      val a = s ++ (0 until only1).map(j => s"a$j")
      val b = s ++ (0 until only2).map(j => s"b$j")
      val agree = minhashOf(a, 1, 256).zip(minhashOf(b, 1, 256))
        .count { case (x, y) => x == y } / 256.0
      val jac = shared.toDouble / (shared + only1 + only2)
      assert(math.abs(agree - jac) < 0.2,
        s"case $i: minhash agreement $agree vs jaccard $jac")
    }
  }
}
