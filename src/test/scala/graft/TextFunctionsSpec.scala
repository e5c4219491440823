package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.as("v")).collect()(0).get(0)
  }

  test("L10: whitespace and BPE-ish token counts") {
    assert(one("hello world  foo", tokenCount(col("text"))) == 3)
    assert(one("", tokenCount(col("text"))) == 0)
    // don ' t stop 4 2 -> 6
    assert(one("don't stop 42", bpeTokenCount(col("text"))) == 6)
  }

  test("L8: language id picks the right stopword profile") {
    val cases = Seq(
      "the cat is on a mat and it is happy for sure" -> "en",
      "der hund ist nicht mit der katze und das war ein tag" -> "de",
      "le chat est dans la maison et il est pour moi" -> "fr",
      "el perro es grande y los gatos son para el patio" -> "es",
      "我 是 在 这 中 大 的 人 了 有" -> "zh",
      "xyzzy qwerty plugh" -> "und")
    cases.foreach { case (text, expected) =>
      assert(one(text, langId(col("text"))) == expected, s"for: $text")
    }
  }

  test("L8 fused: langIdText agrees with the combinator on real and crafted text") {
    val docs = Tables.documents(spark, sf)
      .select(langId(col("text")).as("a"), langIdText(col("text")).as("b"))
    assert(docs.where(col("a") =!= col("b")).count() == 0,
      "fused and combinator language id must agree on documents")
    val crafted = Seq(
      "the cat is on a mat and it is happy for sure",
      "der hund ist nicht mit der katze und das war ein tag",
      "le chat est dans la maison et il est pour moi",
      "el perro es grande y los gatos son para el patio",
      "我 是 在 这 中 大 的 人 了 有",
      "xyzzy qwerty plugh", "")
    crafted.foreach { t =>
      assert(one(t, langIdText(col("text"))) == one(t, langId(col("text"))), s"for: $t")
    }
  }

  test("L9: quality score is bounded and orders texts sensibly") {
    def q(t: String): Double = one(t, qualityScore(col("text"))).asInstanceOf[Double]
    val natural = q("the quick brown fox jumps over the lazy dog and runs to the old barn in the field")
    val repetitive = q("spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam")
    val punctSoup = q("!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@ !!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@")
    Seq(natural, repetitive, punctSoup).foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(natural > repetitive, s"natural $natural should beat repetitive $repetitive")
    assert(natural > punctSoup, s"natural $natural should beat punct soup $punctSoup")
  }

  test("L9 components: punct, stopword, repetition ratios") {
    assert(one("a b", punctRatio(col("text"))) == 0.0)
    val pr = one("a!b", punctRatio(col("text"))).asInstanceOf[Double]
    assert(math.abs(pr - 1.0 / 3.0) < 1e-9)
    val sr = one("the dog the cat", stopwordRatio(col("text"), Stopwords.en)).asInstanceOf[Double]
    assert(math.abs(sr - 0.5) < 1e-9)
    val rr = one("x x y z", repetitionRatio(col("text"))).asInstanceOf[Double]
    assert(math.abs(rr - 0.25) < 1e-9)
  }

  test("L11: winnowing fingerprints overlap iff texts share long runs") {
    import spark.implicits._
    val shared = "one two three four five six seven eight nine ten"
    val df = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"epsilon zeta $shared eta theta"),
      (3L, "completely different words with nothing in common here at all okay"))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "docs sharing a 10-token run must share a fingerprint (k=5,w=4 guarantee span 8)")
    assert((fps(1L) & fps(3L)).isEmpty, "unrelated docs should share no fingerprints")
    fps.values.foreach(s => assert(s.nonEmpty))
  }

  test("L2 building block: minhash signature agreement estimates Jaccard") {
    import spark.implicits._
    // two 40-shingle sets sharing 20 -> jaccard 20/60 = 1/3
    val a = (0 until 40).map(i => s"sh$i")
    val b = (20 until 80).map(i => s"sh$i")
    val df = Seq((1L, a), (2L, b)).toDF("id", "sh")
    val sigs = df.select(minhash(col("sh"), 256).as("sig")).collect()
      .map(_.getSeq[Long](0))
    val agree = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 256.0
    assert(math.abs(agree - 1.0 / 3.0) < 0.12,
      s"minhash agreement $agree should approximate jaccard 0.333")
  }

  test("L3 building block: simhash hamming tracks similarity") {
    import spark.implicits._
    val base = (0 until 50).map(i => s"tok$i")
    val near = base.updated(10, "CHANGED")
    val far = (100 until 150).map(i => s"tok$i")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "toks")
    val sims = df.select(simhash(col("toks"))).collect().map(_.getLong(0))
    val hNear = java.lang.Long.bitCount(sims(0) ^ sims(1))
    val hFar = java.lang.Long.bitCount(sims(0) ^ sims(2))
    assert(hNear <= 10, s"one-token change should move few bits, got $hNear")
    assert(hFar >= 16, s"disjoint token sets should differ in many bits, got $hFar")
    assert(sims(0) == sims(0), "deterministic")
  }

  test("graft_entropy: entropy and type-token ratio match brute force") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "a a b b"), (4L, "x"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextStats.tokenEntropy(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    def h(counts: Seq[Int]): Double = {
      val n = counts.sum.toDouble
      BigDecimal(math.log(n) - counts.map(c => c * math.log(c)).sum / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(1L) == ((4L, 1L, 0.0, 0.25)), "uniform repeat has zero entropy")
    assert(got(2L) == ((4L, 4L, h(Seq(1, 1, 1, 1)), 1.0)), "all-distinct = ln n")
    assert(got(3L) == ((4L, 2L, h(Seq(2, 2)), 0.5)))
    assert(got(4L) == ((1L, 1L, 0.0, 1.0)))
    // corpus sanity: every doc has positive entropy and ttr in (0, 1]
    val corpus = graft.operators.TextStats.tokenEntropy(
      Tables.documents(spark, sf)).collect()
    assert(corpus.forall(r => r.getDouble(3) > 0 && r.getDouble(4) > 0 && r.getDouble(4) <= 1))
  }

  test("signature expressions stay inside whole-stage codegen") {
    // parquet-backed scan so the projection is a real executed stage
    // (a local Seq would constant-fold to LocalTableScan)
    val df = Tables.documents(spark, sf)
      .select(minhashText(col("text"), 3, 32).as("sig"),
              simhashText(col("text")).as("sim"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_minhash_text.*"),
      s"custom expressions must not knock the projection out of codegen:\n$plan")
    // and the generated code path produces real values
    val row = df.collect()(0)
    assert(row.getSeq[Long](0).length == 32)
  }

  test("functions are SQL-callable via the session extension") {
    val r = spark.sql(
      "SELECT graft_simhash(array('a','b')) AS s, graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect()(0)
    assert(r.getDouble(1) == 1.0)
  }

  test("X193 gopher rules: each rule flips the verdict on a crafted violator") {
    import spark.implicits._
    val goodWords = (1 to 60).map(i => s"word$i").mkString(" ") +
      " the of and that have with" // 66 words, mean len ~5, 6 stopwords
    val docs = Seq(
      (1L, goodWords), // passes every rule
      (2L, "the of and that"), // too few words
      (3L, (1 to 60).map(_ => "a").mkString(" ") + " the of"), // mean word len < 3
      (4L, (1 to 60).map(i => s"99$i").mkString(" ") + " the of"), // alpha frac < 0.8
      (5L, (1 to 60).map(i => s"word$i").mkString(" ")), // no stopwords
      (6L, (1 to 60).map(i => s"word$i #").mkString(" ") + " the of"), // symbol ratio > 0.1
      (7L, (1 to 60).map(i => s"- bullet$i line\n").mkString + "the of have that and"),
      (8L, (1 to 30).map(i => s"word$i trailing...\n").mkString + "the of have with and"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextStats.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(got(1L) == 1L, "the compliant doc must pass")
    (2L to 6L).foreach(id => assert(got(id) == 0L, s"doc $id must fail its rule"))
    // the line rules: doc 7 is >90% bullet lines, doc 8 >30% ellipsis ends
    assert(got(7L) == 0L && got(8L) == 0L)
  }

  test("X193 gopher rules: metrics match a token-level recompute on real docs") {
    val docs = Tables.documents(spark, sf)
    val got = graft.operators.TextStats.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(6)))).toMap
    val raw = docs.selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.size == raw.length)
    val stop = Set("the", "be", "to", "of", "and", "that", "have", "with")
    raw.foreach { case (id, text) =>
      val t = text.split("\\s+").filter(_.nonEmpty)
      val (nw, ml, fa, ns, pass) = got(id)
      assert(nw == t.length)
      assert(math.abs(ml - t.map(_.length).sum.toDouble / t.length) < 1e-3)
      assert(math.abs(fa - t.count(_.exists(_.isLetter)).toDouble / t.length) < 1e-3)
      assert(ns == t.count(x => stop(x.toLowerCase)))
      val expectPass = t.length >= 50 && t.length <= 100000 &&
        (t.map(_.length).sum.toDouble / t.length) >= 3.0 &&
        (t.map(_.length).sum.toDouble / t.length) <= 10.0 &&
        t.count(_.exists(_.isLetter)).toDouble / t.length >= 0.8 &&
        t.count(x => stop(x.toLowerCase)) >= 2
      assert(pass == (if (expectPass) 1L else 0L), s"doc $id verdict")
    }
  }

  test("X194 coverage: ladder equals the sorted type-frequency cumulative shares") {
    val docs = Tables.documents(spark, sf)
    val got = graft.operators.TextStats.tokenCoverage(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val toks = docs.selectExpr("lower(text) AS t").collect()
      .flatMap(_.getString(0).split("\\s+").filter(_.nonEmpty))
    val types = toks.groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
      .toSeq.sortBy { case (t, n) => (-n, t) }
    val total = toks.length.toLong
    assert(got.keySet == Set(1L, 10L, 100L, 1000L))
    got.foreach { case (k, (cum, nTypes, cov)) =>
      val expect = types.take(k.toInt).map(_._2).sum
      assert(cum == math.min(expect, total), s"k=$k cum")
      assert(nTypes == types.size)
      assert(math.abs(cov - expect.toDouble / total) < 1e-6, s"k=$k coverage")
    }
  }
}
