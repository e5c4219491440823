package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Search

class SearchSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs = Tables.documents(spark, sf)

  private lazy val texts: Map[Long, Array[String]] =
    docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty))
      .toMap

  test("boolean search: posting-list path == scan path == brute force") {
    val must = Seq("spark", "vector")
    val mustNot = Seq("slow")
    val viaPostings = Search.booleanSearch(docs, must, mustNot)
      .collect().map(_.getLong(0)).toSet
    val viaScan = Search.booleanSearchScan(docs, must, mustNot)
      .collect().map(_.getLong(0)).toSet
    val brute = texts.collect { case (id, t)
      if must.forall(t.contains) && !mustNot.exists(t.contains) => id }.toSet
    assert(brute.nonEmpty, "query should match some docs in testdata")
    assert(viaPostings == brute)
    assert(viaScan == brute)
  }

  test("OR search: minimum-should-match counting matches brute force") {
    val should = Seq("spark", "vector", "slow")
    val got = Search.orSearch(docs, should, minMatch = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = texts.flatMap { case (id, t) =>
      val n = should.count(t.contains).toLong
      if (n >= 2) Some(id -> n) else None
    }
    assert(brute.nonEmpty, "2-of-3 should match some docs in testdata")
    assert(got == brute)
    // 1-of-N degrades to the union of single-term matches
    val any = Search.orSearch(docs, should, minMatch = 1)
      .collect().map(_.getLong(0)).toSet
    assert(any == texts.collect {
      case (id, t) if should.exists(t.contains) => id }.toSet)
  }

  test("posting-list exec node: plans PostingListIntersectExec and matches the scan path") {
    val must = Seq("spark", "vector")
    val mustNot = Seq("slow")
    val index = Search.positionalIndexChunked(docs)
    val viaNode = graft.plans.PostingListIntersect.search(index, must, mustNot)
    val plan = viaNode.queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix in plan strings
    assert(plan.contains("PostingListIntersect "),
      s"custom strategy must plan the exec node:\n$plan")
    // the term IN (...) prune must sit BELOW the node, pushed toward the scan
    assert(plan.contains("term") && plan.contains("Filter"),
      s"term pruning filter expected under the node:\n$plan")
    val got = viaNode.collect().map(_.getLong(0)).toSet
    val viaScan = Search.booleanSearchScan(docs, must, mustNot)
      .collect().map(_.getLong(0)).toSet
    assert(got == viaScan)
    assert(got.nonEmpty, "query should match some docs in testdata")
  }

  test("posting-list exec node: NOT semantics and multi-chunk grouping") {
    import spark.implicits._
    // ids straddle two doc-id chunks (chunkSize=3) and repeat terms at
    // several positions within one doc
    val df = Seq(
      (0L, "alpha beta alpha"), (1L, "alpha"), (2L, "beta alpha gamma"),
      (3L, "alpha beta"), (4L, "beta"), (5L, "gamma alpha beta"))
      .toDF("doc_id", "text")
    val index = Search.positionalIndexChunked(df, chunkSize = 3)
    val got = graft.plans.PostingListIntersect.search(index, Seq("alpha", "beta"), Seq("gamma"))
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(0L, 3L))
  }

  test("posting-list exec node: min-should-match OR matches the DataFrame path") {
    val should = Seq("spark", "vector", "slow")
    val index = Search.positionalIndexChunked(docs)
    val viaNode = graft.plans.PostingListIntersect.orSearch(index, should, minMatch = 2)
    val plan = viaNode.queryExecution.executedPlan.toString
    assert(plan.contains("PostingListIntersect "),
      s"custom strategy must plan the exec node:\n$plan")
    val got = viaNode.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDf = Search.orSearch(docs, should, minMatch = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == viaDf)
    assert(got.nonEmpty && got.values.exists(_ == 3L) && got.values.exists(_ == 2L),
      "want both 2-of-3 and 3-of-3 matches in testdata")
  }

  test("posting-list exec node: phrase adjacency matches the DataFrame path") {
    val phrase = Seq("fast", "table")
    val index = Search.positionalIndexChunked(docs)
    val got = graft.plans.PostingListIntersect.phrase(index, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDf = Search.phraseSearch(docs, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == viaDf)
    assert(got.nonEmpty, "phrase should occur in testdata")
  }

  test("posting-list exec node: sloppy phrase chain counts match the DataFrame path") {
    val phrase = Seq("fast", "table", "scan")
    val index = Search.positionalIndexChunked(docs)
    val got = graft.plans.PostingListIntersect.phraseSlop(index, phrase, slop = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDf = Search.phraseSearchSlop(docs, phrase, slop = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == viaDf)
    assert(got.nonEmpty, "sloppy phrase should occur in testdata")
  }

  test("posting-list exec node: phrase edge cases — repeated word, multi-chunk, multi-occurrence") {
    import spark.implicits._
    // "a b a": word 0 and 2 share a term; docs straddle chunks of 3;
    // doc 0 holds TWO overlapping occurrences (a b a b a)
    val df = Seq(
      (0L, "a b a b a"), (1L, "a b a"), (2L, "a b"), (3L, "b a b"),
      (4L, "x a b a y"), (5L, "a a b a"))
      .toDF("doc_id", "text")
    val index = Search.positionalIndexChunked(df, chunkSize = 3)
    val got = graft.plans.PostingListIntersect.phrase(index, Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDf = Search.phraseSearch(df, Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == viaDf)
    assert(got == Set((0L, 2L, 0L), (1L, 1L, 0L), (4L, 1L, 1L), (5L, 1L, 1L)))
    // sloppy chains across a repeated word, node vs DataFrame path
    val gotSlop = graft.plans.PostingListIntersect.phraseSlop(index, Seq("a", "a"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaDfSlop = Search.phraseSearchSlop(df, Seq("a", "a"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotSlop == viaDfSlop)
  }

  test("boolean search: AND across terms, not OR") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, "alpha"), (3L, "beta"), (4L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val hits = Search.booleanSearch(df, Seq("alpha", "beta"), Seq("gamma"))
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L))
  }

  test("phrase search: join path matches the scan-expression count and brute force") {
    val phrase = Seq("fast", "table")
    val found = Search.phraseSearch(docs, phrase)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val brute = texts.flatMap { case (id, t) =>
      val occ = t.indices.dropRight(1).filter(i => t(i) == "fast" && t(i + 1) == "table")
      if (occ.nonEmpty) Some(id -> (occ.size.toLong, occ.min.toLong)) else None
    }
    assert(brute.nonEmpty, "phrase should occur in testdata")
    assert(found == brute)
    val viaExpr = docs
      .select(col("doc_id"), Search.phraseOccurrences(col("text"), phrase).as("n"))
      .where(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(viaExpr == found.map { case (id, (n, _)) => id -> n })
  }

  test("phrase with slop: chains match a brute-force ordered-window recomputation") {
    val phrase = Seq("fast", "table", "scan")
    val slop = 2
    val got = Search.phraseSearchSlop(docs, phrase, slop).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // brute force: count all ordered position chains with each gap in
    // [1, 1 + slop]; record the smallest matching anchor
    val brute = texts.flatMap { case (id, t) =>
      val pos = phrase.map(w => t.indices.filter(i => t(i) == w))
      def chains(prev: Int, level: Int): Seq[Int] =
        if (level == phrase.size) Seq(prev)
        else pos(level).filter(p => p > prev && p <= prev + 1 + slop)
          .flatMap(p => chains(p, level + 1))
      val anchors = pos.head.flatMap(a => chains(a, 1).map(_ => a))
      if (anchors.isEmpty) None else Some(id -> (anchors.size.toLong, anchors.min.toLong))
    }
    assert(brute.nonEmpty, "sloppy phrase should occur in testdata")
    assert(brute.values.exists(_._1 > 1L) || brute.size > 1, "want a non-trivial case")
    assert(got == brute)
  }

  test("phrase with slop: slop=0 degrades to exact phrase adjacency") {
    import spark.implicits._
    val df = Seq((1L, "a x b"), (2L, "a b"), (3L, "b a")).toDF("doc_id", "text")
    val strict = Search.phraseSearchSlop(df, Seq("a", "b"), 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(strict == Set((2L, 1L, 0L)), "only the adjacent doc matches at slop=0")
    val sloppy = Search.phraseSearchSlop(df, Seq("a", "b"), 1).collect()
      .map(_.getLong(0)).toSet
    assert(sloppy == Set(1L, 2L), "slop=1 admits one interloper, order still required")
  }

  test("positional index: postings reproduce the token stream; phrase answered FROM the index matches the scan path") {
    import spark.implicits._
    val idx = Search.positionalIndexChunked(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // total occurrences = total tokens
    assert(idx.map(_._3).sum == texts.values.map(_.length.toLong).sum)
    // decode the index back to (term, doc, pos) and answer the phrase
    // "fast table" by the classic adjacency join over postings
    val postings = idx.flatMap { case (term, _, _, ps) =>
      ps.split(",").map { dp =>
        val Array(d, p) = dp.split(":"); (term, d.toLong, p.toLong)
      }
    }
    val fast = postings.filter(_._1 == "fast").map(t => (t._2, t._3)).toSet
    val table = postings.filter(_._1 == "table").map(t => (t._2, t._3 - 1)).toSet
    val viaIndex = fast.intersect(table).groupBy(_._1).view
      .mapValues(ps => (ps.size.toLong, ps.map(_._2).min)).toMap
    val viaScan = Search.phraseSearch(docs, Seq("fast", "table")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(viaIndex == viaScan, "index-answered phrase must equal the scan path")
    // chunking invariant: every posting's doc lands in its row's chunk
    idx.foreach { case (_, chunk, _, ps) =>
      ps.split(",").foreach { dp =>
        assert(dp.split(":")(0).toLong / 100 == chunk, s"posting $dp outside chunk $chunk")
      }
    }
  }

  test("phrase search: repeated-word phrases count overlapping occurrences") {
    import spark.implicits._
    val df = Seq((1L, "x table table table y"), (2L, "table x table")).toDF("doc_id", "text")
    val r = Search.phraseSearch(df, Seq("table", "table"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(r == Set((1L, 2L, 1L)))
  }

  test("bm25: scores rank an obviously relevant doc first and agree with a reference impl") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "spark spark spark"),
      (2L, "spark filler filler filler filler filler filler filler"),
      (3L, "filler filler filler"),
      (4L, "spark spark filler")).toDF("doc_id", "text")
    val got = Search.bm25TopK(corpus, Seq("spark"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // reference BM25 on the same corpus, straight from the formula
    val dls = Map(1L -> 3.0, 2L -> 8.0, 3L -> 3.0, 4L -> 3.0)
    val tfs = Map(1L -> 3.0, 2L -> 1.0, 4L -> 2.0)
    val n = 4.0; val df_ = 3.0; val avgdl = (3 + 8 + 3 + 3) / 4.0
    val idf = math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
    val expect = tfs.map { case (id, tf) =>
      id -> idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dls(id) / avgdl))
    }
    assert(got.map(_._1).toSeq == Seq(1L, 4L, 2L), s"rank order was ${got.toSeq}")
    got.foreach { case (id, s) => assert(math.abs(s - expect(id)) < 1e-9) }
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzy search matches a brute-force edit-distance scan of the vocabulary") {
    val qs = Seq("spak", "strem", "jion")
    val got = Search.fuzzySearch(docs, qs, maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val vocab = texts.values.flatMap(_.distinct)
      .groupBy(identity).map { case (t, occ) => t -> occ.size.toLong }
    val brute = (for {
      q <- qs; (t, df) <- vocab
      d = lev(q, t) if d <= 2
    } yield (q, t, d.toLong, df)).toSet
    assert(brute.nonEmpty, "typo queries should match vocabulary terms")
    assert(got == brute)
    // each planted typo finds its intended correction at distance >= 1
    assert(got.exists { case (q, t, _, _) => q == "spak" && t == "spark" })
    assert(got.exists { case (q, t, _, _) => q == "strem" && t == "stream" })
  }

  test("proximity search matches brute force and is a zero-shuffle plan") {
    val got = Search.proximitySearch(docs, "spark", "slow", maxDist = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = texts.flatMap { case (id, t) =>
      val pa = t.indices.filter(t(_) == "spark")
      val pb = t.indices.filter(t(_) == "slow")
      if (pa.nonEmpty && pb.nonEmpty) {
        val d = (for (x <- pa; y <- pb) yield math.abs(x - y)).min
        if (d <= 5) Some(id -> d.toLong) else None
      } else None
    }
    assert(brute.nonEmpty && got == brute)
    val plan = Search.proximitySearch(docs, "spark", "slow", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"proximity search must not shuffle:\n$plan")
  }

  test("prefix search returns exactly the vocabulary terms under the prefix") {
    val got = Search.prefixSearch(docs, "s").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val brute = texts.values.flatMap(_.distinct).filter(_.startsWith("s"))
      .groupBy(identity).map { case (t, occ) => t -> occ.size.toLong }
    assert(brute.nonEmpty)
    assert(got == brute)
  }

  test("bm25 PRF: expansion retrieves a doc the literal query cannot match") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple orchard harvest"),
      (2L, "apple orchard press"),
      (3L, "orchard cider barrels"),
      (4L, "unrelated words entirely"),
      (5L, "more filler text here")).toDF("doc_id", "text")
    val plain = Search.bm25TopK(df, Seq("apple"), 5).collect().map(_.getLong(0)).toSet
    assert(plain == Set(1L, 2L), "literal query only reaches docs containing it")
    val prf = Search.bm25PrfTopK(df, Seq("apple"), 5, r = 2, e = 1)
      .collect().map(_.getLong(0)).toSet
    // feedback = {1, 2}; their shared rare term is 'orchard' -> doc 3
    // becomes retrievable through the expansion
    assert(prf.contains(3L), s"expansion should retrieve doc 3, got $prf")
    assert(prf.intersect(Set(1L, 2L)) == Set(1L, 2L), "original hits survive re-ranking")
  }

  test("bm25 PRF on testdata: deterministic, bounded, descending") {
    val a = Search.bm25PrfTopK(docs, Seq("spark", "vector"), 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val b = Search.bm25PrfTopK(docs, Seq("spark", "vector"), 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq, "PRF must be deterministic run to run")
    assert(a.length <= 20 && a.nonEmpty)
    val scores = a.map(_._2)
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("bm25 on testdata: k bounds output, scores descend, ties break by doc_id") {
    val r = Search.bm25TopK(docs, Seq("spark", "vector", "slow"), 20)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(r.length == 20)
    r.sliding(2).foreach { case Array((id1, s1), (id2, s2)) =>
      assert(s1 > s2 || (s1 == s2 && id1 < id2))
    }
  }

  test("suffix search: reversed-term prefix equals an endsWith scan of the vocabulary") {
    val got = Search.suffixSearch(docs, "ow").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Search.vocabulary(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .filter(_._1.endsWith("ow")).toMap
    assert(got.nonEmpty && got == expect)
  }

  test("synonym search: canonical reach and variant hits match brute force") {
    val syn = Map("fast" -> Seq("quick", "rapid"), "index" -> Seq("lookup", "catalog"),
      "spark" -> Seq("flame"))
    val got = Search.synonymSearch(docs, syn).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val variants = syn.map { case (c, vs) => c -> (vs :+ c).map(_.toLowerCase).toSet }
    val expect = variants.flatMap { case (c, vs) =>
      val hits = texts.toSeq.map { case (_, t) => t.toSet.intersect(vs).size }
      val reach = hits.count(_ > 0).toLong
      if (reach == 0) None else Some(c -> ((reach, hits.map(_.toLong).sum)))
    }
    assert(got == expect && got.nonEmpty)
  }

  test("wand: pruned top-k equals unpruned bm25 exactly; the UB gate actually prunes") {
    val q = Seq("spark", "vector", "slow")
    val wand = Search.wandTopK(docs, q, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = Search.bm25TopK(docs, q, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(wand == full && wand.nonEmpty)
    val (matched, survived) = Search.wandSurvivorCounts(docs, q, 20)
    assert(survived < matched,
      s"UB gate should prune ($survived survived of $matched matched)")
    assert(survived >= 20, "survivors must still cover the top-k")
  }

  test("faceted search: facet counts equal the brute-force rollup of matching docs") {
    val got = Search.facetedSearch(docs, Seq("spark"), Seq("lang", "source"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val meta = docs.select("doc_id", "lang", "source").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val matching = texts.collect { case (id, t) if t.contains("spark") => id }
    val expect =
      matching.groupBy(id => ("lang", meta(id)._1)).view.mapValues(_.size.toLong) ++
      matching.groupBy(id => ("source", meta(id)._2)).view.mapValues(_.size.toLong)
    assert(got == expect.toMap && got.nonEmpty)
  }

  test("postings delta stats: gaps and bit widths match the sorted posting lists") {
    val got = Search.postingsDeltaStats(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val postings = texts.toSeq.flatMap { case (id, t) => t.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).filter(_._2.size >= 2)
    assert(got.keySet == postings.keySet.toSet && got.nonEmpty)
    postings.foreach { case (term, ids) =>
      val gaps = ids.zip(ids.tail).map { case (a, b) => b - a }
      val (df, fi, li, mg, bits) = got(term)
      assert(df == ids.size && fi == ids.head && li == ids.last)
      assert(mg == gaps.max, s"term $term")
      assert(bits == java.lang.Long.toBinaryString(gaps.max).length)
    }
  }

  test("more-like-this: TF-IDF cosine ranking matches the brute force") {
    val qId = 7L
    val got = Search.moreLikeThis(docs, qId, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val n = texts.size.toDouble
    val tf = texts.view.mapValues(_.groupBy(identity).map { case (t, o) =>
      t -> o.length.toLong }).toMap
    val dfm = tf.values.flatMap(_.keys).groupBy(identity).map { case (t, o) =>
      t -> o.size.toLong }
    def w(d: Long): Map[String, Double] = tf(d).map { case (t, f) =>
      t -> BigDecimal(f * math.log(n / dfm(t)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val qw = w(qId)
    val qn = math.sqrt(qw.values.map(x => x * x).sum)
    val expect = texts.keys.filter(_ != qId).flatMap { d =>
      val dw = w(d)
      val shared = dw.keySet.intersect(qw.keySet)
      if (shared.isEmpty) None else {
        val dot = shared.toSeq.map(t => dw(t) * qw(t)).sum
        val cos = dot / (math.sqrt(dw.values.map(x => x * x).sum) * qn)
        Some(d -> cos)
      }
    }.toSeq.sortBy { case (d, s) => (-s, d) }.take(10)
    assert(got.map(_._1) == expect.map(_._1) && got.nonEmpty)
    got.zip(expect).foreach { case ((_, gs), (_, es)) =>
      assert(math.abs(gs - es) < 1e-5)
    }
  }

  test("regex search: matches and counts reproduce java.util.regex on the driver") {
    val pat = "(spark|vector) (join|index)"
    val got = Search.regexSearch(docs, pat).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val re = java.util.regex.Pattern.compile(pat)
    val expect = docs.select(col("doc_id"), col("text")).collect()
      .map { r =>
        val m = re.matcher(r.getString(1))
        var n = 0L; var first: String = null
        while (m.find()) { if (n == 0) first = m.group(0); n += 1 }
        (r.getLong(0), n, first)
      }
      .filter(_._2 > 0).sortBy(_._1).toSeq
    assert(got.nonEmpty && got == expect)
  }

  test("snippets: ±3 tokens around the first occurrence, exact at both edges") {
    val got = Search.snippets(docs, "vector", context = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val expect = docs.select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val toks = r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
        val pos = toks.indexOf("vector")   // 0-based, -1 if absent
        if (pos < 0) None
        else Some((r.getLong(0), pos + 1L,
          toks.slice(math.max(pos - 3, 0), math.min(pos + 4, toks.length))
            .mkString(" ")))
      }.sortBy(_._1).toSeq
    assert(got.nonEmpty && got == expect)
    // at least one match near a document edge exercises the clamping
    assert(expect.exists(_._2 <= 3), "need an edge-clamped snippet in testdata")
  }

  test("suggest: top-3 corrections ranked by (dist, df desc, term), recomputed brute-force") {
    val probes = Seq("spak", "strem", "jion")
    val got = Search.suggestTerms(docs, probes).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // brute-force vocabulary + ranking from raw text
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val df = docs.select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).distinct)
      .groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val expect = probes.flatMap { q =>
      df.keys.toSeq.map(t => (t, lev(q, t)))
        .filter { case (t, d) => math.abs(t.length - q.length) <= 2 && d <= 2 }
        .sortBy { case (t, d) => (d, -df(t), t) }.take(3).zipWithIndex
        .map { case ((t, d), i) => (q, (i + 1).toLong, t, d.toLong, df(t)) }
    }.toSet
    assert(got.toSet == expect && got.nonEmpty)
  }

  test("infix trigram index equals the direct contains scan; false positives verified away") {
    import spark.implicits._
    // testdata route: indexed path == direct scan
    val direct = Search.vocabulary(docs).where(col("term").contains("park"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val indexed = Search.infixSearch(docs, "park")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(indexed == direct && indexed.nonEmpty)
    // planted trigram false positive: 'abcxbcd' carries grams
    // abc+bcd of query 'abcd' but does not contain it
    val planted = Seq((1L, "abcd hit"), (2L, "abcxbcd decoy"), (3L, "plain"))
      .toDF("doc_id", "text")
    val got = Search.infixSearch(planted, "abcd")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("abcd"), s"decoy must be verified away, got $got")
    // sub-trigram query falls back to the direct filter
    val short = Search.infixSearch(planted, "bc")
      .collect().map(_.getString(0)).toSet
    assert(short == Set("abcd", "abcxbcd"))
  }

  test("hybrid RRF equals driver-side fusion of the two independently-tested legs") {
    val emb = Tables.embeddings(spark, sf)
    val terms = Seq("spark", "vector", "slow")
    val k = 20
    val tRanks = Search.bm25TopK(docs, terms, k).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val vRanks = graft.operators.Similarity.bruteForceTopK(
        emb.where(col("vec_id") === 0L), emb, k).collect()
      .map(r => r.getLong(2) -> r.getInt(1).toLong).toMap
    def rrf(id: Long): Double = {
      val raw = tRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        vRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = (tRanks.keySet ++ vRanks.keySet).toSeq
      .map(id => (id, rrf(id))).sortBy { case (id, s) => (-s, id) }.take(k)
    val got = Search.hybridRrf(docs, emb, terms, qVecId = 0L, k = k).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got == expect, s"\ngot:    $got\nexpect: $expect")
    // both legs actually contribute: some fused doc is text-only, some vec-only
    val gotIds = got.map(_._1).toSet
    assert(gotIds.exists(id => tRanks.contains(id) && !vRanks.contains(id)))
    assert(gotIds.exists(id => vRanks.contains(id) && !tRanks.contains(id)))
  }
}
