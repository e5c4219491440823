package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Full-text search over the inverted-index surface — the query layer
  * a user of an inverted-index engine (reference src/main.rs:398-499
  * builds value→posting-list maps) ultimately wants on top of it:
  * boolean term search, positional phrase search, and BM25 relevance
  * ranking.
  *
  * Spark-first shapes, chosen per query class:
  *
  *  - Term/posting queries never materialize the full token explode.
  *    Tokens are intersected with the (tiny, literal) query vocabulary
  *    INSIDE the scan projection, so the generator output is bounded by
  *    |query terms| per doc, not |tokens| — at 100 TB the explode is
  *    the difference between shuffling a few matched rows and
  *    shuffling the entire tokenized corpus.
  *  - Boolean search has two result-identical paths: a posting-list
  *    aggregation (the "index algebra" path — one shuffle of matched
  *    postings, conditional-count AND/NOT semantics) and a pure
  *    scan-stage filter (zero shuffle, the right plan when no
  *    materialized index exists). SearchSpec proves them equal.
  *  - Phrase search aligns positional postings by (doc, pos - offset)
  *    equi-joins — the classic positional-index adjacency join; only
  *    phrase-term positions ever shuffle.
  *  - BM25 keeps corpus statistics (N, avgdl) one broadcast row and
  *    document frequencies one broadcast table; per-doc scores reduce
  *    in a map-side-combined sum and the final top-k is a
  *    TakeOrderedAndProject, so nothing unbounded crosses the wire.
  *    At production scale N/avgdl/df come from a precomputed corpus
  *    statistics table (they change slowly); this operator computes
  *    them inline so the result is self-contained.
  */
object Search {

  /** Search-side tokenization: lowercased whitespace tokens — the
    * match side of TextFunctions.tokens. */
  def searchTokens(text: Column): Column = TextFunctions.tokens(lower(text))

  /** Query-restricted postings (doc_id, term): one row per (doc,
    * distinct matched query term). The intersect runs in the scan
    * projection, so unmatched tokens never leave the generator. */
  def postingsFor(docs: DataFrame, terms: Seq[String],
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val termArr = array(terms.distinct.map(lit): _*)
    docs.select(col(idCol).cast("long").as("doc_id"),
      explode(array_intersect(array_distinct(searchTokens(col(textCol))), termArr)).as("term"))
  }

  /** Boolean search, posting-list path: docs containing ALL of `must`
    * and NONE of `mustNot`. AND = count of distinct matched must-terms
    * equals |must|; NOT = any matched mustNot-term disqualifies. One
    * shuffle, keyed on doc_id, carrying only matched postings. */
  def booleanSearch(docs: DataFrame, must: Seq[String], mustNot: Seq[String] = Nil,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(must.nonEmpty, "at least one required term")
    val m = must.distinct.map(_.toLowerCase)
    val n = mustNot.distinct.map(_.toLowerCase)
    postingsFor(docs, m ++ n, textCol, idCol)
      .groupBy(col("doc_id"))
      .agg(sum(when(col("term").isin(m: _*), 1L).otherwise(0L)).as("n_must"),
        // empty isin = constant-false predicate, so no-mustNot degrades
        // to max(false) — still a valid aggregate
        max(col("term").isin(n: _*)).as("has_not"))
      .where(col("n_must") === m.size && !col("has_not"))
      .select(col("doc_id"))
  }

  /** Disjunctive boolean search with minimum-should-match: docs
    * matching at least `minMatch` DISTINCT terms of `should`, with the
    * match count (the coordination factor rankers use). Same
    * one-shuffle query-restricted posting shape as `booleanSearch` —
    * postingsFor emits one row per (doc, distinct matched term), so
    * the count is a plain count(1) and non-matching docs never leave
    * the scan. */
  def orSearch(docs: DataFrame, should: Seq[String], minMatch: Int = 1,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(should.nonEmpty, "at least one should-term")
    require(minMatch >= 1 && minMatch <= should.distinct.size,
      "minMatch must be within [1, |should|]")
    postingsFor(docs, should.map(_.toLowerCase), textCol, idCol)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matched"))
      .where(col("n_matched") >= minMatch)
  }

  /** Boolean search, scan path: the same predicate as a pushed-down
    * per-row filter — zero shuffle, for corpora with no prebuilt
    * index. Result-identical to `booleanSearch`. */
  def booleanSearchScan(docs: DataFrame, must: Seq[String], mustNot: Seq[String] = Nil,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = searchTokens(col(textCol))
    val mustPred = must.distinct.map(w => array_contains(t, w.toLowerCase)).reduce(_ && _)
    val notPred = mustNot.distinct
      .map(w => array_contains(t, w.toLowerCase))
      .foldLeft(lit(false))(_ || _)
    docs.where(mustPred && !notPred).select(col(idCol).cast("long").as("doc_id"))
  }

  /** Positional postings (doc_id, pos, term) restricted to `terms`:
    * positions are attached and filtered INSIDE the array (transform +
    * filter) before the explode, so only query-term occurrences are
    * generated. */
  def positionalPostingsFor(docs: DataFrame, terms: Seq[String],
                            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val termArr = array(terms.distinct.map(lit): _*)
    val indexed = filter(
      transform(searchTokens(col(textCol)),
        (tok, i) => struct(i.cast("long").as("pos"), tok.as("term"))),
      s => array_contains(termArr, s.getField("term")))
    docs.select(col(idCol).cast("long").as("doc_id"), explode(indexed).as("pt"))
      .select(col("doc_id"), col("pt.pos").as("pos"), col("pt.term").as("term"))
  }

  /** Phrase search via positional-posting adjacency joins: word i of
    * the phrase must appear at (anchor position + i). Each join is an
    * equi-join on (doc_id, aligned position) over phrase-term-only
    * postings. Returns (doc_id, n_occurrences, first_pos), 0-based
    * positions, matching docs only. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two words")
    val words = phrase.map(_.toLowerCase)
    val p = positionalPostingsFor(docs, words, textCol, idCol)
    val anchor = p.where(col("term") === words.head)
      .select(col("doc_id"), col("pos").as("p0"))
    val aligned = words.zipWithIndex.tail.foldLeft(anchor) { case (acc, (w, i)) =>
      // positions are unique per doc, so each join is 1:1 on (doc, p0)
      acc.join(
        p.where(col("term") === w).select(col("doc_id"), (col("pos") - i).as("p0")),
        Seq("doc_id", "p0"))
    }
    aligned.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"), min(col("p0")).as("first_pos"))
  }

  /** Phrase search with slop: the words must appear IN ORDER, each
    * within `1 + slop` positions of its predecessor (up to `slop`
    * interlopers per gap) — the sloppy-phrase query of a positional
    * index. Same adjacency-join shape as `phraseSearch`, with each
    * equality on the aligned position relaxed to a band
    * `prev < next ≤ prev + 1 + slop`; postings are still restricted to
    * the phrase's terms inside the scan projection, so the band join's
    * inputs stay tiny. `n_matches` counts position CHAINS (one anchor
    * can continue through several in-window successors — the join
    * cardinality, deterministic and engine-independent); `first_pos`
    * is the smallest matching anchor, 0-based. */
  def phraseSearchSlop(docs: DataFrame, phrase: Seq[String], slop: Int,
                       textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two words")
    require(slop >= 0, "slop must be >= 0")
    val words = phrase.map(_.toLowerCase)
    val p = positionalPostingsFor(docs, words, textCol, idCol)
    val anchor = p.where(col("term") === words.head)
      .select(col("doc_id"), col("pos").as("p0"), col("pos").as("pcur"))
    val chained = words.tail.foldLeft(anchor) { case (acc, w) =>
      val nxt = p.where(col("term") === w)
        .select(col("doc_id").as("__d"), col("pos").as("__pn"))
      acc.join(nxt, col("doc_id") === col("__d") &&
          col("__pn") > col("pcur") && col("__pn") <= col("pcur") + 1 + slop)
        .select(col("doc_id"), col("p0"), col("__pn").as("pcur"))
    }
    chained.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("p0")).as("first_pos"))
  }

  /** Per-row phrase occurrence count — the scan-path twin of
    * `phraseSearch` (SearchSpec proves them equal). */
  def phraseOccurrences(text: Column, phrase: Seq[String]): Column = {
    val words = phrase.map(_.toLowerCase)
    val t = searchTokens(text)
    val m = words.size
    val matchAt = (i: Column) =>
      words.zipWithIndex
        .map { case (w, j) => element_at(t, (i + j + 1).cast("int")) === w }
        .reduce(_ && _)
    when(size(t) >= m, size(filter(sequence(lit(0), size(t) - m), matchAt)))
      .otherwise(0)
  }

  /** Positional inverted index BUILD — the materialized counterpart
    * of the on-the-fly positional postings the phrase/proximity QUERY
    * path derives per query: every term mapped to its sorted
    * (doc, pos) postings. Unlike the query path, an index build must
    * explode the full token stream (that IS the job — the output is
    * the token stream re-keyed by term); the scale disciplines are the
    * ones the value index already uses: one term-keyed shuffle with
    * map-side partial aggregation, and posting lists CHUNKED by doc-id
    * range so a hot term ("the") can never build an unbounded
    * aggregation buffer. Postings serialize as "doc:pos" in (doc, pos)
    * order. SearchSpec proves phrase queries answered FROM the index
    * equal the scan-path phraseSearch. */
  def positionalIndexChunked(docs: DataFrame, chunkSize: Long = 100,
                             textCol: String = "text",
                             idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(searchTokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy(col("term"),
        expr(s"(doc_id - pmod(doc_id, ${chunkSize}L)) DIV ${chunkSize}L").as("chunk"))
      .agg(count(lit(1)).as("n_occ"),
        array_sort(collect_list(struct(col("doc_id"),
          col("pos").cast("long").as("pos")))).as("ps"))
      .select(col("term"), col("chunk"), col("n_occ"),
        array_join(transform(col("ps"), x =>
          concat(x.getField("doc_id").cast("string"), lit(":"),
            x.getField("pos").cast("string"))), ",").as("postings"))

  /** Term dictionary with document frequencies — the vocabulary side
    * of the inverted index. `array_distinct` runs inside the scan
    * projection so each (doc, term) contributes once; the single
    * shuffle is the term group-by with map-side partial counts. */
  def vocabulary(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(array_distinct(searchTokens(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Fuzzy term lookup: vocabulary entries within edit distance
    * `maxDist` of any query term — the spell-correction layer of a
    * search engine. Query terms broadcast (a handful of literals); the
    * vocabulary never moves. The length gate |len(q) − len(term)| ≤
    * maxDist is a Levenshtein lower bound, so the quadratic DP runs
    * only on plausible pairs, and the threshold-capped `levenshtein`
    * (returns −1 past maxDist) bounds the DP band itself. */
  def fuzzySearch(docs: DataFrame, terms: Seq[String], maxDist: Int = 1,
                  textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && maxDist >= 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val queries = terms.distinct.map(_.toLowerCase).toDF("q")
    val dist = levenshtein(col("q"), col("term"), maxDist)
    vocabulary(docs, textCol)
      .join(broadcast(queries),
        abs(length(col("term")) - length(col("q"))) <= maxDist && dist >= 0)
      .select(col("q"), col("term"), dist.cast("long").as("dist"), col("df"))
  }

  /** Did-you-mean suggestion: the fuzzy candidate set ranked per query
    * term by (edit distance, corpus df DESC, term) and cut to `topN` —
    * the query-correction layer every search box puts in front of the
    * index (a frequent word at distance 1 beats a rare word at
    * distance 1 beats anything at distance 2). The rank window keys on
    * the query term over the already-tiny candidate set (vocabulary
    * within edit distance of |terms| probes), so it adds nothing to
    * fuzzySearch's scale shape: vocab aggregation + broadcast probe. */
  def suggestTerms(docs: DataFrame, terms: Seq[String], maxDist: Int = 2,
                   topN: Int = 3, textCol: String = "text"): DataFrame =
    fuzzySearch(docs, terms, maxDist, textCol)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q")).orderBy(col("dist"), col("df").desc, col("term"))))
      .where(col("rank") <= topN)
      .select(col("q"), col("rank").cast("long").as("rank"), col("term"),
        col("dist"), col("df"))

  /** Regex search — the grep layer under the term-based family, for
    * queries a tokenized index can't answer (patterns spanning token
    * boundaries, alternations with context). A pure scan-stage
    * predicate + count: no index, no shuffle until the final sort; at
    * 100 TB it reads at the corpus's sequential-scan rate, which is
    * why the indexed operators exist for everything a term query CAN
    * express. Pattern dialect is kept to the literal/alternation/
    * grouping subset that Java regex and RE2-family engines interpret
    * identically. */
  def regexSearch(docs: DataFrame, pattern: String,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        regexp_count(col(textCol), lit(pattern)).cast("long").as("n_matches"),
        regexp_extract(col(textCol), pattern, 0).as("first_match"))
      .where(col("n_matches") > 0)
      .orderBy(col("doc_id"))

  /** Keyword-in-context snippets: for every document containing
    * `term`, the ±`context` tokens around its FIRST occurrence — what
    * a search result page renders. Array-position arithmetic inside
    * the scan (tokenize once, `array_position`, slice); only matching
    * docs emit a row and only the snippet leaves the scan, never the
    * document. */
  def snippets(docs: DataFrame, term: String, context: Int = 3,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val t = term.toLowerCase
    val toks = searchTokens(col(textCol))
    docs.select(col(idCol).cast("long").as("doc_id"), toks.as("t"))
      .withColumn("pos", array_position(col("t"), t))
      .where(col("pos") > 0)
      .select(col("doc_id"), col("pos"),
        array_join(slice(col("t"),
          greatest(col("pos") - context, lit(1L)).cast("int"),
          // window end is min(pos+context, len), start is max(pos-c,1):
          // length = end - start + 1 — exact at both document edges
          (least(col("pos") + context, size(col("t")).cast("long")) -
            greatest(col("pos") - context, lit(1L)) + 1).cast("int")),
          " ").as("snippet"))
      .orderBy(col("doc_id"))
  }

  /** Prefix (`pre*` wildcard) search over the term dictionary: terms
    * starting with `prefix` and their document frequencies. The prefix
    * test runs inside the token array before the explode, so only
    * matching terms are ever generated. */
  def prefixSearch(docs: DataFrame, prefix: String,
                   textCol: String = "text"): DataFrame = {
    val p = prefix.toLowerCase
    docs.select(explode(filter(array_distinct(searchTokens(col(textCol))),
        t => t.startsWith(lit(p)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
  }

  /** X134: posting-list delta-gap compression stats — for every term
    * with ≥2 postings, the d-gap profile (first/last id, widest gap,
    * and the bit width `len(bin(max_gap))` a fixed-width gap coder
    * would need). This is the sizing pass for compressed postings
    * (VByte/PForDelta pick block widths from exactly these numbers),
    * and on the doc-id-CLUSTERED layout it quantifies the win: terms
    * correlated with the cluster key get small gaps → few bits. One
    * token explode re-keyed by term (the same exchange any index build
    * pays), then a term-keyed lag window — high-cardinality partition
    * key, so every sort is small and parallel. */
  def postingsDeltaStats(docs: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(searchTokens(col(textCol)))).as("term"))
      .withColumn("gap", col("doc_id") - lag(col("doc_id"), 1).over(w))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("first_id"),
        max(col("doc_id")).as("last_id"), max(col("gap")).as("max_gap"))
      .where(col("df") >= 2)
      .withColumn("gap_bits", length(bin(col("max_gap"))).cast("long"))
      .orderBy(col("term"))
  }

  /** Suffix (`*fix` wildcard) search via the classic reversed-term
    * trick: a trailing wildcard is unindexable left-to-right, but
    * REVERSE every term and the suffix query becomes a prefix query
    * over the reversed dictionary — sargable, dictionary-prunable,
    * exactly how Lucene's reverse-wildcard field works. The reverse +
    * prefix test runs inside the token array before the explode, so
    * like prefixSearch only matching terms are ever generated. */
  def suffixSearch(docs: DataFrame, suffix: String,
                   textCol: String = "text"): DataFrame = {
    val rp = suffix.toLowerCase.reverse
    docs.select(explode(filter(array_distinct(searchTokens(col(textCol))),
        t => reverse(t).startsWith(lit(rp)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
  }

  /** X168: infix wildcard ('*park*') via a TRIGRAM term index — the
    * pg_trgm technique: the VOCABULARY (never the corpus) explodes
    * into character trigrams, the query's trigrams probe it, and a
    * term qualifies when it carries ALL of them; a contains() check
    * then verifies (trigram agreement is necessary, not sufficient —
    * 'abcxbcd' has both grams of 'abcd' without containing it). The
    * probe is a literal IN over a handful of grams, so at scale the
    * trigram table is the persisted index and the query touches
    * |q-grams| index keys instead of every vocabulary term — the
    * leading-wildcard query class that prefix (sargable) and suffix
    * (reversed-term) tricks cannot reach. Sub-trigram queries fall
    * back to the direct vocabulary filter. Returns (term, df). */
  def infixSearch(docs: DataFrame, infix: String,
                  textCol: String = "text"): DataFrame = {
    val q = infix.toLowerCase
    val vocab = vocabulary(docs, textCol)
    if (q.length < 3)
      vocab.where(col("term").contains(q)).select(col("term"), col("df"))
    else {
      val qGrams = q.sliding(3).toSeq.distinct
      vocab.where(length(col("term")) >= q.length)
        .select(col("term"), col("df"),
          explode(array_distinct(transform(
            sequence(lit(0), length(col("term")) - 3),
            i => col("term").substr(i + 1, lit(3))))).as("gram"))
        .where(col("gram").isin(qGrams: _*))
        .groupBy(col("term"), col("df"))
        .agg(count(lit(1)).as("__hits"))
        .where(col("__hits") === qGrams.length && col("term").contains(q))
        .select(col("term"), col("df"))
    }
  }

  /** Proximity search: docs where `termA` and `termB` co-occur within
    * `maxDist` token positions, with the best (smallest) distance.
    * Entirely per-row — positions of the two query terms are extracted
    * inside the token array and the O(|pa|·|pb|) min-distance runs as
    * an array expression over those (few) occurrences, so the corpus
    * never shuffles; the scan IS the query. */
  def proximitySearch(docs: DataFrame, termA: String, termB: String, maxDist: Int,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxDist >= 1)
    def positions(t: Column, term: String): Column =
      filter(transform(t, (tok, i) => when(tok === term.toLowerCase, i).otherwise(-1)),
        x => x >= 0)
    val t = searchTokens(col(textCol))
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        positions(t, termA).as("pa"), positions(t, termB).as("pb"))
      .where(size(col("pa")) > 0 && size(col("pb")) > 0)
      .select(col("doc_id"),
        array_min(flatten(transform(col("pa"), x =>
          transform(col("pb"), y => abs(x - y))))).cast("long").as("best_dist"))
      .where(col("best_dist") <= maxDist)
  }

  /** BM25 with pseudo-relevance feedback (Rocchio-style query
    * expansion): stage 1 ranks with the literal query and takes the
    * top-`r` docs as the feedback set; the expansion terms are the
    * feedback set's terms ranked by (feedback-df DESC, corpus-df ASC,
    * term ASC) — shared by the relevant docs, rare in the corpus —
    * minus the original query; stage 2 re-ranks with the expanded
    * set, retrieving docs the literal query could never match.
    *
    * Stage 2's terms are DATA-DEPENDENT, so its tf stage is an
    * explode + broadcast term join instead of the literal in-array
    * intersect (which needs plan-time terms): still a scan-stage
    * generate + filter with zero shuffle before the doc aggregation —
    * the inherent cost of a dynamic vocabulary. Corpus statistics and
    * term tables stay broadcast-sized exactly as in `bm25TopK`. */
  def bm25PrfTopK(docs: DataFrame, query: Seq[String], k: Int,
                  r: Int = 5, e: Int = 3,
                  k1: Double = 1.2, b: Double = 0.75,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(query.nonEmpty && k > 0 && r > 0 && e >= 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val q0 = query.distinct.map(_.toLowerCase)
    val feedback = bm25TopK(docs, q0, r, k1, b, textCol, idCol).select(col("doc_id"))
    val docTerms = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(array_distinct(searchTokens(col(textCol)))).as("term"))
    val fdf = docTerms.join(broadcast(feedback), "doc_id")
      .where(!col("term").isin(q0: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("fdf"))
    val expansion = fdf.join(vocabulary(docs, textCol), "term")
      .orderBy(col("fdf").desc, col("df").asc, col("term"))
      .limit(e)
      .select(col("term"))
    val terms = q0.toDF("term").unionByName(expansion).distinct()
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        searchTokens(col(textCol)).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("dl"))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = base.select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .join(broadcast(terms), "term")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * k1p1) /
          (col("tf") + lit(k1) * (lit(oneMinusB) + lit(b) * col("dl") / col("avgdl")))).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** BM25 top-k relevance ranking for a bag-of-words query.
    *
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the standard
    * non-negative BM25+ idf), score = Σ_terms idf · tf·(k1+1) /
    * (tf + k1·(1 - b + b·dl/avgdl)). Robertson-Spärck Jones weighting
    * as published (Robertson & Zaragoza 2009, "The Probabilistic
    * Relevance Framework: BM25 and Beyond").
    *
    * Returns the k best (doc_id, score), score descending, doc_id
    * ascending on ties. */
  /** X148: synonym-expanded term search — the query-time alias layer
    * (thesaurus, stemming table, product-name aliases) every search
    * deployment bolts on: each canonical term matches any of its
    * variants, reported as distinct-doc reach plus raw variant hits.
    * The variant→canonical map is a broadcast table joined against
    * the per-doc DISTINCT token explode, so only vocabulary hits —
    * not the token stream — reach the canonical rollup, keyed by
    * (canonical, doc) with map-side partial dedup. */
  def synonymSearch(docs: DataFrame, synonyms: Map[String, Seq[String]],
                    textCol: String = "text"): DataFrame = {
    require(synonyms.nonEmpty)
    val spark = docs.sparkSession
    val pairs = synonyms.toSeq.flatMap { case (canon, vs) =>
      (vs :+ canon).distinct.map(v => (v.toLowerCase, canon.toLowerCase))
    }
    val syn = broadcast(spark.createDataFrame(pairs).toDF("term", "canonical"))
    docs.select(col("doc_id"),
        explode(array_distinct(searchTokens(col(textCol)))).as("term"))
      .join(syn, "term")
      .groupBy(col("canonical"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_variant_hits"))
      .orderBy(col("canonical"))
  }

  /** X133: faceted search — run a conjunctive term query and roll the
    * matching docs up by each requested metadata facet (the sidebar
    * counts every search UI shows next to results). The match
    * predicate runs inside the scan (same per-row token test as
    * booleanSearchScan — no index round-trip for a one-shot query);
    * facet expansion is one `explode` of |facets| structs per matching
    * row, so the only exchange is the (facet, value) count aggregate,
    * map-side combined and bounded by Σ|facet domains|. */
  def facetedSearch(docs: DataFrame, must: Seq[String], facets: Seq[String],
                    textCol: String = "text"): DataFrame = {
    require(must.nonEmpty && facets.nonEmpty)
    val toks = searchTokens(col(textCol))
    val matched = docs.where(must.map(t => array_contains(toks, t))
      .reduce(_ && _))
    matched
      .select(explode(array(facets.map(f =>
        struct(lit(f).as("facet"), col(f).as("value"))): _*)).as("fv"))
      .groupBy(col("fv.facet").as("facet"), col("fv.value").as("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("facet"), col("value"))
  }

  /** X129: more-like-this — rank the corpus by TF-IDF cosine
    * similarity to one query DOCUMENT (the "related documents" query,
    * where BM25's free-text form starts from terms instead). Weights
    * are tf·ln(N/df), rounded to 9 dp so the two engines' ln ulps
    * can't diverge; dot products and squared norms accumulate as
    * DECIMAL so float-summation ORDER (which Spark and DuckDB choose
    * differently) is invisible — the only double arithmetic is one
    * dependency-free expression per output row.
    *
    * Scale shape: candidate generation is a posting-list join — the
    * broadcast query vector (|query terms| rows) meets each term's
    * posting list where it lives, so only docs SHARING a term are ever
    * scored, and each contributes one partial-aggregated dot-product
    * row per shared term. Norms ride the same (doc, term) aggregate.
    * Nothing is quadratic; the reduce keys on doc_id throughout. */
  def moreLikeThis(docs: DataFrame, queryDocId: Long, k: Int,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      searchTokens(col(textCol)).as("t"))
    val tf = base.select(col("doc_id"), explode(col("t")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val stats = base.agg(count(lit(1)).as("n_docs"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = tf.join(dft, "term").crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 9).as("w"))
    val norms = w.groupBy(col("doc_id"))
      .agg(sum((col("w") * col("w")).cast("decimal(30,10)")).as("nsq"))
    val qvec = w.where(col("doc_id") === queryDocId)
      .select(col("term"), col("w").as("wq"))
    val qnorm = norms.where(col("doc_id") === queryDocId)
      .select(col("nsq").as("qnsq"))
    w.join(broadcast(qvec), "term")
      .where(col("doc_id") =!= queryDocId)
      .groupBy(col("doc_id"))
      .agg(sum((col("w") * col("wq")).cast("decimal(30,10)")).as("dot"))
      .join(norms, "doc_id")
      .crossJoin(broadcast(qnorm))
      .select(col("doc_id"), round(col("dot").cast("double") /
        (sqrt(col("nsq").cast("double")) * sqrt(col("qnsq").cast("double"))), 6)
        .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** X138: WAND/MaxScore-pruned BM25 — the top-k pruning algorithm
    * production engines use so ranking cost tracks the RESULT, not the
    * corpus. Result-identical to `bm25TopK` (the spec and the shared
    * oracle prove it); the plan differs: per-term score UPPER BOUNDS
    * (from max tf and min dl — aggregates, not per-doc work) gate
    * which docs enter the scoring exchange.
    *
    * Three phases, Spark-first: (1) one aggregation pass derives
    * corpus stats and per-term (df, max tf) — |query terms| rows
    * collected to the driver, bounded metadata like IVF centroids;
    * (2) a seed pass fully scores only the RAREST term's posting set
    * with a per-row expression (all constants known), and its k-th
    * best score θ̂ is a certified lower bound of the final threshold —
    * any true top-k doc has score ≥ θ ≥ θ̂ and UB ≥ score, so
    * (3) the UB gate `Σ ub(matched terms) ≥ θ̂` — evaluated INSIDE the
    * scan from broadcast constants, before any exchange — provably
    * keeps every true top-k doc, and the exact scorer runs only on
    * survivors. At 100 TB the gate drops the overwhelming share of
    * matching docs from the shuffle; with the materialized index the
    * same bounds skip posting-fetches entirely. */
  def wandTopK(docs: DataFrame, query: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val (survivors, termStats, nDocs, avgdl) = wandPrep(docs, query, k, k1, b, textCol, idCol)
    val spark = docs.sparkSession
    val dft = broadcast(spark.createDataFrame(termStats.map(t => (t._1, t._2)))
      .toDF("term", "df"))
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val tfStructs = array(query.distinct.map(_.toLowerCase).map(w =>
      struct(lit(w).as("term"),
        size(filter(col("t"), x => x === w)).cast("long").as("tf"))): _*)
    survivors.select(col("doc_id"), col("dl"), explode(tfStructs).as("ts"))
      .select(col("doc_id"), col("dl"), col("ts.term").as("term"), col("ts.tf").as("tf"))
      .where(col("tf") > 0)
      .join(dft, "term")
      .select(col("doc_id"),
        (log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * k1p1) /
          (col("tf") + lit(k1) * (lit(oneMinusB) + lit(b) * col("dl") / lit(avgdl)))).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Docs matching ≥1 query term vs docs surviving the UB gate —
    * the pruning effectiveness the spec asserts. */
  def wandSurvivorCounts(docs: DataFrame, query: Seq[String], k: Int,
                         k1: Double = 1.2, b: Double = 0.75,
                         textCol: String = "text", idCol: String = "doc_id"): (Long, Long) = {
    val terms = query.distinct.map(_.toLowerCase)
    val toks = searchTokens(col(textCol))
    val matched = docs.where(terms.map(t => array_contains(toks, t)).reduce(_ || _)).count()
    val (survivors, _, _, _) = wandPrep(docs, query, k, k1, b, textCol, idCol)
    (matched, survivors.count())
  }

  /** Shared phases 1-3 of wandTopK: returns (surviving base rows,
    * per-term (term, df, maxtf), n_docs, avgdl). */
  private def wandPrep(docs: DataFrame, query: Seq[String], k: Int,
                       k1: Double, b: Double, textCol: String, idCol: String)
      : (DataFrame, Seq[(String, Long, Long)], Long, Double) = {
    require(query.nonEmpty && k > 0)
    val terms = query.distinct.map(_.toLowerCase)
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        searchTokens(col(textCol)).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("dl"))
    // phase 1: corpus stats + per-term df/maxtf — bounded collects
    val Array(st) = base.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"),
      min(col("dl")).as("mindl")).collect()
    val (nDocs, avgdl, minDl) = (st.getLong(0), st.getDouble(1), st.getLong(2))
    val tfStructs = array(terms.map(w =>
      struct(lit(w).as("term"),
        size(filter(col("t"), x => x === w)).cast("long").as("tf"))): _*)
    val termStats = base.select(explode(tfStructs).as("ts"))
      .select(col("ts.term").as("term"), col("ts.tf").as("tf"))
      .where(col("tf") > 0)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), max(col("tf")).as("maxtf"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1) // fixed term order → deterministic θ̂ sum
    def idf(df: Long): Double = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    def termScore(tf: Double, dl: Double, df: Long): Double =
      idf(df) * (tf * k1p1) / (tf + k1 * (oneMinusB + b * dl / avgdl))
    val ub = termStats.map { case (t, df, maxtf) =>
      t -> termScore(maxtf.toDouble, minDl.toDouble, df)
    }.toMap
    // per-row exact score from driver constants (same formula/values)
    val rowScore = if (termStats.isEmpty) lit(0.0) else termStats.map {
      case (t, df, _) =>
        val tf = size(filter(col("t"), x => x === t)).cast("double")
        when(tf > 0, lit(idf(df)) * (tf * k1p1) /
          (tf + lit(k1) * (lit(oneMinusB) + lit(b) * col("dl") / lit(avgdl))))
          .otherwise(lit(0.0))
    }.reduce(_ + _)
    // phase 2: θ̂ from the rarest term's fully-scored posting set
    val thetaHat = if (termStats.isEmpty) 0.0 else {
      val rarest = termStats.minBy(_._2)._1
      val seed = base.where(array_contains(col("t"), rarest))
        .select(rowScore.as("s")).orderBy(col("s").desc).limit(k)
        .collect().map(_.getDouble(0))
      if (seed.length < k) 0.0 else seed.last
    }
    // phase 3: the scan-stage UB gate
    val ubExpr = terms.map(t =>
      when(array_contains(col("t"), t), lit(ub.getOrElse(t, 0.0)))
        .otherwise(lit(0.0))).reduce(_ + _)
    (base.where(ubExpr >= thetaHat && ubExpr > 0.0), termStats, nDocs, avgdl)
  }

  /** X217: query-likelihood retrieval with Dirichlet smoothing (Zhai
    * & Lafferty 2004) — the language-modeling ranking family BM25's
    * probabilistic family competes with; µ-smoothing backs each
    * term's document probability off to its corpus rate, so documents
    * are penalized for missing terms instead of merely not rewarded
    * (the score is a true log-likelihood: Σ_t ln((tf + µ·cf_t/|C|)
    * / (dl + µ))).
    *
    * Scale/determinism shape: per-term tf is computed INSIDE the scan
    * from the shared token projection (no explode, no per-term
    * groupBy); corpus stats are one broadcast row (Σdl and per-term
    * collection frequencies as |terms| columns); the per-doc score is
    * a LITERAL left-assoc sum in declared term order — no float
    * aggregation with engine-chosen order exists anywhere — and the
    * only shuffle is the final top-k sort. */
  def lmDirichletTopK(docs: DataFrame, query: Seq[String], k: Int,
                      mu: Double = 2000.0,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    require(query.nonEmpty && k > 0)
    val terms = query.distinct.map(_.toLowerCase)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        searchTokens(col(textCol)).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("dl"))
    def tfOf(w: String) = size(filter(col("t"), x => x === w)).cast("long")
    // one broadcast row: total corpus tokens + each term's collection
    // frequency (exact longs; |terms| columns, not |terms| rows, so
    // the score needs no join key at all)
    val stats = base.agg(sum(col("dl")).as("c_total"),
      terms.map(w => sum(tfOf(w)).as(s"cf_$w")): _*)
    val scored = base
      .select(col("doc_id") +: col("dl") +:
        terms.map(w => tfOf(w).as(s"tf_$w")): _*)
      .where(terms.map(w => col(s"tf_$w") > 0).reduceLeft(_ || _))
      .crossJoin(broadcast(stats))
    val termScore = (w: String) =>
      log((col(s"tf_$w").cast("double") +
        lit(mu) * (col(s"cf_$w").cast("double") /
          col("c_total").cast("double"))) /
        (col("dl") + lit(mu)))
    scored
      .select(col("doc_id"),
        terms.map(termScore).reduceLeft(_ + _).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def bm25TopK(docs: DataFrame, query: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(query.nonEmpty && k > 0)
    val terms = query.distinct.map(_.toLowerCase)
    // constants are pre-folded in Scala so an oracle re-deriving the
    // same formula from these exact doubles stays bit-comparable
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        searchTokens(col(textCol)).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("dl"))
    // corpus statistics: one row, broadcast back onto the scored rows
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // per-(doc, query term) frequencies; docs lacking the term drop out
    val tfStructs = array(terms.map(w =>
      struct(lit(w).as("term"),
        size(filter(col("t"), x => x === w)).cast("long").as("tf"))): _*)
    val tf = base.select(col("doc_id"), col("dl"), explode(tfStructs).as("ts"))
      .select(col("doc_id"), col("dl"), col("ts.term").as("term"), col("ts.tf").as("tf"))
      .where(col("tf") > 0)
    // document frequency per query term: |terms| rows, broadcast
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * k1p1) /
          (col("tf") + lit(k1) * (lit(oneMinusB) + lit(b) * col("dl") / col("avgdl")))).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Hybrid retrieval: BM25 text ranking ⊕ exact vector ranking for
    * the same query, fused by reciprocal-rank fusion
    * (Cormack et al. SIGIR'09: score = Σ 1/(κ + rank), κ = 60) — the
    * standard way modern search stacks combine lexical and semantic
    * recall without score calibration, since RRF consumes only RANKS.
    * doc_id ≡ vec_id joins the two modalities of the same corpus (the
    * dedup_hybrid precedent).
    *
    * Scale shape: each leg is the already-scale-shaped operator (BM25
    * broadcast stats, ANN broadcast query + bounded heap); fusion
    * touches 2k rows — the rank windows run AFTER each leg's LIMIT k,
    * so the unpartitioned window sorts k rows, not the corpus. Missing
    * membership in one leg contributes 0, the paper's convention.
    * Returns the top-k (doc_id, r_text, r_vec, rrf). */
  def hybridRrf(docs: DataFrame, emb: DataFrame, query: Seq[String],
                qVecId: Long, k: Int = 20, kappa: Int = 60,
                textCol: String = "text", idCol: String = "doc_id",
                vecCol: String = "embedding", vecIdCol: String = "vec_id"): DataFrame = {
    val t = bm25TopK(docs, query, k, textCol = textCol, idCol = idCol)
      .select(col("doc_id"), row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id")))
        .cast("long").as("r_text"))
    val v = Similarity.bruteForceTopK(
        emb.where(col(vecIdCol) === qVecId), emb, k, vecCol, vecIdCol)
      .select(col("c_id").as("doc_id"), col("rank").cast("long").as("r_vec"))
    t.join(v, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_text"), col("r_vec"),
        round(coalesce(lit(1.0) / (lit(kappa) + col("r_text")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(kappa) + col("r_vec")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }
}
