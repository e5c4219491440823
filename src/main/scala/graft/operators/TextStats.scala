package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-level repetition signals (the Gopher/RefinedWeb-style
  * quality rules over per-n-gram counts).
  *
  * Scale shape: these are PER-DOCUMENT statistics, so they must never
  * shuffle — the n-gram counts a doc needs all live in its own row.
  * `graft_repetition` is a fused single-pass kernel (tokenize → gram
  * hashes → sort → run lengths) riding the scan inside whole-stage
  * codegen. Two earlier forms earned their replacement at sf0.1:
  * explode + per-(doc, gram) aggregation shuffled rows × grams for
  * numbers that never leave the row (4.4s), and a HOF
  * `aggregate(array_sort(...))` fold stayed row-local but allocated
  * an interpreted struct per element (15s). The kernel runs in 0.3s
  * and at 100 TB keeps the operator a pure scan.
  */
object TextStats {

  /** Per-document n-gram repetition: `top_frac` = share of the doc's
    * n-gram occurrences taken by its single most frequent n-gram,
    * `dup_frac` = share of occurrences beyond each gram's first
    * (1 - distinct/total). High values of either flag boilerplate /
    * template/spam docs for the quality filter. */
  def ngramRepetition(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", n: Int = 2): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        call_function("graft_repetition", col(textCol), lit(n)).as("__r"))
      .select(col("doc_id"), col("__r.total").as("total"),
        round(col("__r.top").cast("double") / col("__r.total"), 4).as("top_frac"),
        round(lit(1.0) - col("__r.dist").cast("double") / col("__r.total"), 4).as("dup_frac"))

  /** TF-IDF top-k keyword extraction per document — the corpus-level
    * text statistic (unlike the per-row signals above, term rarity is
    * a property of the WHOLE corpus, so this one genuinely shuffles).
    *
    * idf is the log-free (N+1)/(df+1) variant: `ln` differs by ulps
    * across libm implementations, and a ulp is enough to flip a
    * row_number tie — rational arithmetic makes the DuckDB twin
    * bit-identical. Monotone in df either way, so the top-k set is
    * the standard one.
    *
    * Scale shape: one exchange keyed (doc, term) for tf, one keyed
    * term for df (both map-side combined), the tf⋈df equi-join on
    * term, then a window keyed doc_id. The per-doc top-k via window
    * is safe here because a partition is one document's distinct
    * terms — bounded by doc length, never corpus-sized; N rides in as
    * a broadcast single-row aggregate so the plan stays fully lazy. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).cast("double").as("__n"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(total))
      .withColumn("score",
        col("tf").cast("double") * ((col("__n") + 1.0) / (col("df").cast("double") + 1.0)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), round(col("score"), 4).as("score"))
  }

  /** Top-k bigram collocations by PMI (pointwise mutual information) —
    * the corpus-level phrase miner ("new york" scores high because its
    * parts rarely occur apart). Bigrams come from arrays_zip over the
    * token array (builtin codegen'd slices — no custom kernel, no
    * per-pair HOF), docs shorter than 2 tokens contribute none.
    *
    * RANKING is on the rational lift (c_ab/B)/((c_a/T)(c_b/T)) — the
    * same IEEE division sequence in both engines — and only the
    * REPORTED pmi applies ln(lift), so libm ulp drift can't flip
    * the order. minCount guards the classic PMI pathology (hapax
    * pairs score highest).
    *
    * Scale shape: two map-side-combined exchanges (unigram, bigram
    * counts), two vocab-sized equi-joins on the component terms,
    * totals ride in as one broadcast row, and the final top-k is
    * TakeOrderedAndProject — k rows to the driver, never a full sort. */
  def collocations(docs: DataFrame, minCount: Long = 5, k: Int = 20,
                   textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      graft.functions.TextFunctions.tokens(lower(col(textCol))).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
    val ucnt = uni.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bg = toks.where(size(col("t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1))).as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
    val bcnt = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .where(col("cb") >= minCount)
    val totals = uni.agg(count(lit(1)).cast("double").as("__t"))
      .crossJoin(bg.agg(count(lit(1)).cast("double").as("__b")))
    bcnt
      .join(ucnt.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(ucnt.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("lift",
        (col("cb").cast("double") / col("__b")) /
          ((col("c1").cast("double") / col("__t")) * (col("c2").cast("double") / col("__t"))))
      .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"),
        col("cb").as("n"), col("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(k)
      .select(col("bigram"), col("n"), round(log(col("lift")), 4).as("pmi"))
  }

  /** Unigram language-model score — mean negative log-likelihood of
    * each document's tokens under the corpus unigram distribution
    * (the cheap stand-in for a perplexity quality filter: templated /
    * common-token docs score low, rare-token gibberish scores high).
    *
    * Scale shape: the vocabulary (term, count) is corpus-bounded and
    * joins back to the token stream on term — broadcastable for real
    * vocabularies (AQE decides); per-doc mean is one exchange keyed
    * doc_id. Total token count rides in as a broadcast scalar. */
  def unigramLogLoss(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("term"))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).cast("double").as("__t"))
    toks.join(vocab, "term")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("cnt").cast("double") / col("__t"))), 4).as("avg_nll"))
  }

  /** Bigram conditional language-model score — mean negative
    * log-likelihood of each document's bigrams under the corpus MLE
    * conditional p(w2 | w1) = c(w1 w2) / c_ctx(w1), where c_ctx counts
    * w1's occurrences as a bigram left context. The
    * order-sensitive upgrade of `unigramLogLoss`: token-salad that
    * fools the unigram filter (right words, wrong order) scores high
    * here. Scored on the same corpus the counts come from, every
    * bigram has count ≥ 1, so MLE needs no smoothing and the oracle
    * stays parameter-free. Docs with fewer than 2 tokens have no
    * bigrams and score 0 over 0 bigrams.
    *
    * Scale shape: the bigram stream is scan-resident (slice+zip, no
    * position explode); bigram and context counts are two map-side-
    * combined exchanges over corpus-bounded vocabularies that join
    * back broadcastable (AQE decides); the per-doc mean is one
    * doc-keyed exchange. */
  def bigramLogLoss(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val t = docs.select(col(idCol).cast("long").as("doc_id"),
      graft.functions.TextFunctions.tokens(lower(col(textCol))).as("__t"))
    val bg = t.where(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - 1),
        slice(col("__t"), lit(2), size(col("__t")) - 1))).as("p"))
      .select(col("doc_id"), col("p.0").as("w1"), col("p.1").as("w2"))
    val bcnt = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val ctx = bg.groupBy(col("w1")).agg(count(lit(1)).as("cctx"))
    val scored = bg.join(bcnt, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(col("cb").cast("double") / col("cctx"))), 4).as("avg_nll"))
    t.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_nll"), lit(0.0)).as("avg_nll"))
  }

  /** Per-document token unigram entropy (nats) and type-token ratio —
    * the vocabulary-diversity quality signal (low entropy or low TTR =
    * template/spam text). One fused `graft_entropy` pass riding the
    * scan: tokenize → sort token hashes → run lengths, zero shuffle,
    * same kernel discipline as `ngramRepetition`. */
  def tokenEntropy(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        call_function("graft_entropy", col(textCol)).as("e"))
      .select(col("doc_id"),
        col("e.total").as("n_toks"), col("e.dist").as("n_types"),
        round(col("e.ent"), 4).as("entropy"),
        round(col("e.dist").cast("double") / col("e.total"), 4).as("ttr"))

  /** The composed quality GATE of a pre-training pipeline — the
    * Gopher-style rule set applied as one operator, reported as a
    * per-(lang, source) funnel: how many documents each rule rejects
    * and how many survive every rule. This is the decision layer the
    * individual signals (tokenEntropy, ngramRepetition, text_quality)
    * feed; pipelines tune the thresholds per corpus, so they're
    * parameters, not constants.
    *
    * Rules (each an independent reject reason):
    *  - length: token count outside [minTokens, maxTokens];
    *  - repetition: the single most frequent 2-gram accounts for more
    *    than maxTopGramFrac of the doc's 2-gram occurrences
    *    (boilerplate/template signal, fused graft_repetition kernel);
    *  - stopwords: stopword ratio below minStopRatio (word-salad
    *    signal — natural language has function words);
    *  - punctuation: punctuation-to-character ratio above
    *    maxPunctRatio (markup/code signal).
    *
    * Scale shape: every signal is per-row inside the scan (fused
    * kernel or array expression over the shared token projection);
    * the only shuffle is the map-side-combined (lang, source) rollup
    * whose cardinality is languages × sources. */
  def qualityFunnel(docs: DataFrame,
                    minTokens: Long = 30, maxTokens: Long = 10000,
                    maxTopGramFrac: Double = 0.10,
                    minStopRatio: Double = 0.03,
                    maxPunctRatio: Double = 0.10,
                    textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    val sig = docs.where(col(textCol).isNotNull)
      .select(col("lang"), col("source"),
        TextFunctions.tokens(col(textCol)).as("__t"),
        TextFunctions.punctRatio(col(textCol)).as("__pr"),
        call_function("graft_repetition", col(textCol), lit(2)).as("__rep"))
      .select(col("lang"), col("source"), col("__pr"),
        size(col("__t")).cast("long").as("__tc"),
        TextFunctions.stopwordRatioFromTokens(col("__t"), TextFunctions.Stopwords.en).as("__sr"),
        (col("__rep.top").cast("double") / greatest(col("__rep.total"), lit(1L))).as("__tg"))
    val fLen = col("__tc") < minTokens || col("__tc") > maxTokens
    val fRep = col("__tg") > maxTopGramFrac
    val fStop = col("__sr") < minStopRatio
    val fPunct = col("__pr") > maxPunctRatio
    sig.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!fLen && !fRep && !fStop && !fPunct, 1L).otherwise(0L)).as("n_pass"),
        sum(when(fLen, 1L).otherwise(0L)).as("n_len"),
        sum(when(fRep, 1L).otherwise(0L)).as("n_rep"),
        sum(when(fStop, 1L).otherwise(0L)).as("n_stop"),
        sum(when(fPunct, 1L).otherwise(0L)).as("n_punct"))
  }

  /** X171: windowed skip-gram co-occurrence counts — the word2vec /
    * GloVe preprocessing pass: every (token, following-token-within-
    * `window`) pair counted corpus-wide, top-k by count. Pairs are
    * generated INSIDE the row with array HOFs (each position pairs
    * with its next `window` positions — the undirected-once
    * representation), so the scan emits ≤ window·tokens pair rows
    * straight into a map-side-combined count; the only shuffle keys
    * on the pair. Top-k is TakeOrderedAndProject — k rows move, no
    * full sort. Integer counts + lexicographic tiebreaks ⇒
    * engine-exact. */
  /** X184: code-vs-prose routing signals per document — the cheap
    * classifier a mixed crawl runs before tokenization, because code
    * wants different dedup keys, quality rules, and tokenizers than
    * prose (the StarCoder/CodeParrot-family heuristics). Three
    * character-class densities per row (symbol fraction, digit
    * fraction, code-punctuation per 100 chars) via
    * length-minus-stripped regex counts — each a codegen'd single
    * text pass, no shuffle anywhere (per-document statistics stay in
    * the row, same contract as the repetition kernel above). The
    * `is_code` call composes the unrounded densities so the rounded
    * projection can't flip it. */
  def codeRatio(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val n = length(t)
    val symbols = n - length(regexp_replace(t, "[^A-Za-z0-9\\s]", ""))
    val digits = n - length(regexp_replace(t, "[0-9]", ""))
    val codePunct = n - length(regexp_replace(t, "[{}()\\[\\];=<>]", ""))
    docs.where(t.isNotNull && length(t) > 0)
      .select(col(idCol).cast("long").as("doc_id"),
        round(symbols.cast("double") / n, 4).as("symbol_frac"),
        round(digits.cast("double") / n, 4).as("digit_frac"),
        round(lit(100.0) * codePunct / n, 4).as("code_punct_per_100"),
        (symbols.cast("double") / n >= 0.03 &&
          codePunct.cast("double") / n >= 0.01).as("is_code"))
  }

  /** X193: the published Gopher document-quality rules (Rae et al.
    * 2021, "Scaling Language Models: ... Gopher", App. A1.1) as
    * per-document signals + verdict — the reference ruleset curation
    * pipelines start from before tuning their own thresholds:
    *
    *  - word count within [minWords, maxWords];
    *  - mean word length within [3, 10];
    *  - ≥ 80% of words contain at least one alphabetic character;
    *  - ≥ 2 stop words from the canonical 8-word probe set
    *    (the, be, to, of, and, that, have, with);
    *  - symbol-to-word ratio (# or ellipsis) ≤ 0.1;
    *  - ≤ 90% of lines starting with a bullet, ≤ 30% ending in an
    *    ellipsis.
    *
    * Every signal is computed per-row inside the scan over ONE shared
    * token projection — no shuffle at all (the output is a column-add,
    * the 100 TB shape of any row-wise filter). `pass` is 0/1 so the
    * verdict aggregates cheaply downstream. */
  def gopherRules(docs: DataFrame, minWords: Long = 50,
                  maxWords: Long = 100000,
                  textCol: String = "text"): DataFrame = {
    val t = filter(split(col(textCol), "\\s+"), x => length(x) > 0)
    val lines = filter(split(col(textCol), "\n"), x => length(x) > 0)
    val probe = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val sig = docs.where(col(textCol).isNotNull)
      .select(col("doc_id"), col(textCol).as("__x"), t.as("__t"), lines.as("__l"))
      .select(col("doc_id"),
        size(col("__t")).cast("long").as("n_words"),
        aggregate(col("__t"), lit(0L), (a, x) => a + length(x)).as("__chars"),
        size(filter(col("__t"), x => x.rlike("[A-Za-z]"))).cast("long").as("__alpha"),
        size(filter(col("__t"),
          x => lower(x).isin(probe.map(lit): _*))).cast("long").as("n_stop"),
        ((length(col("__x")) - length(replace(col("__x"), lit("#"), lit("")))) +
          (length(col("__x")) - length(replace(col("__x"), lit("..."), lit("")))) / 3)
          .cast("long").as("__sym"),
        size(col("__l")).cast("long").as("__nl"),
        size(filter(col("__l"), l =>
          l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
          .cast("long").as("__bull"),
        size(filter(col("__l"), l => l.endsWith("..."))).cast("long").as("__ell"))
    val meanLen = col("__chars").cast("double") / greatest(col("n_words"), lit(1L))
    val fracAlpha = col("__alpha").cast("double") / greatest(col("n_words"), lit(1L))
    val symRatio = col("__sym").cast("double") / greatest(col("n_words"), lit(1L))
    val pass =
      col("n_words").between(minWords, maxWords) &&
        meanLen.between(3.0, 10.0) &&
        fracAlpha >= 0.8 &&
        col("n_stop") >= 2 &&
        symRatio <= 0.1 &&
        (col("__bull").cast("double") <= col("__nl") * 0.9) &&
        (col("__ell").cast("double") <= col("__nl") * 0.3)
    sig.select(col("doc_id"), col("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(fracAlpha, 4).as("frac_alpha"),
      col("n_stop"),
      round(symRatio, 4).as("sym_ratio"),
      when(pass, 1L).otherwise(0L).as("pass"))
      .orderBy(col("doc_id"))
  }

  /** X194: token-coverage curve — what fraction of all token
    * OCCURRENCES the k most frequent types cover, for a ladder of k.
    * The vocabulary-sizing readout every tokenizer/BPE plan starts
    * from (coverage@k is the complement of the OOV rate a k-entry
    * vocab would leave). Ties rank lexicographically so the curve is
    * deterministic.
    *
    * Scale: ONE map-side-combined shuffle on the token (cardinality =
    * vocabulary, not corpus); the ladder cut ranks only the top
    * max(ks) types (orderBy + limit — a bounded top-k, never a global
    * sort of the corpus) and the cumulative sum runs over those
    * ≤ max(ks) rows. Totals ride a broadcast single-row join. */
  def tokenCoverage(docs: DataFrame, ks: Seq[Int] = Seq(1, 10, 100, 1000),
                    textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kMax = ks.max
    val types = docs.where(col(textCol).isNotNull)
      .select(explode(filter(split(lower(col(textCol)), "\\s+"),
        x => length(x) > 0)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val totals = types.agg(sum(col("n")).as("total"),
      count(lit(1)).as("n_types"))
    // the global window is SAFE here: it ranks the ≤ kMax rows the
    // limit already cut, never the vocabulary (let alone the corpus)
    val top = types.orderBy(col("n").desc, col("tok")).limit(kMax)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n").desc, col("tok"))).cast("long"))
    // one pass over the ≤ kMax ranked types: each type row contributes
    // its count to every ladder rung at-or-above its rank
    val ksArr = array(ks.map(k => lit(k.toLong)): _*)
    val ladder = top
      .select(col("n"), explode(filter(ksArr, k => k >= col("rk"))).as("k"))
      .groupBy(col("k")).agg(sum(col("n")).as("cum_tokens"))
    ladder.crossJoin(broadcast(totals))
      .select(col("k"),
        least(col("cum_tokens"), col("total")).as("cum_tokens"),
        col("n_types"),
        round(col("cum_tokens").cast("double") / col("total"), 6).as("coverage"))
      .orderBy(col("k"))
  }

  /** X206: Zipf power-law fit over the corpus token frequency
    * spectrum — OLS of ln(count) on ln(rank) over the top `kTop`
    * types, the vocabulary-shape diagnostic (natural text sits near
    * slope −1; templated/synthetic corpora drift flat or steep) read
    * before sizing a tokenizer or spotting generation loops.
    *
    * The heavy half is exact and bounded: ONE vocabulary aggregation,
    * a (count DESC, token) top-`kTop` cut — after that only `kTop`
    * rows exist, so the ln/OLS sums run over a constant-size table at
    * any corpus size and the engines' summation wobble (~1e-14) dies
    * at round(4) (the text_entropy precedent). Returns one row:
    * (k, slope, intercept, r2). */
  def zipfFit(docs: DataFrame, kTop: Int = 64,
              textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val types = docs.where(col(textCol).isNotNull)
      .select(explode(filter(split(lower(col(textCol)), "\\s+"),
        x => length(x) > 0)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val top = types.orderBy(col("n").desc, col("tok")).limit(kTop)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n").desc, col("tok"))).cast("long"))
      .select(log(col("rk").cast("double")).as("x"),
        log(col("n").cast("double")).as("y"))
    top.agg(count(lit(1)).as("k"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("k"),
        round((col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")), 4).as("slope"),
        round((col("sy") - ((col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
          col("k"), 4).as("intercept"),
        round(((col("k") * col("sxy") - col("sx") * col("sy")) *
          (col("k") * col("sxy") - col("sx") * col("sy"))) /
          ((col("k") * col("sxx") - col("sx") * col("sx")) *
            (col("k") * col("syy") - col("sy") * col("sy"))), 4).as("r2"))
  }

  /** X207: feature-hashing vectorizer (the hashing trick, Weinberger
    * et al. 2009) — each document's tokens counted into `buckets`
    * hash buckets, the fixed-width featurization that needs NO
    * vocabulary pass (and therefore no vocabulary shuffle or
    * broadcast) at 100 TB.
    *
    * Bucket = value of one md5 hex digit (buckets ≤ 16), shared with
    * the twin via the same strpos arithmetic. The bucket histogram is
    * computed PER ROW with a higher-order fold inside the scan — zero
    * exchanges carry data; only the per-doc posexplode of a
    * `buckets`-wide count array leaves the stage. Returns (doc_id,
    * bucket, cnt) for non-empty buckets. */
  def featureHashing(docs: DataFrame, buckets: Int = 16,
                     textCol: String = "text"): DataFrame = {
    require(buckets >= 2 && buckets <= 16, "bucket = one hex digit")
    val toks = filter(split(lower(col(textCol)), "\\s+"), x => length(x) > 0)
    // md5 hex digit 8 → 0..15 → mod buckets; instr is 1-based so the
    // -1 recenters, matching the twin's strpos
    val bucketOf = (t: Column) =>
      pmod(instr(lit("0123456789abcdef"), substring(md5(t), 8, 1)) - 1,
        lit(buckets))
    // hash each token ONCE up front (transform), then fold integer
    // bucket ids — bucketOf inside the per-slot fold lambda would
    // recompute md5(token) `buckets` times per token (the r12 verdict's
    // 16x-redundant-hashing finding on this entry)
    // per-token md5 + fold is the whole cost and rides the scan stage
    // — spread a single-split scan (Parallelize.spreadScan)
    Parallelize.spreadScan(docs.where(col(textCol).isNotNull))
      .select(col("doc_id"),
        posexplode(aggregate(transform(toks, t => bucketOf(t)),
          array_repeat(lit(0L), buckets),
          (acc, b) => transform(acc, (c, i) =>
            when(b === i, c + 1L).otherwise(c))))
          .as(Seq("bucket", "cnt")))
      .where(col("cnt") > 0)
      .select(col("doc_id"), col("bucket").cast("long").as("bucket"),
        col("cnt"))
      .orderBy(col("doc_id"), col("bucket"))
  }

  /** X216: Flesch reading-ease readability (Flesch 1948) per document
    * — the classic complexity signal quality pipelines stack next to
    * the Gopher rules: low scores flag legalese/boilerplate, implausibly
    * high ones flag token soup. Syllables use the standard cheap
    * approximation (runs of vowels incl. y), sentences are
    * terminal-punctuation runs — both deliberately simple so the twin
    * is the SAME two regexes, not a hyphenation dictionary.
    *
    * Everything is per-row arithmetic inside the scan — three integer
    * counts per document; no shuffle exists in the plan except the
    * display sort. At 100 TB this is a pure map.
    *
    * Every reported ratio rounds through EXACT integer half-up
    * division (the ohlc avgPrice4 discipline), never `round(double)`:
    * the Flesch constants clear to integers (206.835·S·W − 1.015·W² −
    * 84.6·Syl·W... ×1000), and W/S rationals land exactly on the
    * half-grid often enough that engine double-rounding visibly
    * diverges (a ×100 multiply that IEEE-rounds onto .5 rounds up in
    * one engine and not the other — observed at sf0.1). */
  def readability(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = filter(split(col(textCol), "\\s+"), x => length(x) > 0)
    val syll = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0)))
    val sent = greatest(size(regexp_extract_all(col(textCol),
      lit("[.!?]+"), lit(0))), lit(1))
    // floor((num + den/2) / den) over POSITIVE longs via the exact
    // (x - x%d)/d form — trunc == floor on non-negatives, and the
    // final double divide is exact (a long multiple of d, < 2^53)
    def halfUp(num: Column, den: Column, pow10: Double): Column = {
      val x = num * 2 + den
      val d = den * 2
      ((x - x % d) / d).cast("long").cast("double") / pow10
    }
    val w = col("n_words"); val y = col("n_syllables")
    val s = col("n_sentences")
    // 1000 × Flesch numerator/denominator as exact longs (≤ 8.4e12 at
    // W,S ≤ 2e5 — far under 2^53)
    val fleschNum = lit(206835L) * s * w - lit(1015L) * w * w -
      lit(84600L) * y * s
    val fleschDen = lit(1000L) * s * w
    docs.where(col(textCol).isNotNull)
      .select(col("doc_id"), size(words).cast("long").as("n_words"),
        syll.cast("long").as("n_syllables"),
        sent.cast("long").as("n_sentences"))
      .where(col("n_words") > 0)
      .select(col("doc_id"), col("n_sentences"), col("n_words"),
        col("n_syllables"),
        halfUp(w * 10000L, s, 1e4).as("words_per_sentence"),
        halfUp(y * 10000L, w, 1e4).as("syllables_per_word"),
        // half-AWAY-from-zero on the signed Flesch ratio: half-up on
        // the magnitude, sign reapplied — identical CASE in the twin
        (when(fleschNum >= 0, halfUp(fleschNum * 100L, fleschDen, 1.0))
          .otherwise(-halfUp(-fleschNum * 100L, fleschDen, 1.0)) / 100.0)
          .as("flesch"))
      .orderBy(col("doc_id"))
  }

  def skipgrams(docs: DataFrame, window: Int = 2, k: Int = 20,
                textCol: String = "text"): DataFrame = {
    val t = graft.functions.TextFunctions.tokens(lower(col(textCol)))
    // ~window pairs per TOKEN: the explode+partial-agg stage is the
    // whole cost and must not run at the (possibly single-split) scan
    // parallelism — see Parallelize.spreadScan
    Parallelize.spreadScan(docs.where(col(textCol).isNotNull))
      .select(explode(flatten(transform(t, (tok, i) =>
        transform(slice(t, i + lit(2), lit(window)),
          ctx => struct(tok.as("a"), ctx.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(k)
  }
}
