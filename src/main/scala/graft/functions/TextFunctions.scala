package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (L8-L11), all
  * Column combinators over codegen'd built-ins (plus the custom
  * Catalyst signature expressions registered by GraftExtensions) —
  * per-row, shuffle-free, whole-stage-codegen-friendly except the
  * higher-order lambdas, which still run as compiled JVM expressions.
  *
  * At 100 TB every one of these rides the parquet scan: compute cost
  * scales with bytes read, network cost is zero.
  */
object TextFunctions {

  /** Whitespace tokenization, empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** L10: whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer: letter runs, single digits, single
    * non-alphanumeric marks — the GPT-2-style pre-split shape. */
  val BpePattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"

  /** L10: BPE-ish token count. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Sliding word n-gram shingles as strings; docs shorter than n
    * collapse to one whole-doc shingle so every doc shingles. */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array(concat_ws(" ", t)))
  }

  // ---- L9 quality components ----------------------------------------

  /** Ratio of punctuation/symbol chars to all chars. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))
        .cast("double") / length(text))
      .otherwise(0.0)

  /** Ratio of tokens that are stopwords of `stopwords`. Prefer the
    * FromTokens variant over a pre-projected token column when
    * combining several token statistics — a raw-text argument re-runs
    * tokenization per statistic (HOFs are interpreted, no CSE). */
  def stopwordRatioFromTokens(t: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    when(size(t) > 0,
      size(filter(t, tok => array_contains(sw, lower(tok)))).cast("double") / size(t))
      .otherwise(0.0)
  }

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordRatioFromTokens(tokens(text), stopwords)

  /** 1 - distinct/total tokens: 0 = no repetition, →1 = degenerate. */
  def repetitionRatioFromTokens(t: Column): Column =
    when(size(t) > 0,
      lit(1.0) - size(array_distinct(t)).cast("double") / size(t))
      .otherwise(0.0)

  def repetitionRatio(text: Column): Column =
    repetitionRatioFromTokens(tokens(text))

  /** L9: composite quality score in [0,1]: long enough, low punct,
    * some stopwords (natural language signal), low repetition. The
    * component weights are heuristic; the components themselves are
    * the standard pre-training quality signals (length / punctuation /
    * stopword density / repetition). */
  def qualityScore(text: Column, stopwords: Seq[String] = Stopwords.en): Column = {
    val lengthOk = least(tokenCount(text).cast("double") / 20.0, lit(1.0))
    val punctOk = greatest(lit(1.0) - punctRatio(text) * 4.0, lit(0.0))
    val stopOk = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    val repOk = greatest(lit(1.0) - repetitionRatio(text) * 1.25, lit(0.0))
    round(lengthOk * 0.25 + punctOk * 0.25 + stopOk * 0.2 + repOk * 0.3, 6)
  }

  // ---- scrubbing / normalization -------------------------------------

  /** Conservative RE2-compatible patterns (no backrefs, no lookaround)
    * so the same regex means the same thing in any engine a pipeline
    * pairs this one with. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  val NumberPattern = "[0-9]+"

  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** PII-style scrubbing: URLs, then emails, then digit runs are
    * replaced with typed placeholder tokens. Order matters — URLs can
    * contain @ and digits, so they must be rewritten first. Pure
    * per-row expression: rides the scan, zero shuffle. */
  def scrubText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPattern, "<URL>"),
        EmailPattern, "<EMAIL>"),
      NumberPattern, "<NUM>")

  /** Canonical text normalization: lowercase, collapse whitespace
    * runs to single spaces, trim — the usual pre-dedup normalizer. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  // ---- L8 language id ------------------------------------------------

  /** Tiny per-language stopword profiles (public common-word lists).
    * Small on purpose: language id at pipeline scale is a profile
    * intersection, not a model. */
  object Stopwords {
    val en = Seq("the", "a", "an", "and", "of", "to", "in", "is", "that", "it", "for", "was")
    val de = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von")
    val fr = Seq("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans", "qui", "pas")
    val es = Seq("el", "los", "las", "y", "es", "en", "una", "por", "con", "para", "del", "se")
    val zh = Seq("的", "是", "在", "了", "我", "有", "和", "不", "人", "这", "中", "大")
    val all: Seq[(String, Seq[String])] =
      Seq("en" -> en, "de" -> de, "fr" -> fr, "es" -> es, "zh" -> zh)
  }

  /** L8 over a pre-projected token column: scores each language by
    * stopword hits; highest score wins, ties break toward the
    * lexicographically greatest code (deterministic), zero hits →
    * "und". Pass a plain column ref for `t` (see langId) so the token
    * array is computed once, not once per language. */
  def langIdFromTokens(t: Column): Column = {
    val scored = array(Stopwords.all.map { case (lang, words) =>
      val sw = array(words.map(lit): _*)
      struct(
        size(filter(t, tok => array_contains(sw, lower(tok)))).as("score"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_max(scored)
    when(best.getField("score") <= 0, lit("und"))
      .otherwise(best.getField("lang"))
  }

  /** L8: n-gram/stopword-profile language id. Convenience form; for
    * hot paths project `tokens(text)` once and use langIdFromTokens. */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** L8 fused: one-pass hash-probe language id (see LangIdKernel) —
    * same scoring/tie rule as langId, ASCII-only lowercasing. */
  def langIdText(text: Column): Column = call_function("graft_langid", text)

  // ---- L11 fingerprint ------------------------------------------------

  /** L11: winnowing fingerprint set (k-gram size, window w) — see
    * WinnowFingerprintText for the guarantee. Fused single-pass form;
    * `fingerprintTokens` is the array-input equivalent (identical
    * output on split(text) tokens). */
  def fingerprint(text: Column, k: Int = 5, w: Int = 4): Column =
    call_function("graft_fingerprint_text", text, lit(k), lit(w))

  def fingerprintTokens(toks: Column, k: Int = 5, w: Int = 4): Column =
    call_function("graft_fingerprint", toks, lit(k), lit(w))

  // ---- signature wrappers (dedup/similarity building blocks) ---------

  /** Fused sorted-distinct shingle hashes (64-bit) straight from
    * text — array_distinct(wordShingles(text, n)) with hashes standing
    * in for the strings; one imperative pass, no intermediate arrays.
    * The decontamination probe's join-key material. */
  def shingleHashes(text: Column, n: Int): Column =
    call_function("graft_shingles", text, lit(n))

  /** Fused distinct shingle STRINGS straight from text — the exact
    * value of array_distinct(wordShingles(text, n)) without the
    * interpreted HOF chain. Use where the strings themselves matter
    * (exact-Jaccard verification, oracle-reproducible output);
    * shingleHashes is the cheaper form when 64-bit ids suffice. */
  def distinctWordShingles(text: Column, n: Int): Column =
    call_function("graft_word_shingles", text, lit(n))

  def minhash(shingles: Column, numHashes: Int): Column =
    call_function("graft_minhash", shingles, lit(numHashes))

  /** Fused tokenize+shingle+minhash over raw text — the hot-path form
    * (one imperative pass, no intermediate arrays). */
  def minhashText(text: Column, shingleSize: Int, numHashes: Int): Column =
    call_function("graft_minhash_text", text, lit(shingleSize), lit(numHashes))

  def simhash(tokens: Column): Column =
    call_function("graft_simhash", tokens)

  /** Fused tokenize+simhash over raw text; bit-identical to
    * simhash(tokens(text)). */
  def simhashText(text: Column): Column =
    call_function("graft_simhash_text", text)

  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  def topk(id: Column, score: Column, k: Int): Column =
    call_function("graft_topk", id, score, lit(k))
}
