package graft

import graft.functions.expr.GraftHash

/** DuckDB SQL builders that reproduce the 64-bit wrapping-arithmetic
  * hash chains of SignatureKernels (FNV-1a token hashes, splitmix64,
  * the order-sensitive k-gram combine) so the signature-family
  * operators — dedup_minhash_lsh, dedup_simhash, text_fingerprint —
  * get full DuckDB hash oracles instead of rows-only checks.
  *
  * DuckDB has no wrapping 64-bit arithmetic, so the chains run in
  * UBIGINT with every overflow-capable step routed through HUGEINT
  * mod 2^64; multiplies by the two ~2^64 splitmix constants exceed
  * even HUGEINT (signed 128-bit) and use the 32-bit split
  * lo·lo + ((lo·hi + hi·lo mod 2^32) << 32). Two structural rules keep
  * the SQL tractable:
  *
  *  1. DuckDB expands lateral column aliases TEXTUALLY, so chaining
  *     splitmix stages inside one SELECT grows ~72× per stage
  *     (exponential — measured: 2 chained stages already take seconds
  *     to bind). Every splitmix application therefore gets its own
  *     MATERIALIZED CTE fence, with only bare column refs feeding the
  *     next stage.
  *  2. Lambda bodies can't use lateral aliases, so the one in-lambda
  *     splitmix (the short-doc whole-text fold) is fully inlined —
  *     bounded, because its input is the two lambda params.
  *
  * Signed-vs-unsigned: Spark compares signatures as SIGNED longs
  * (MinHash minima, winnowing window minima), so values re-sign via
  * HUGEINT before any min/ordering; band bucket keys only need
  * equality and group on the signed lists directly, replacing Spark's
  * xxhash64 bucket key with the slice itself (same partition of docs
  * into buckets, no 64-bit-hash reproduction needed).
  */
private[graft] object OracleHashSql {
  private val M64 = "18446744073709551616"
  private val Off = "14695981039346656037::UBIGINT"

  /** (a * c) mod 2^64 for a 64-bit constant c, via 32-bit split. */
  private def mulc(a: String, c: Long): String = {
    val bhi = java.lang.Long.toUnsignedString(c >>> 32)
    val blo = java.lang.Long.toUnsignedString(c & 0xffffffffL)
    s"(((($a) & 4294967295) * $blo)::HUGEINT + " +
      s"((((($a) >> 32) * $blo) % 4294967296 + " +
      s"((($a) & 4294967295) * $bhi) % 4294967296) % 4294967296)::HUGEINT" +
      s" * 4294967296) % $M64"
  }
  private def mulcU(a: String, c: Long): String = s"((${mulc(a, c)})::UBIGINT)"

  /** splitmix64 as a lateral-alias column chain (input expr `x` MUST be
    * trivial — bare columns only — see expansion note above); final
    * column is `{p}out`. */
  private def smCols(x: String, p: String): String =
    s"((($x)::HUGEINT + 11400714819323198485) % $M64)::UBIGINT AS ${p}a, " +
      s"xor(${p}a, ${p}a >> 30) AS ${p}b, " +
      s"${mulcU(p + "b", 0xbf58476d1ce4e5b9L)} AS ${p}c, " +
      s"xor(${p}c, ${p}c >> 27) AS ${p}d, " +
      s"${mulcU(p + "d", 0x94d049bb133111ebL)} AS ${p}e, " +
      s"xor(${p}e, ${p}e >> 31) AS ${p}out"

  /** Fully inlined splitmix64 for lambda bodies (keep `x` tiny). */
  private def smInline(x: String): String = {
    val s1 = s"((($x)::HUGEINT + 11400714819323198485) % $M64)::UBIGINT"
    val s2 = s"xor($s1, $s1 >> 30)"
    val s3 = mulcU(s2, 0xbf58476d1ce4e5b9L)
    val s4 = s"xor($s3, $s3 >> 27)"
    val s5 = mulcU(s4, 0x94d049bb133111ebL)
    s"xor($s5, $s5 >> 31)"
  }

  /** FNV-1a of each whitespace token (TextTokenizer.tokenHashes):
    * per-byte fold in a nested lambda. ord(substr) yields code points,
    * which equal bytes only for ASCII — the testdata corpus is verified
    * all-ASCII; a non-ASCII corpus would need a byte-level split. */
  private val tokh =
    "list_transform(list_filter(regexp_split_to_array(text, '\\s+'), tk -> len(tk) > 0), " +
      "tk -> list_reduce(list_prepend(14695981039346656037::UBIGINT, " +
      "list_transform(range(1, length(tk)+1), ci -> ord(substr(tk, ci, 1))::UBIGINT)), " +
      s"(fh, fb) -> ((xor(fh, fb)::HUGEINT * 1099511628211) % $M64)::UBIGINT))"

  /** Whole-doc combine fold over `hs` (the `tok.length < k` fallback of
    * gramHashes; empty list folds to the FNV offset). */
  private val foldAll =
    s"list_reduce(list_prepend($Off, hs), (ra, rh) -> ${smInline("xor(ra, rh)")})"

  /** UBIGINT -> signed BIGINT re-interpretation. */
  private def signed(v: String): String =
    s"(CASE WHEN ($v) >= 9223372036854775808 " +
      s"THEN (($v)::HUGEINT - $M64)::BIGINT ELSE ($v)::BIGINT END)"

  /** Token-hash rows: `th(id, hs)` + unnested `tr(id, ntok, h1, pos)`,
    * then `led` adding lead columns h2..hk, then the k-stage combine
    * chain cm1..cmk (gramHashes: acc = sm(acc ^ h_j), acc0 = FNV
    * offset). Returns (ctes, lastCte, gramCol). */
  private def gramCtes(src: String, k: Int, where: String): (Seq[String], String, String) = {
    val leads = (2 to k).map(j => s"lead(h1, ${j - 1}) OVER wd AS h$j").mkString(", ")
    val base = Seq(
      s"th AS MATERIALIZED (SELECT doc_id AS id, $tokh AS hs FROM $src$where)",
      s"tr AS (SELECT id, len(hs) AS ntok, unnest(hs) AS h1, " +
        s"unnest(range(1, len(hs)+1)) AS pos FROM th WHERE len(hs) >= $k)",
      s"led AS MATERIALIZED (SELECT id, ntok, pos, h1${if (k > 1) ", " + leads else ""} " +
        s"FROM tr WINDOW wd AS (PARTITION BY id ORDER BY pos))")
    val chain = (1 to k).map { j =>
      val acc = if (j == 1) Off else s"cc${j - 1}out"
      val srcCte = if (j == 1) "led" else s"cm${j - 1}"
      val carry = (Seq("id", "ntok", "pos") ++ (j + 1 to k).map(i => s"h$i")).mkString(", ")
      val flt = if (j == 1) s" WHERE pos <= ntok - ${k - 1}" else ""
      s"cm$j AS MATERIALIZED (SELECT $carry, ${smCols(s"xor($acc, h$j)", s"cc$j")} FROM $srcCte$flt)"
    }
    (base ++ chain, s"cm$k", s"cc${k}out")
  }

  /** The 3-gram distinct word-shingle sets of verifyJaccard (same text
    * as the dedup_snm / dedup_ngram_jaccard oracles). */
  private def shingleCtes(n: Int, src: String): Seq[String] = Seq(
    s"stoks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS t FROM $src)",
    s"shs AS (SELECT doc_id, CASE WHEN len(t) >= $n " +
      s"THEN list_distinct([array_to_string(t[i:i+${n - 1}], ' ') for i in range(1, len(t) - ${n - 2})]) " +
      s"ELSE [array_to_string(t, ' ')] END AS s FROM stoks)")

  /** text_fingerprint twin: winnowing (k-token grams, w-gram windows,
    * per-window SIGNED minima, distinct) summarized as
    * (doc_id, n_fp, fp_min, fp_max) — SignatureKernels
    * .fingerprintFromHashes, including the short-doc whole-text-fold
    * fallback (combine fold + final splitmix). */
  def fingerprintSql(src: String = "documents", k: Int = 5, w: Int = 4): String = {
    val (grams, last, gram) = gramCtes(src, k, "")
    val ctes = grams ++ Seq(
      s"win AS (SELECT id, pos, ntok - ${k - 1} AS ngrams, " +
        s"min(${signed(gram)}) OVER (PARTITION BY id ORDER BY pos " +
        s"ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS pick FROM $last)",
      s"picks AS (SELECT DISTINCT id, pick FROM win WHERE pos <= greatest(1, ngrams - ${w - 1}))",
      s"sd0 AS MATERIALIZED (SELECT id, $foldAll AS fv FROM th WHERE len(hs) < $k)",
      s"sd1 AS (SELECT id, ${smCols("fv", "sf")} FROM sd0)")
    "WITH " + ctes.mkString(",\n") +
      "\nSELECT id AS doc_id, count(*) AS n_fp, min(pick) AS fp_min, max(pick) AS fp_max" +
      " FROM picks GROUP BY id" +
      s"\nUNION ALL SELECT id, 1::BIGINT, ${signed("sfout")}, ${signed("sfout")} FROM sd1" +
      "\nORDER BY doc_id"
  }

  /** dedup_simhash twin: per-bit ±1 votes over token hashes, sign-bit
    * packing, pigeonhole banding ((maxHamming+1) bands of 64/bands
    * bits), 2..maxBucket bucket gate, exact XOR-popcount verify —
    * Dedup.simhashPairs end to end. */
  def simhashSql(src: String = "documents", maxHamming: Int = 3, maxBucket: Int = 200): String = {
    val bands = maxHamming + 1
    val bits = 64 / bands
    val bandSel = (0 until bands).map { j =>
      val lo = j * bits
      val width = if (j == bands - 1) 64 - lo else bits
      val mask = java.lang.Long.toUnsignedString(if (width >= 64) -1L else (1L << width) - 1L)
      s"SELECT id, $j AS band, (sim >> $lo) & $mask AS bhash FROM sims"
    }.mkString(" UNION ALL ")
    s"""WITH th AS MATERIALIZED (SELECT doc_id AS id, $tokh AS hs
  FROM $src WHERE text IS NOT NULL),
tr AS (SELECT id, unnest(hs) AS h FROM th),
votes AS (SELECT id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM tr CROSS JOIN (SELECT unnest(range(0, 64)) AS b) GROUP BY id, b),
sims AS MATERIALIZED (SELECT th.id,
  coalesce((SELECT sum(CASE WHEN v > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END)::UBIGINT
            FROM votes WHERE votes.id = th.id), 0::UBIGINT) AS sim FROM th),
banded AS ($bandSel),
bsz AS (SELECT band, bhash, count(*) AS n FROM banded GROUP BY band, bhash),
cand AS (SELECT DISTINCT a.id AS id1, b.id AS id2
  FROM banded a JOIN banded b ON a.band = b.band AND a.bhash = b.bhash AND a.id < b.id
  JOIN bsz s ON s.band = a.band AND s.bhash = a.bhash AND s.n <= $maxBucket)
SELECT c.id1, c.id2, bit_count(xor(x.sim, y.sim))::INTEGER AS hamming
FROM cand c JOIN sims x ON x.id = c.id1 JOIN sims y ON y.id = c.id2
WHERE bit_count(xor(x.sim, y.sim)) <= $maxHamming
ORDER BY id1, id2"""
  }

  /** dedup_minhash_lsh twin: fused MinHash signatures (min over grams
    * of splitmix64(gram ^ permSeed(j)), SIGNED minima), r-wide band
    * slices as bucket keys (grouping on the slice list itself in place
    * of Spark's xxhash64 of it — identical bucket partition), the
    * 2..maxBucket gate of graft_collect_capped, and the exact 3-gram
    * Jaccard verify at `threshold`, rounded to 4 places like the
    * entry. permSeed literals come from GraftHash itself, so the two
    * sides can never drift. */
  def minhashSql(src: String = "documents", threshold: Double = 0.8,
                 numHashes: Int = 128, bands: Int = 16,
                 shingleSize: Int = 3, maxBucket: Int = 100): String = {
    val r = numHashes / bands
    val seeds = (0 until numHashes).map(j =>
      s"($j, ${java.lang.Long.toUnsignedString(GraftHash.permSeed(j))}::UBIGINT)").mkString(", ")
    val (grams, last, gram) = gramCtes(src, shingleSize, " WHERE text IS NOT NULL")
    val jac = "CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / " +
      "(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)))"
    val ctes = grams ++ Seq(
      s"grams AS MATERIALIZED (SELECT DISTINCT id, $gram AS g FROM $last " +
        s"UNION SELECT id, $foldAll FROM th WHERE len(hs) < $shingleSize)",
      s"seeds(j, seed) AS (SELECT * FROM (VALUES $seeds))",
      s"sv AS MATERIALIZED (SELECT id, j, ${smCols("xor(g, seed)", "sv")} " +
        "FROM grams CROSS JOIN seeds)",
      s"sig AS (SELECT id, j, min(${signed("svout")}) AS mv FROM sv GROUP BY id, j)",
      s"sband AS MATERIALIZED (SELECT id, j // $r AS band, list(mv ORDER BY j) AS bkey " +
        s"FROM sig GROUP BY id, j // $r)",
      "bsz AS (SELECT band, bkey, count(*) AS n FROM sband GROUP BY band, bkey)",
      "cand AS (SELECT DISTINCT a.id AS id1, b.id AS id2 " +
        "FROM sband a JOIN sband b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id " +
        s"JOIN bsz s ON s.band = a.band AND s.bkey = a.bkey AND s.n <= $maxBucket)") ++
      shingleCtes(shingleSize, src)
    "WITH " + ctes.mkString(",\n") +
      s"""
SELECT c.id1, c.id2, round($jac, 4) AS jaccard
FROM cand c JOIN shs x ON x.doc_id = c.id1 JOIN shs y ON y.doc_id = c.id2
WHERE $jac >= $threshold
ORDER BY id1, id2"""
  }

  /** The minhash pair set closed into connected components — the same
    * HUGEINT signature chain as `minhashSql`, then the recursive
    * reachability closure (min label = component id) the
    * dedup_clusters twin uses. */
  def minhashClustersSql(src: String = "documents", threshold: Double = 0.8,
                         numHashes: Int = 128, bands: Int = 16,
                         shingleSize: Int = 3, maxBucket: Int = 100): String = {
    val r = numHashes / bands
    val seeds = (0 until numHashes).map(j =>
      s"($j, ${java.lang.Long.toUnsignedString(GraftHash.permSeed(j))}::UBIGINT)").mkString(", ")
    val (grams, last, gram) = gramCtes(src, shingleSize, " WHERE text IS NOT NULL")
    val jac = "CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / " +
      "(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)))"
    val ctes = grams ++ Seq(
      s"grams AS MATERIALIZED (SELECT DISTINCT id, $gram AS g FROM $last " +
        s"UNION SELECT id, $foldAll FROM th WHERE len(hs) < $shingleSize)",
      s"seeds(j, seed) AS (SELECT * FROM (VALUES $seeds))",
      s"sv AS MATERIALIZED (SELECT id, j, ${smCols("xor(g, seed)", "sv")} " +
        "FROM grams CROSS JOIN seeds)",
      s"sig AS (SELECT id, j, min(${signed("svout")}) AS mv FROM sv GROUP BY id, j)",
      s"sband AS MATERIALIZED (SELECT id, j // $r AS band, list(mv ORDER BY j) AS bkey " +
        s"FROM sig GROUP BY id, j // $r)",
      "bsz AS (SELECT band, bkey, count(*) AS n FROM sband GROUP BY band, bkey)",
      "cand AS (SELECT DISTINCT a.id AS id1, b.id AS id2 " +
        "FROM sband a JOIN sband b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id " +
        s"JOIN bsz s ON s.band = a.band AND s.bkey = a.bkey AND s.n <= $maxBucket)") ++
      shingleCtes(shingleSize, src)
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      s""",
pairs AS (
 SELECT c.id1, c.id2
 FROM cand c JOIN shs x ON x.doc_id = c.id1 JOIN shs y ON y.doc_id = c.id2
 WHERE $jac >= $threshold),
edges AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs),
reach(id, rr) AS (
 SELECT a, a FROM edges
 UNION
 SELECT reach.id, edges.b FROM reach JOIN edges ON reach.rr = edges.a),
comp AS (SELECT id, min(rr) AS component FROM reach GROUP BY id)
SELECT component, count(*) AS n_members,
 array_to_string(list_sort(list(id)), ',') AS members
FROM comp GROUP BY component ORDER BY component"""
  }
}
