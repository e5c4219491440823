package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016,
  * arXiv:1508.07909) — the tokenizer-training step of an LLM data
  * pipeline, run as a distributed computation: count words once over
  * the corpus, then iterate "count adjacent symbol pairs weighted by
  * word frequency → merge the most frequent pair everywhere" on the
  * VOCABULARY (distinct words), never re-touching the corpus.
  *
  * Scale shape: the only full-corpus pass is the word count (one
  * map-side-combined aggregation); every training iteration runs on
  * the distinct-word table — bounded by vocabulary size (millions at
  * web scale, never corpus-sized) — with one pair-keyed aggregation
  * whose argmax moves a SINGLE row to the driver per iteration.
  * Lineage is fenced per iteration like PageRank/CC.
  *
  * Determinism: counts are exact integers; ties break on
  * (count DESC, left, right) lexicographically, so every engine
  * learns the identical merge table.
  *
  * Representation: a word's symbol sequence is a string of
  * marker-wrapped symbols — "abc" → ␟a␟␟b␟␟c␟ — so applying merge
  * (l, r) is one `replace(s, ␟l␟␟r␟, ␟lr␟)`: left-to-right
  * non-overlapping replaceAll IS greedy BPE merge application, and
  * because each symbol's wrapper is self-contained, consecutive
  * matches never share a separator ([a,a,a,a] → [aa,aa], not
  * [aa,a,a]). The same trick makes the DuckDB oracle exact — a
  * sequential fold is NOT expressible there (list_reduce
  * miscomputes dependent lambdas; see q_sequence_count), but
  * replace() is engine-portable. No UDF anywhere; merges happen in
  * codegen'd string expressions.
  */
object Bpe {
  /** U+241F SYMBOL FOR UNIT SEPARATOR — never appears in corpus text. */
  val Marker = "␟"

  /** Encode a word column as marker-wrapped single-char symbols. */
  private def encode(word: org.apache.spark.sql.Column) =
    regexp_replace(word, "(.)", s"$Marker$$1$Marker")

  /** Learn `numMerges` BPE merges from `docs(textCol)`. Returns
    * (rank, left_sym, right_sym, merged, pair_count) ordered by rank —
    * the merge table a tokenizer would persist. */
  def trainMerges(docs: DataFrame, numMerges: Int = 10,
                  textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // one corpus pass: word -> total occurrences
    var vocab = Checkpoints.fence(
      Parallelize.spreadScan(docs.where(col(textCol).isNotNull))
        .select(explode(split(col(textCol), "\\s+")).as("w"))
        .where(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("wt"))
        .select(encode(col("w")).as("s"), col("wt")))

    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      // adjacent symbol pairs of every word, weighted by word count
      val syms = split(regexp_replace(col("s"), s"^$Marker|$Marker$$", ""), s"$Marker$Marker")
      val best = vocab
        .select(col("wt"), syms.as("a"))
        .where(size(col("a")) >= 2)
        .select(col("wt"), explode(
          zip_with(slice(col("a"), lit(1), size(col("a")) - 1),
                   slice(col("a"), lit(2), size(col("a")) - 1),
            (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val l: String = best(0).getString(0)
        val r: String = best(0).getString(1)
        val n: Long = best(0).getLong(2)
        learned += ((i + 1, l, r, l + r, n))
        vocab = Checkpoints.fence(vocab.select(
          replace(col("s"), lit(s"$Marker$l$Marker$Marker$r$Marker"),
            lit(s"$Marker$l$r$Marker")).as("s"),
          col("wt")))
      }
      i += 1
    }
    learned.toSeq.toDF("rank", "left_sym", "right_sym", "merged", "pair_count")
  }

  /** Encode the corpus with an already-learned merge table and count
    * the resulting tokens per document — the train-then-apply half of
    * the tokenizer pipeline (the compression-ratio QA signal: a merge
    * table learned on one corpus slice applied to another). The merge
    * list is rank-ordered and BOUNDED (it came from `trainMerges`'
    * single-row-per-iteration argmax), so it lands in the plan as a
    * chain of `numMerges` literal replace() calls — per-row, zero
    * shuffle, whole-stage codegen'd; the only exchange is the final
    * doc-keyed sum. Returns (doc_id, n_ws, n_bpe): whitespace-token
    * count vs post-merge symbol count. */
  def applyMerges(docs: DataFrame, merges: Seq[(String, String)],
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val enc0 = encode(col("w"))
    val encN = merges.foldLeft(enc0) { case (e, (l, r)) =>
      replace(e, lit(s"$Marker$l$Marker$Marker$r$Marker"), lit(s"$Marker$l$r$Marker"))
    }
    // per-word marker-encode + numMerges chained replaces are the
    // whole cost and explode word-wise — spread a single-split scan
    Parallelize.spreadScan(docs.where(col(textCol).isNotNull))
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .select(col(idCol),
        size(split(regexp_replace(encN, s"^$Marker|$Marker$$", ""), s"$Marker$Marker"))
          .cast("long").as("n_sym"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ws"), sum(col("n_sym")).as("n_bpe"))
  }

  /** Train on the corpus, then encode it — the driver-entry
    * composition of `trainMerges` + `applyMerges`. */
  def trainAndEncode(docs: DataFrame, numMerges: Int = 10,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val merges = trainMerges(docs, numMerges, textCol).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    applyMerges(docs, merges, textCol, idCol)
  }

  /** DuckDB twin of `trainAndEncode`: the training CTE chain, then
    * every word re-encoded through the learned merges — each b_i is a
    * single row, so the apply stage cross-joins them and nests
    * `numMerges` replace() calls, the same literal chain the Spark
    * plan runs. */
  def applyOracleSql(numMerges: Int = 10): String = {
    val m = Marker
    val applied = (1 to numMerges).foldLeft("e.s") { (acc, i) =>
      s"replace($acc, '$m' || b$i.l || '$m$m' || b$i.r || '$m', '$m' || b$i.l || b$i.r || '$m')"
    }
    val bJoins = (1 to numMerges).map(i => s"b$i").mkString(", ")
    s"""${trainCtes(numMerges)},
       |words AS (
       | SELECT doc_id, regexp_replace(w, '(.)', '$m\\1$m', 'g') AS s
       | FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
       |                     x -> len(x) > 0)) AS w
       |       FROM documents WHERE text IS NOT NULL)),
       |encoded AS (
       | SELECT e.doc_id,
       |  len(string_split(trim($applied, '$m'), '$m$m')) AS n_sym
       | FROM words e, $bJoins)
       |SELECT doc_id, count(*) AS n_ws, CAST(sum(n_sym) AS BIGINT) AS n_bpe
       |FROM encoded GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** The shared training CTE chain: v0 (encoded word counts) plus, per
    * iteration i, p_i (pair counts) → b_i (single-row argmax) → v_i
    * (merge applied). Recursive CTEs cannot carry the argmax join
    * portably, so the loop is unrolled — it is a FIXED, small merge
    * count by construction. Each b_i is TOTAL: when p_i is empty
    * (corpus exhausted before numMerges), a sentinel no-op merge row
    * ('', '', 0) keeps every downstream cross join populated — the
    * sentinel's replace pattern (three adjacent markers) cannot occur
    * in a marker-wrapped encoding, so v_i and the apply chain degrade
    * to identity, matching trainAndEncode's early stop. */
  private def trainCtes(numMerges: Int): String = {
    val m = Marker
    val sb = new StringBuilder
    // every CTE is MATERIALIZED: v_i is referenced by both p_{i+1} and
    // v_{i+1}, and b_i references p_i twice (argmax + the emptiness
    // probe) — inlining would re-expand the whole chain per reference
    // (exponential scans of `documents`); materialization makes each
    // stage compute once, like the Spark side's per-iteration fence
    sb.append(
      s"""WITH v0 AS MATERIALIZED (
         | SELECT regexp_replace(w, '(.)', '$m\\1$m', 'g') AS s, count(*) AS wt
         | FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
         |                     x -> len(x) > 0)) AS w
         |       FROM documents WHERE text IS NOT NULL)
         | GROUP BY 1)""".stripMargin)
    for (i <- 1 to numMerges) {
      val prev = s"v${i - 1}"
      sb.append(
        s""",
           |p$i AS MATERIALIZED (
           | SELECT a[j] AS l, a[j+1] AS r, sum(wt) AS n
           | FROM (SELECT wt, string_split(trim(s, '$m'), '$m$m') AS a FROM $prev),
           |      unnest(range(1, len(a))) AS t(j)
           | WHERE len(a) >= 2
           | GROUP BY 1, 2),
           |b$i AS MATERIALIZED (
           | (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1)
           | UNION ALL
           | (SELECT '' AS l, '' AS r, CAST(0 AS HUGEINT) AS n
           |  WHERE NOT EXISTS (SELECT 1 FROM p$i))),
           |v$i AS MATERIALIZED (
           | SELECT replace(s, '$m' || b.l || '$m$m' || b.r || '$m',
           |                   '$m' || b.l || b.r || '$m') AS s, wt
           | FROM $prev, b$i b)""".stripMargin)
    }
    sb.toString
  }

  /** The DuckDB twin of `trainMerges`: the training CTE chain, then
    * the b_i argmax rows unioned into the merge table. */
  def oracleSql(numMerges: Int = 10): String =
    trainCtes(numMerges) + "\n" + (1 to numMerges).map { i =>
      // n > 0 drops the exhaustion sentinel — mirrors trainMerges'
      // early stop emitting fewer than numMerges rows
      s"SELECT CAST($i AS BIGINT) AS rank, l AS left_sym, r AS right_sym, l || r AS merged, CAST(n AS BIGINT) AS pair_count FROM b$i WHERE n > 0"
    }.mkString("", "\nUNION ALL\n", "\nORDER BY rank")
}
