package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Statistical-inference operators — the hypothesis-test / effect-size
  * layer a metrics pipeline runs AFTER the descriptive stats the
  * reference's numeric-stats DSL (src/main.rs:611-689 min/max/avg)
  * stops at: monotonic-trend detection, rank correlation, one-way
  * variance analysis, and categorical association.
  *
  * Shared determinism contract (the codebase-wide rule): every sum the
  * tests need is an exact integer/DECIMAL aggregate, so results are
  * independent of partition count and accumulation order; doubles
  * appear only in a FINAL fixed sequence of IEEE ops (divide, sqrt,
  * ln) that the DuckDB twins replay verbatim.
  *
  * Shared scale shape: each test first collapses the corpus with ONE
  * map-side-combined aggregation to a bounded summary (types × days,
  * langs, priorities, lang × source cells); everything after runs on
  * that summary, so pair joins and windows below are calendar- or
  * cardinality-bounded, never data-bounded.
  */
object Inference {

  private def dayCol = datediff(to_date(col("ts")), lit("2024-01-01"))

  /** X197: Mann–Kendall monotonic-trend test (Mann 1945, Kendall's S)
    * on each event type's daily count series — "is this metric
    * drifting?" asked the distribution-free way, the test monitoring
    * systems run before alerting on a slope.
    *
    * S = Σ_{i<j} sgn(x_j − x_i) over the day-ordered series: an exact
    * integer from a pair self-join of the DAILY table (≤ |days|²/2 ×
    * |types| rows — calendar-bounded, never data-bounded). The
    * tie-corrected variance rides the ×18 integer
    * 18·Var = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5) and Kendall's
    * tau-b denominator the ×2 integers D₀ = n(n−1)/2, T_x =
    * Σ t_g(t_g−1)/2 (days are distinct so the time axis has no tie
    * term). The continuity-corrected z and tau are the only doubles:
    * z = (S∓1)/√(var18/18), tau = S/√((D₀−T_x)·D₀), both round(4). */
  def mannKendallDaily(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy($"event_type", dayCol.as("day"))
      .agg(count(lit(1)).as("cnt"))
    val a = daily.as("a")
    val b = daily.as("b")
    val s = a.join(b,
        col("a.event_type") === col("b.event_type") &&
          col("a.day") < col("b.day"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(when(col("b.cnt") > col("a.cnt"), 1L)
        .when(col("b.cnt") < col("a.cnt"), -1L)
        .otherwise(0L)).as("s_stat"))
    val n = daily.groupBy($"event_type").agg(count(lit(1)).as("n"))
    val ties = daily.groupBy($"event_type", $"cnt")
      .agg(count(lit(1)).as("t"))
      .groupBy($"event_type")
      .agg(sum($"t" * ($"t" - 1) * (lit(2) * $"t" + 5)).as("tie3"),
        (sum($"t" * ($"t" - 1)) / 2).cast("long").as("tx"))
    val sigma = sqrt(col("var18").cast("double") / 18.0)
    s.join(broadcast(n), "event_type")
      .join(broadcast(ties), "event_type")
      .withColumn("var18",
        $"n" * ($"n" - 1) * (lit(2) * $"n" + 5) - $"tie3")
      .withColumn("d0", ($"n" * ($"n" - 1) / 2).cast("long"))
      .select($"event_type", $"n", $"s_stat", $"var18",
        round(when($"s_stat" > 0, ($"s_stat" - 1).cast("double") / sigma)
          .when($"s_stat" < 0, ($"s_stat" + 1).cast("double") / sigma)
          .otherwise(0.0), 4).as("z"),
        round($"s_stat".cast("double") /
          sqrt((($"d0" - $"tx") * $"d0").cast("double")), 4).as("tau"))
      .orderBy($"event_type")
  }

  /** X198: Spearman rank correlation between document length
    * (n_chars) and token count, per language — the monotonic-
    * association readout (is the char/token relationship stable per
    * lang, i.e. is n_chars a valid cheap proxy for token budget?).
    *
    * Tie-aware average ranks stay in INTEGER space as doubled ranks
    * r2 = 2·rank_min + (ties−1) = rank_min + rank_max (an integer even
    * when the average rank is .5); Pearson-on-ranks then needs only
    * the exact DECIMAL sums Σr2x, Σr2y, Σr2x², Σr2y², Σr2x·r2y (the
    * doubled-rank factor cancels). Final ρ = (nΣxy − ΣxΣy) /
    * (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) — two sqrts BEFORE the product so
    * each radicand stays within DECIMAL(38) for n ≤ ~3·10⁸ per group
    * (beyond that the radicand itself needs a wider type — documented
    * bound, far past any per-language daily batch).
    *
    * Plan: one scan computes both measures, two windows on the SAME
    * lang partition key (one exchange, two sorts), one tiny per-lang
    * aggregate. */
  def spearmanByLang(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir)
      .select($"lang", $"n_chars".cast("long").as("x"),
        size(filter(split($"text", "\\s+"), t => length(t) > 0))
          .cast("long").as("y"))
    val rx = rank().over(Window.partitionBy($"lang").orderBy($"x"))
    val ry = rank().over(Window.partitionBy($"lang").orderBy($"y"))
    val cx = count(lit(1)).over(Window.partitionBy($"lang", $"x"))
    val cy = count(lit(1)).over(Window.partitionBy($"lang", $"y"))
    val ranked = base
      .withColumn("r2x", (lit(2) * rx + cx - 1).cast("decimal(38,0)"))
      .withColumn("r2y", (lit(2) * ry + cy - 1).cast("decimal(38,0)"))
    ranked.groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        sum($"r2x").as("sx"), sum($"r2y").as("sy"),
        sum($"r2x" * $"r2x").as("sxx"), sum($"r2y" * $"r2y").as("syy"),
        sum($"r2x" * $"r2y").as("sxy"))
      .select($"lang", $"n",
        round(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
            sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double"))), 6)
          .as("rho"))
      .orderBy($"lang")
  }

  /** The five TPC-H order priorities — the ANOVA's group universe is
    * pinned so the cross-group double fold below has a DEFINED length
    * and order on both engines. */
  private[graft] val priorities = Seq(
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** X199: one-way ANOVA F-test of order value across the five order
    * priorities — "does this categorical segmentation explain any
    * variance?", the gate before investing in per-segment models.
    *
    * Everything data-sized is exact: per-group n_g, S_g = Σcents,
    * Q_g = Σcents² as DECIMAL(38,0) from ONE map-side-combined
    * aggregation. The cross-group combine is 5 rows, and runs as a
    * FIXED left-assoc double fold over the priority-sorted group
    * array (the embed_abtt/q_anova pattern): SSW = Σ_g (n_g·Q_g −
    * S_g²)/n_g and ΣS_g²/n_g accumulate in priority order — the
    * DuckDB twin spells the same ((((t₁+t₂)+t₃)+t₄)+t₅) sequence —
    * then SSB = ΣS_g²/n_g − S²/N, F = (SSB/(k−1))/(SSW/(N−k)).
    * Sums are reported in dollars² (÷10⁴, one exact-sequence divide)
    * at 4 dp; η² = SSB/(SSB+SSW) at 6 dp. */
  def anovaPriority(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cents = ($"o_totalprice".cast("decimal(18,2)") * 100)
      .cast("decimal(38,0)")
    val groups = Tables.orders(spark, sfDir)
      .where($"o_orderpriority".isin(priorities: _*))
      .select($"o_orderpriority".as("prio"), cents.as("c"))
      .groupBy($"prio")
      .agg(count(lit(1)).as("ng"), sum($"c").as("sg"),
        sum($"c" * $"c").as("qg"))
    groups
      .groupBy()
      .agg(sort_array(collect_list(struct($"prio", $"ng", $"sg", $"qg")))
        .as("gs"),
        count(lit(1)).as("k"), sum($"ng").as("n"),
        sum($"sg").as("s"))
      .withColumn("acc", expr(
        """aggregate(gs,
          |  struct(cast(0.0 as double) AS ssw, cast(0.0 as double) AS sb),
          |  (a, g) -> struct(
          |    a.ssw + cast(g.ng * g.qg - g.sg * g.sg as double)
          |            / cast(g.ng as double) AS ssw,
          |    a.sb + cast(g.sg * g.sg as double)
          |           / cast(g.ng as double) AS sb))""".stripMargin))
      .withColumn("ssw", $"acc.ssw" / 1.0e4)
      .withColumn("ssb",
        ($"acc.sb" - ($"s" * $"s").cast("double") / $"n".cast("double"))
          / 1.0e4)
      .select($"k", $"n",
        round($"ssb", 4).as("ssb"), round($"ssw", 4).as("ssw"),
        round(($"ssb" / ($"k" - 1).cast("double")) /
          ($"ssw" / ($"n" - $"k").cast("double")), 4).as("f_stat"),
        round($"ssb" / ($"ssb" + $"ssw"), 6).as("eta_sq"))
  }

  /** X200: pointwise mutual information between document language and
    * source — the categorical-association table ("does src7 skew
    * French?") a mixture designer reads before reweighting sources;
    * summed, the mi_millinat column IS the lang↔source mutual
    * information.
    *
    * One aggregation collapses the corpus to |lang|×|source| cells;
    * marginals are window sums over that bounded cell table (the
    * windows run on ≤ a few hundred rows at ANY corpus size). Counts
    * are exact; each cell's doubles are one fixed sequence — pmi =
    * ln((n·c_xy)/(c_x·c_y)) from exact-integer operands, mi_millinat
    * = 1000·(c_xy/n)·pmi — with no cross-cell float accumulation
    * anywhere, so there is no summation order to disagree on. */
  def mutualInfoCells(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.documents(spark, sfDir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("c_xy"))
    val cX = sum($"c_xy").over(Window.partitionBy($"lang"))
    val cY = sum($"c_xy").over(Window.partitionBy($"source"))
    val nTot = sum($"c_xy").over(Window.partitionBy())
    val withMargins = cells
      .select($"lang", $"source", $"c_xy",
        cX.as("c_x"), cY.as("c_y"), nTot.as("n"))
    val pmi = log(($"n" * $"c_xy").cast("double") /
      ($"c_x" * $"c_y").cast("double"))
    withMargins
      .select($"lang", $"source", $"c_xy", $"c_x", $"c_y",
        round(pmi, 4).as("pmi"),
        round(lit(1000.0) * ($"c_xy".cast("double") / $"n".cast("double"))
          * pmi, 4).as("mi_millinat"))
      .orderBy($"lang", $"source")
  }

  /** X211: Welch's unequal-variance t-test (Welch 1947) of event value
    * between two event types — "do purchases carry different value
    * than clicks?", the two-sample comparison run before any
    * segmentation ships. Welch rather than Student: real pipeline
    * segments never share a variance.
    *
    * Values quantize exactly to cents (the generator's 2-dp grid), so
    * n, S = Σc, Q = Σc² are exact DECIMAL(38) from ONE map-side
    * aggregation over only the two filtered types. The 2-row combine
    * is a fixed sequence of IEEE ops the twin replays verbatim:
    * mean_i = S_i/n_i, var_i = (n_i·Q_i − S_i²)/(n_i·(n_i−1))
    * (exact-integer numerator), se1 = var1/n1, se2 = var2/n2,
    * t = (mean1 − mean2)/√(se1+se2), and Welch–Satterthwaite
    * df = (se1+se2)²/(se1²/(n1−1) + se2²/(n2−1)). Means report in
    * dollars at 4 dp; t and df at 4 dp. */
  def welchTTest(spark: SparkSession, sfDir: String,
                 typeA: String = "purchase",
                 typeB: String = "click"): DataFrame = {
    import spark.implicits._
    val cents = round($"value" * 100).cast("decimal(38,0)")
    val g = Tables.events(spark, sfDir)
      .where($"event_type".isin(typeA, typeB) && $"value".isNotNull)
      .select($"event_type", cents.as("c"))
      .groupBy($"event_type")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum($"c").as("s"), sum($"c" * $"c").as("q"))
    def side(t: String, c: Column) =
      max(when($"event_type" === t, c))
    val one = g.agg(
      side(typeA, $"n").as("n1"), side(typeA, $"s").as("s1"),
      side(typeA, $"q").as("q1"),
      side(typeB, $"n").as("n2"), side(typeB, $"s").as("s2"),
      side(typeB, $"q").as("q2"))
    def mean(s: Column, n: Column) = s.cast("double") / n.cast("double")
    def variance(n: Column, s: Column, q: Column) =
      (n * q - s * s).cast("double") /
        (n * (n - 1)).cast("double")
    val v1 = variance($"n1", $"s1", $"q1")
    val v2 = variance($"n2", $"s2", $"q2")
    val se1 = v1 / $"n1".cast("double")
    val se2 = v2 / $"n2".cast("double")
    val tStat = (mean($"s1", $"n1") - mean($"s2", $"n2")) / sqrt(se1 + se2)
    // explicit x*x, never pow(x,2): both engines' pow routes through
    // libm and may differ in the last ulp; multiplication cannot
    val dfW = ((se1 + se2) * (se1 + se2)) /
      ((se1 * se1) / ($"n1" - 1).cast("double") +
        (se2 * se2) / ($"n2" - 1).cast("double"))
    one.select(
      lit(typeA).as("type_a"), lit(typeB).as("type_b"),
      $"n1".cast("long").as("n_a"), $"n2".cast("long").as("n_b"),
      round(mean($"s1", $"n1") / 100.0, 4).as("mean_a"),
      round(mean($"s2", $"n2") / 100.0, 4).as("mean_b"),
      round(tStat, 4).as("t_stat"), round(dfW, 4).as("df"))
  }

  /** X212: Cramér's V association strength for the lang×source
    * contingency table — the [0,1]-normalized effect size the raw χ²
    * (X128 reports cells) can't give because χ² grows with n; THE
    * number a mixture designer quotes for "how coupled are language
    * and source in this corpus?".
    *
    * Per-cell χ² terms clear denominators first —
    * (n·c_xy − c_x·c_y)²/(n·c_x·c_y) — so each term is ONE double
    * divide of exact integers (deterministic), then quantizes to the
    * 10⁻⁶ grid and sums as exact LONGS: the cross-cell accumulation
    * is integer, so no float summation order exists to disagree on
    * (the mi_millinat discipline). V = √(χ²/(n·(min(r,c)−1))) and the
    * bias-corrected V (Bergsma 2013) are the only trailing doubles.
    * The cell table is |lang|×|source| — metadata-sized at any corpus
    * size — and everything after the one corpus aggregation runs on
    * it. */
  def cramersV(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.documents(spark, sfDir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).cast("decimal(38,0)").as("c_xy"))
    val cX = sum($"c_xy").over(Window.partitionBy($"lang"))
    val cY = sum($"c_xy").over(Window.partitionBy($"source"))
    val nTot = sum($"c_xy").over(Window.partitionBy())
    val num = ($"n" * $"c_xy" - $"c_x" * $"c_y").cast("double")
    val term = (num * num) / ($"n" * $"c_x" * $"c_y").cast("double")
    val folded = cells
      .select($"lang", $"source", $"c_xy",
        cX.as("c_x"), cY.as("c_y"), nTot.as("n"))
      .select($"n", $"lang", $"source",
        round(term * 1e6).cast("long").as("t6"))
      // collect_set, not countDistinct: two distinct-counts in one
      // aggregate plan an Expand (the lint-banned shape); the sets are
      // |lang|/|source|-bounded, so O(k) state is metadata-sized
      .agg(max($"n").as("n"), sum($"t6").as("chi2_6"),
        size(collect_set($"lang")).cast("long").as("r"),
        size(collect_set($"source")).cast("long").as("c"))
    val chi2 = $"chi2_6".cast("double") / 1e6
    val kMin = least($"r", $"c").cast("double")
    folded.select(
      $"n".cast("long").as("n"), $"r", $"c",
      round(chi2, 4).as("chi2"),
      round(sqrt(chi2 / ($"n".cast("double") * (kMin - 1.0))), 4).as("v"))
  }

  /** X227: weight-of-evidence / information value (the credit-scoring
    * predictive-power readout; Siddiqi 2006) of order priority
    * predicting high-value orders (total ≥ the fixed 250k threshold).
    *
    * Per bin: pos/neg are exact LONG counts from ONE map-side
    * aggregation; rates, WOE = ln(rp/rn) and iv_term = (rp−rn)·WOE are
    * a FIXED per-row IEEE sequence from those integers and the two
    * broadcast totals (never a float re-aggregation — the twin replays
    * the identical sequence). Bins with an empty side drop (WOE is
    * undefined there); no total row, so no cross-bin float fold
    * exists. Scale: corpus → |priorities| rows map-side, totals are a
    * 1-row broadcast back. */
  def woeIv(spark: SparkSession, sfDir: String,
            threshold: Double = 250000.0): DataFrame = {
    import spark.implicits._
    val bins = Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority".as("priority"))
      .agg(sum(when($"o_totalprice" >= threshold, 1L).otherwise(0L))
        .as("pos"),
        sum(when($"o_totalprice" < threshold, 1L).otherwise(0L)).as("neg"))
      .where($"pos" > 0 && $"neg" > 0)
    val tot = bins.agg(sum($"pos").as("tp"), sum($"neg").as("tn"))
    val rp = $"pos".cast("double") / $"tp".cast("double")
    val rn = $"neg".cast("double") / $"tn".cast("double")
    val woe = log(rp / rn)
    bins.crossJoin(tot)
      .select($"priority", $"pos", $"neg",
        round(woe, 6).as("woe"),
        round((rp - rn) * woe, 6).as("iv_term"))
      .orderBy($"priority")
  }
}
