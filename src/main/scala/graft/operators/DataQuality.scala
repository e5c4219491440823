package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Pipeline data-quality primitives: a declarative constraint audit
  * (domain + referential-integrity expectations evaluated in bulk),
  * an append-only snapshot reconciliation diff, and an order-invariant
  * dataset content checksum.
  *
  * These are the checks a 100 TB ingest runs before anything
  * downstream trusts the data (the reference engine trusts its single
  * writer — main.rs:196-257 writes and reads its own clustered file —
  * a multi-writer lakehouse cannot):
  *  - every per-row rule is a `sum(CASE ...)` fused into ONE scan per
  *    table (no per-rule pass, no shuffle — partial aggregation ships
  *    a handful of longs per partition);
  *  - each FK rule is one anti-join shuffled on the key, left
  *    UNHINTED so AQE broadcasts the dimension while it is small and
  *    falls back to a hash join when it isn't;
  *  - the checksum is commutative (a sum), so it is partitioning-,
  *    ordering-, and retry-invariant — the property that makes it a
  *    usable dataset version stamp at any scale.
  */
object DataQuality {

  /** X222: constraint audit — one row per expectation with its
    * violation and checked counts. Domain rules ride the scan; FK
    * rules are anti-join counts on the join key. */
  def constraintAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)

    def viol(rule: String, pred: Column) =
      (rule, sum(when(pred, 1L).otherwise(0L)), count(lit(1)))

    // per-table domain rules: ALL rules of a table evaluate in ONE
    // aggregate over ONE scan (map-side combined; bytes die at source)
    val liRules = Seq(
      viol("lineitem_qty_range", $"l_quantity" <= 0 || $"l_quantity" > 50),
      viol("lineitem_discount_range",
        $"l_discount" < 0 || $"l_discount" > 1),
      viol("lineitem_price_positive", $"l_extendedprice" <= 0))
    val ordRules = Seq(
      viol("orders_price_positive", $"o_totalprice" <= 0),
      viol("orders_status_domain", !$"o_orderstatus".isin("O", "F", "P")),
      viol("orders_priority_domain", !$"o_orderpriority".isin(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
    val docRules = Seq(
      viol("documents_text_nonempty",
        $"text".isNull || length($"text") === 0),
      viol("documents_nchars_consistent", $"n_chars" =!= length($"text")))

    def scanAudit(df: DataFrame,
                  rules: Seq[(String, Column, Column)]): DataFrame = {
      // ALL rules of the table in ONE aggregate over ONE scan; the
      // single bounded output row then explodes into per-rule rows
      val aggCols = rules.zipWithIndex.flatMap { case ((_, v, c), i) =>
        Seq(v.as(s"v$i"), c.as(s"c$i")) }
      val agg = df.agg(aggCols.head, aggCols.tail: _*)
      val pairs = rules.zipWithIndex.map { case ((rule, _, _), i) =>
        struct(lit(rule).as("rule"), col(s"v$i").as("violations"),
          col(s"c$i").as("checked"))
      }
      agg.select(explode(array(pairs: _*)).as("r")).select($"r.*")
    }

    // FK rules: ONE pass — a left join against the distinct dimension
    // keys scores orphans (NULL probe) and the total in the same
    // aggregate, so the fact table is scanned once per rule. The join
    // is deliberately unhinted: AQE broadcasts the dimension while it
    // is small and falls back to a hash join when it isn't.
    def fkAudit(rule: String, fact: DataFrame, factKey: String,
                dim: DataFrame, dimKey: String): DataFrame =
      fact.select(col(factKey))
        .join(dim.select(col(dimKey)).distinct(),
          col(factKey) === col(dimKey), "left")
        .agg(sum(when(col(dimKey).isNull, 1L).otherwise(0L))
          .as("violations"), count(lit(1)).as("checked"))
        .select(lit(rule).as("rule"), $"violations", $"checked")

    scanAudit(li, liRules)
      .unionByName(scanAudit(ord, ordRules))
      .unionByName(scanAudit(docs, docRules))
      .unionByName(fkAudit("lineitem_fk_orders", li, "l_orderkey",
        ord, "o_orderkey"))
      .unionByName(fkAudit("orders_fk_customer", ord, "o_custkey",
        cust, "c_custkey"))
      .orderBy($"rule")
  }

  /** X223: snapshot reconciliation diff — classify every key of two
    * snapshots of the same keyed state as added / removed / changed /
    * unchanged via ONE full outer join on the key. The state columns
    * are compared null-safely, so a column going NULL counts as a
    * change, not a silent match. */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
                   stateCols: Seq[String]): DataFrame = {
    val al = a.select((key +: stateCols).map(c => col(c).as(s"a_$c")): _*)
    val bl = b.select((key +: stateCols).map(c => col(c).as(s"b_$c")): _*)
    val joined = al.join(bl, col(s"a_$key") === col(s"b_$key"), "full_outer")
    val same = stateCols.map(c => col(s"a_$c") <=> col(s"b_$c"))
      .reduce(_ && _)
    joined.select(
      when(col(s"a_$key").isNull, "added")
        .when(col(s"b_$key").isNull, "removed")
        .when(same, "unchanged").otherwise("changed").as("change_type"))
      .groupBy("change_type").agg(count(lit(1)).as("n"))
      .orderBy("change_type")
  }

  /** X223 entry: the diff of two REAL append-only snapshots — the
    * max observed value cents per (user, event_type) as of day 8 vs
    * day 31. A saturating state (max) is what makes `unchanged` a
    * live class on append-only data; a key absent at day 8 is
    * `added`; `removed` is correctly absent — the operator proves the
    * append-only invariant rather than assuming it. */
  def snapshotDiffEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def stateAsOf(cutoff: String): DataFrame =
      Tables.events(spark, sfDir)
        .where($"ts" < lit(cutoff).cast("timestamp"))
        // NULL key parts render as an explicit U+0001 sentinel (same
        // coalesce in the twin SQL) so both engines group NULLs into
        // the SAME key instead of Spark dropping the part (concat_ws
        // skips NULLs) while DuckDB nulls the whole key
        .groupBy(concat_ws("|",
          coalesce($"user_id".cast("string"), lit("\u0001")),
          coalesce($"event_type", lit("\u0001"))).as("k"))
        .agg(max(round($"value" * 100).cast("long")).as("max_cents"))
    snapshotDiff(stateAsOf("2024-01-08"), stateAsOf("2024-01-31"),
      "k", Seq("max_cents"))
  }

  /** X224: order-invariant dataset content checksum per group — the
    * 60-bit md5 prefix of each row's canonical rendering, summed as
    * DECIMAL(38,0). Commutative and associative, so the stamp is
    * independent of partitioning, task order, and retries; two
    * pipelines comparing stamps never move the data. 60 bits per row
    * keeps the sum inside 38 decimal digits to ~10^19 rows. */
  def datasetChecksum(docs: DataFrame): DataFrame = {
    // every column renders through the same NULL sentinel (U+0001) in
    // both engines: concat_ws would silently SKIP a NULL column (so
    // ('a','b',NULL) and ('a|b',NULL,NULL) collide and the stamp turns
    // ambiguous), while the twin's '||' would NULL the whole string
    // and drop the row from the sum — a content-integrity stamp must
    // hash NULL rows deterministically, not diverge on them
    def nz(c: Column): Column = coalesce(c.cast("string"), lit("\u0001"))
    val canonical = concat_ws("|",
      nz(col("doc_id")), nz(col("lang")), nz(col("source")),
      nz(col("n_chars")), nz(col("text")))
    docs.select(col("lang"),
        conv(substring(md5(canonical), 1, 15), 16, 10)
          .cast("decimal(38,0)").as("h"))
      .groupBy(col("lang"))
      // the sum exceeds a double's 53-bit mantissa by design — render
      // as digits so the comparison is exact in any engine
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h")).cast("string").as("checksum"))
      .orderBy(col("lang"))
  }
}
