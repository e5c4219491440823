package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** CDC change-feed application — collapsing an ordered stream of
  * insert/update/delete records into the current snapshot, the
  * ingestion-side complement of the warehouse family (q_upsert merges
  * ONE delta batch; q_scd2 keeps history; this replays a whole ordered
  * feed to its end state). The semantics are last-writer-wins: for
  * each key, the change with the highest sequence number decides the
  * row, and if that change is a delete the key is absent from the
  * snapshot.
  *
  * Scale shape: ONE key-hashed exchange carries the entire reduction —
  * the per-key "latest" is a row_number window over (key) ordered by
  * seq DESC, O(1) state per key, and the delete filter rides the same
  * stage. No join against the existing snapshot is needed because the
  * feed's inserts ARE the baseline; applying a feed ON TOP of a stored
  * snapshot is the same plan with the snapshot unioned in at seq 0.
  * At 100 TB the feed partitions by key like any keyed aggregation —
  * nothing is driver-side and no state outlives its task.
  */
object ChangeFeed {

  /** Apply an (op, seq)-stamped change feed and return the end-state
    * snapshot: key, surviving op, final price. */
  def apply(feed: DataFrame): DataFrame = {
    val latest = Window.partitionBy(col("k")).orderBy(col("seq").desc)
    feed
      .withColumn("__r", row_number().over(latest))
      .where(col("__r") === 1 && col("op") =!= "D")
      // price stays DECIMAL through the whole feed (exact, engine-
      // independent arithmetic); the one double cast happens here at
      // the output boundary, after all value computation is done
      .select(col("k").as("o_orderkey"), col("op").as("last_op"),
        col("price").cast("double").as("price"))
  }

  /** The `q_cdc_apply` queries entry: a deterministic three-generation
    * feed synthesized from orders — every order inserted at seq 1,
    * keys ≡ 0 (mod 7) re-priced at seq 2, keys ≡ 0 (mod 13) deleted at
    * seq 3 — then applied. Updated-then-deleted keys (lcm 91) prove
    * the delete outranks the update; updated keys must carry the seq-2
    * price, everything else the insert price. */
  def applyEntry(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderkey".as("k"),
        $"o_totalprice".cast("decimal(18,2)").as("p"))
    val ins = o.select($"k", lit(1L).as("seq"), lit("I").as("op"),
      $"p".cast("decimal(21,3)").as("price"))
    val upd = o.where($"k" % 7 === 0)
      .select($"k", lit(2L).as("seq"), lit("U").as("op"),
        ($"p" * lit(new java.math.BigDecimal("1.1")))
          .cast("decimal(21,3)").as("price"))
    val del = o.where($"k" % 13 === 0)
      .select($"k", lit(3L).as("seq"), lit("D").as("op"),
        lit(null).cast("decimal(21,3)").as("price"))
    apply(ins.unionByName(upd).unionByName(del))
      .orderBy($"o_orderkey")
  }
}
