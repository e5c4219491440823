package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** 2-D skyline (Pareto frontier): the rows no other row dominates,
  * minimizing one measure while maximizing the other — "cheapest part
  * at every size class" queries that need no externally chosen weights.
  * Dominance is the standard strict form: b dominates a iff b.x ≤ a.x,
  * b.y ≥ a.y, and at least one inequality is strict (exact duplicates
  * dominate nothing and both survive).
  *
  * Scale shape — the skyline operator is DISTRIBUTIVE:
  * skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)), so each
  * partition prunes locally to its own frontier first (one
  * sortWithinPartitions, no exchange; a random partition of n rows
  * keeps O(log² n) expected frontier points in 2-D), and only those
  * survivors — a few hundred rows from terabytes — cross one exchange
  * into the final single-task merge that runs the same sweep again.
  * The sweep itself is the classic sort-order prefix-max scan: after
  * ordering by (x asc, y desc), a row is dominated iff the running max
  * of y over STRICTLY EARLIER rows beats it, or ties it via a row with
  * strictly smaller x.
  */
object Skyline {

  /** One sorted-partition dominance sweep; input must be sorted by
    * (x asc, y desc) within the partition. */
  private def sweep(it: Iterator[Row]): Iterator[Row] = {
    var maxY = Double.NegativeInfinity
    var minXatMaxY = Double.PositiveInfinity
    it.flatMap { r =>
      val x = r.getDouble(1); val y = r.getDouble(2)
      val dominated =
        maxY > y || (maxY == y && minXatMaxY < x)
      if (y > maxY) { maxY = y; minXatMaxY = x }
      else if (y == maxY && x < minXatMaxY) minXatMaxY = x
      if (dominated) None else Some(r)
    }
  }

  /** Skyline of `df` minimizing `minCol` and maximizing `maxCol`;
    * returns (id, x, y) rows of the frontier. */
  def skyline2D(df: DataFrame, idCol: String, minCol: String,
                maxCol: String): DataFrame = {
    val spark = df.sparkSession
    val proj = df.select(col(idCol).cast("long").as("id"),
      col(minCol).cast("double").as("x"), col(maxCol).cast("double").as("y"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("x", DoubleType), StructField("y", DoubleType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    // local frontier per partition: sort + sweep, zero exchange
    val local = proj.sortWithinPartitions(col("x").asc, col("y").desc)
      .mapPartitions(sweep _)(enc)
    // global merge: the union of local frontiers is tiny by
    // construction, so one task re-sweeps it exactly
    local.repartition(1).sortWithinPartitions(col("x").asc, col("y").desc)
      .mapPartitions(sweep _)(enc)
  }

  /** Driver entry: frontier of parts — cheapest retail price per size,
    * maximizing size. */
  def partFrontier(spark: SparkSession, sfDir: String): DataFrame =
    skyline2D(Tables.part(spark, sfDir), "p_partkey", "p_retailprice", "p_size")
      .select(col("id").as("p_partkey"), round(col("x"), 2).as("price"),
        col("y").cast("long").as("size"))
      .orderBy(col("p_partkey"))
}
