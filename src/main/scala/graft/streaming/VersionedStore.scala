package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet state store shared by the foreachBatch loops
  * (near-dup signature store, streaming index maintenance).
  *
  * Crash-safety contract (see StreamingDedup's Scaladoc for the full
  * reasoning): batch N reads the max version STRICTLY BELOW N, so a
  * replay after a crash between the state write and the streaming
  * checkpoint commit re-reads exactly what the first attempt read —
  * never its own half-written output. Writes go to a `.tmp-v<id>`
  * path renamed into place, so the rename is the atomic commit point
  * and a partially written version is never picked up. The version a
  * batch read must be kept until the NEXT batch commits (a replay
  * still needs it); `prune(keepFrom)` deletes strictly older ones.
  */
private[graft] object VersionedStore {

  def path(dir: String, version: Long): String = s"$dir/v$version"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)

  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val root = new Path(dir)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .map(_.getPath.getName.drop(1).toLong)
  }

  /** Max committed version strictly below `version` — the one a
    * (possibly replayed) batch `version` must read. */
  def latestBelow(spark: SparkSession, dir: String, version: Long): Option[Long] =
    versions(spark, dir).filter(_ < version).sorted.lastOption

  /** Write-temp-then-rename commit. A stale `v<version>` from a
    * crashed earlier attempt of the SAME batch is safe to delete —
    * that batch read strictly older state, never its own output. */
  def commit(spark: SparkSession, state: DataFrame, dir: String, version: Long): Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(s"$dir/.tmp-v$version")
    val dst = new Path(path(dir, version))
    if (f.exists(tmp)) f.delete(tmp, true)
    state.write.mode("overwrite").parquet(tmp.toString)
    if (f.exists(dst)) f.delete(dst, true)
    if (!f.rename(tmp, dst))
      sys.error(s"failed to commit state version $dst")
  }

  /** Delete versions strictly below `keepFrom`. */
  def prune(spark: SparkSession, dir: String, keepFrom: Long): Unit = {
    val f = fs(spark, dir)
    versions(spark, dir).filter(_ < keepFrom).foreach { v =>
      f.delete(new Path(path(dir, v)), true)
    }
  }
}
