package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic micro-batch replay harness: the driver-gate bridge
  * between Structured Streaming's incremental stateful execution and a
  * batch SQL oracle. Each gate replays a testdata table through the
  * REAL streaming engine — file source, one staged file per trigger,
  * memory sink — and returns a final table that must hash-match what
  * the oracle computes in one batch pass. What is being verified is
  * the streaming STATE MACHINERY itself: that state merged across
  * micro-batches converges to the order-free batch answer.
  *
  * Determinism contract: FileStreamSource admits files oldest-mtime
  * first, so `stageSlices` writes one parquet file per slice
  * sequentially and pins strictly increasing mtimes — the micro-batch
  * order IS the slice order, on any filesystem, every run.
  */
object Replay {

  /** Run `body` (which must both START the streaming query and drain
    * it) with `spark.sql.shuffle.partitions` — the knob that fixes a
    * streaming query's STATE STORE partition count at start — sized
    * for the replay gates instead of inherited from the batch-session
    * global. Rationale (optimization guide §2.2/§6 applied to state
    * stores): every stateful micro-batch pays one state-store
    * load/commit (delta file + fsync) PER PARTITION PER STATEFUL
    * OPERATOR, a fixed cost independent of rows — a stream-stream join
    * carries four stores per partition, so at the session default
    * (= cores) one 4-batch replay of a kilobyte trigger commits
    * 4 stores × cores × batches files. The gates replay the table as
    * `batches` time/key-ranged slices, so per-trigger volume is
    * ~1/batches of the batch query's input; sizing state partitions at
    * cores/4 keeps per-task trigger volume at what the equivalent
    * batch plan would see, cutting the per-batch commit fan-out 4×
    * without changing any result (state partitioning only routes
    * keys). Production streams with real state volume should size
    * this explicitly via `spark.graft.stream.statePartitions` —
    * state-store count ~ live-state bytes / target-state-per-task,
    * NOT driver cores. Measured (sf0.1, local[32]): q_stream_join
    * micro-batches 2.0-2.5 s → ~0.6 s each; entry 18.2 s → ~6 s. */
  private[graft] def withStatePartitions[T](
      spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val n = spark.conf.getOption("spark.graft.stream.statePartitions")
      .getOrElse(math.max(4, scala.util.Try(prev.toInt).getOrElse(16) / 4).toString)
    spark.conf.set(key, n)
    try body finally spark.conf.set(key, prev)
  }

  /** Stage each slice as a single parquet file `0000.parquet`,
    * `0001.parquet`, … under a fresh temp dir with strictly
    * increasing mtimes; with maxFilesPerTrigger=1 the streaming file
    * source then replays exactly one slice per micro-batch, in order. */
  def stageSlices(slices: Seq[DataFrame]): String = {
    val stage = Files.createTempDirectory("graft-replay").toString
    slices.zipWithIndex.foreach { case (df, i) =>
      val tmp = s"$stage/_tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val tmpDir = new java.io.File(tmp)
      val part = tmpDir.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file staged for slice $i"))
      val dest = Paths.get(stage, f"$i%04d.parquet")
      Files.move(part.toPath, dest)
      // pinned, spaced mtimes: slice order survives coarse fs clocks
      dest.toFile.setLastModified(1700000000000L + i * 60000L)
      tmpDir.listFiles().foreach(_.delete()); tmpDir.delete()
    }
    stage
  }

  /** Run `query` (applied to a file stream over `stage`) to completion
    * into a memory sink and return the sink table. */
  def runToMemory(spark: SparkSession, stage: String, outputMode: String)(
      query: DataFrame => DataFrame): DataFrame = {
    val schema = spark.read.parquet(stage).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val name = "graft_replay_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    withStatePartitions(spark) {
      val q = query(stream).writeStream.format("memory").queryName(name)
        .outputMode(outputMode).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
  }

  /** X2 driver gate: gap-based sessionization replayed through
    * `flatMapGroupsWithState` (append mode, event-time timeout) as
    * `batches` time-ranged micro-batches. Ranges ascend, so no event
    * is ever late to the watermark and every cross-batch session
    * continuation exercises real state handoff. Sessions left open
    * after the data are flushed by two sentinel events for user −1,
    * 2×gap+1h past the last real event: the first advances the
    * watermark beyond every open session's last+gap, the next batch
    * fires the event-time timeouts. The sentinel user is dropped from
    * the output; session ordinals are re-derived per user by start
    * time so the result matches the batch oracle's running-break ids. */
  def replaySessionize(spark: SparkSession, sfDir: String,
                       gapMinutes: Int = 480, batches: Int = 4): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = hi - lo + 1
    val slices = (0 until batches).map { i =>
      val a = lo + span * i / batches
      val b = lo + span * (i + 1) / batches
      ev.where(unix_micros(col("ts")) >= a && unix_micros(col("ts")) < b)
    }
    val farMs = (hi + (2L * gapMinutes + 60) * 60L * 1000000L) / 1000L
    def sentinel(ms: Long) =
      Seq((-1L, new java.sql.Timestamp(ms), 0.0)).toDF("user_id", "ts", "value")
    val stage = stageSlices(slices ++ Seq(sentinel(farMs), sentinel(farMs + 3600000L)))
    val sessions = runToMemory(spark, stage, "append") { stream =>
      Sessionize.streaming(stream.as[Sessionize.SessionEvent], gapMinutes).toDF()
    }
    val byStart = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
    sessions.where(col("user_id") >= 0)
      .withColumn("session_id", row_number().over(byStart).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        round(col("total_value"), 2).as("total_value"), col("duration_secs"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Stream-stream interval join driver gate: views and purchases
    * replayed as two INDEPENDENT file streams (same ascending
    * time-range slice boundaries, one file per trigger each), joined
    * on user within [view_ts, view_ts + window] through the real
    * symmetric-hash join with watermark-driven state eviction. The
    * state machinery being pinned: a view must stay buffered until the
    * watermark passes its join window (a purchase from a LATER
    * micro-batch can still match it), a purchase must match views from
    * EARLIER batches already in state, and eviction must never drop a
    * row the window still reaches. Because slices ascend in event
    * time, nothing is ever late to the watermark, so the engine must
    * emit exactly the batch join — which is what the oracle computes.
    * Watermark delay is 1 minute: pure state-retention slack (inner
    * joins emit on arrival; the delay only schedules eviction). */
  def replayStreamJoin(spark: SparkSession, sfDir: String,
                       batches: Int = 4, windowMinutes: Int = 60): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("vts"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = hi - lo + 1
    def slices(df: DataFrame, tsCol: String): Seq[DataFrame] =
      (0 until batches).map { i =>
        val a = lo + span * i / batches
        val b = lo + span * (i + 1) / batches
        df.where(unix_micros(col(tsCol)) >= a && unix_micros(col(tsCol)) < b)
      }
    val stageV = stageSlices(slices(views, "vts"))
    val stageP = stageSlices(slices(purch, "pts"))
    def stream(stage: String, wmCol: String) = {
      val schema = spark.read.parquet(stage).schema
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(stage).withWatermark(wmCol, "1 minute")
    }
    val joined = stream(stageV, "vts").join(stream(stageP, "pts"),
      expr(s"user_id = p_user_id AND pts >= vts AND " +
        s"pts <= vts + interval $windowMinutes minutes"))
    val name = "graft_replay_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    withStatePartitions(spark) {
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        ((unix_micros(col("pts")) - unix_micros(col("vts"))) / 1000000L)
          .cast("long").as("lag_secs"))
      .orderBy(col("user_id"), col("view_id"), col("purchase_id"))
  }

  /** X9 driver gate: exact streaming dedup replayed as `batches`
    * doc_id-ranged micro-batches through a first-seen stateful
    * operator keyed on the content hash (state = one boolean per
    * hash, never the document). Emission happens exactly once, in the
    * first batch that contains the hash; the keeper is the min doc_id
    * within that batch — and because batches ascend by doc_id range,
    * that IS the global min doc_id, which is what the batch oracle
    * computes. A second sighting in a later batch must find the state
    * and stay silent: that cross-batch suppression is the invariant
    * this gate pins. */
  def replayExactDedup(spark: SparkSession, sfDir: String,
                       batches: Int = 4): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), md5(col("text")).as("h"))
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val span = hi - lo + 1
    val slices = (0 until batches).map { i =>
      val a = lo + span * i / batches
      val b = lo + span * (i + 1) / batches
      docs.where(col("doc_id") >= a && col("doc_id") < b)
    }
    val stage = stageSlices(slices)
    runToMemory(spark, stage, "append") { stream =>
      stream.as[(Long, String)]
        .groupByKey(_._2)
        .flatMapGroupsWithState[Boolean, (String, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (h: String, it: Iterator[(Long, String)], state) =>
            if (state.exists) Iterator.empty
            else { state.update(true); Iterator.single((h, it.map(_._1).min)) }
        }
        .toDF("h", "keeper_id")
    }.orderBy(col("h"))
  }
}
