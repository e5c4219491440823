package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (L12): media as opaque `binary` payloads
  * plus typed metadata, with decode/feature-extraction plumbing shaped
  * for batched columnar execution.
  *
  * The decode itself is STUBBED (this container has no image/audio
  * codecs): `StubDecoder` derives deterministic "features" from the
  * payload bytes so the whole pipeline — schema, batching, partition
  * flow, aggregation — is real and testable, and a production codec
  * drops in behind the same `MediaDecoder` trait.
  *
  * Scale design: decode runs inside `mapPartitions` over batches of
  * `batchSize` records (the Arrow/pandas-UDF batch shape — amortizes
  * per-call overhead and lets a native decoder vectorize), payloads
  * never shuffle (features are extracted before any aggregation), and
  * the output is a narrow typed row, so the wide binary column dies at
  * the scan stage.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],
      declared_w: Int,
      declared_h: Int)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      n_frames: Int,
      n_bytes: Long)

  /** Decoder contract: payload bytes → features. Implementations must
    * be deterministic per payload (retries/speculative tasks). */
  trait MediaDecoder extends Serializable {
    def decode(r: MediaRecord): MediaFeatures
  }

  /** Deterministic stand-in for a real codec: "header parse" derived
    * from payload length only, so an external oracle can recompute it.
    * A real decoder (JPEG/PNG/PCM) replaces this class and nothing
    * else changes. */
  object StubDecoder extends MediaDecoder {
    override def decode(r: MediaRecord): MediaFeatures = {
      val len = r.payload.length
      MediaFeatures(
        media_id = r.media_id,
        kind = r.kind,
        width = 16 + (len % 317),
        height = 16 + ((len * 7) % 211),
        n_frames = if (r.kind == "video") 1 + (len % 5) else 1,
        n_bytes = len.toLong)
    }
  }

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP
    * readers ship with the JVM — zero new dependencies): actual raster
    * width/height when the payload parses as an image, `fallback` for
    * everything else (non-image kinds, and the synthetic text-derived
    * payloads the driver tables carry, which are not valid image
    * bytes). Deterministic per payload — ImageIO parsing is pure —
    * so the retry/speculative-task contract holds. `ImageIO.read`
    * allocates the raster; corpus-scale use keeps payloads batched in
    * `mapPartitions` exactly like the stub, the raster dies inside the
    * decode call, and only the narrow feature row survives. */
  final class ImageIODecoder(fallback: MediaDecoder = StubDecoder)
      extends MediaDecoder {
    override def decode(r: MediaRecord): MediaFeatures =
      if (r.kind != "image") fallback.decode(r)
      else readImage(r.payload) match {
        case Some(img) =>
          MediaFeatures(r.media_id, r.kind, img.getWidth, img.getHeight,
            n_frames = 1, n_bytes = r.payload.length.toLong)
        case None => fallback.decode(r)
      }
  }

  /** Parse payload bytes as an image; None when no registered reader
    * claims the format OR the reader blows up mid-parse (the
    * quarantine path a real corpus needs). ImageIO readers throw
    * RuntimeExceptions — ArrayIndexOutOfBounds, NegativeArraySize,
    * IllegalArgument — on malformed/truncated payloads, not just
    * IOException; any of those escaping would crash the task (and
    * after retries the job), so the catch must be total over
    * arbitrary bytes. */
  private[graft] def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** 8×8 grayscale thumbnail contract for the perceptual hash: 64
    * luma values in raster order, or None for undecodable payloads
    * (the corrupt-file quarantine). */
  trait RasterDecoder extends Serializable {
    def thumbnail8x8(r: MediaRecord): Option[Array[Int]]
  }

  /** Stub raster: the first 64 payload bytes as "pixels" — the
    * deterministic oracle path the driver entries run (a SQL twin can
    * recompute it from the bytes). */
  object StubRaster extends RasterDecoder {
    override def thumbnail8x8(r: MediaRecord): Option[Array[Int]] =
      if (r.payload.length < 64) None
      else Some(Array.tabulate(64)(i => r.payload(i) & 0xff))
  }

  /** Real raster via `javax.imageio`: decode, area-average down to
    * 8×8 (TYPE_INT_RGB draw with bilinear hints is the standard aHash
    * shrink), Rec.601 integer luma — the exact thumbnail a production
    * aHash uses. Undecodable payloads quarantine as None. */
  object ImageIORaster extends RasterDecoder {
    override def thumbnail8x8(r: MediaRecord): Option[Array[Int]] =
      readImage(r.payload).map { img =>
        val thumb = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = thumb.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, 8, 8, null)
        } finally g.dispose()
        Array.tabulate(64) { i =>
          val rgb = thumb.getRGB(i % 8, i / 8)
          val (rr, gg, bb) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          (rr * 299 + gg * 587 + bb * 114) / 1000
        }
      }
  }

  /** Decode a media dataset in partition-local batches. The iterator
    * is consumed lazily batch by batch — constant memory per task
    * regardless of partition size. */
  def decodeFeatures(media: Dataset[MediaRecord],
                     decoder: MediaDecoder = StubDecoder,
                     batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => batch.map(decoder.decode))
    }
  }

  /** One sampled frame: parent media, frame index, stub "pixels"
    * digest, post-resize dims. */
  final case class FrameRecord(
      media_id: Long,
      frame_idx: Int,
      frame_hash: Long,
      width: Int,
      height: Int)

  /** Frame-sample + resize plumbing: every `everyN`-th frame of each
    * video (other kinds contribute frame 0), "decoded" to a
    * deterministic digest and resized to `targetW`×`targetH`. The
    * real pattern under the stub: one media row fans out to a bounded
    * number of narrow frame rows inside `mapPartitions` — payload
    * bytes are read once per batch and never duplicated per frame, and
    * the fan-out happens before any shuffle so downstream ops group
    * over small rows. */
  def sampleFrames(media: Dataset[MediaRecord],
                   decoder: MediaDecoder = StubDecoder,
                   everyN: Int = 2, targetW: Int = 64, targetH: Int = 64,
                   batchSize: Int = 64): Dataset[FrameRecord] = {
    require(everyN > 0, "everyN must be positive")
    implicit val enc = org.apache.spark.sql.Encoders.product[FrameRecord]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val f = decoder.decode(r)
          // stub "pixel digest": payload hash mixed with the frame idx
          val base = graft.functions.expr.GraftHash.fnv64(r.payload)
          (0 until f.n_frames by everyN).map { idx =>
            FrameRecord(r.media_id, idx,
              graft.functions.expr.GraftHash.splitmix64(base ^ idx.toLong),
              targetW, targetH)
          }
        }
      }
    }
  }

  /** Per-payload audio amplitude summary (stub PCM decode). */
  final case class AudioFeatures(
      media_id: Long,
      n_samples: Long,
      duration_ms: Long,
      mean_amp: Double,
      clip_frac: Double)

  /** Audio-path feature extraction: treat each payload byte as an
    * unsigned 8-bit PCM sample (the stub stand-in for a real PCM/FLAC
    * frame decoder) and reduce to duration at `sampleRate`, mean
    * amplitude, and clipping fraction (samples ≥ `clipAt`) — the
    * signals an audio-corpus quality filter gates on. One sequential
    * pass per payload inside the batched mapPartitions; the payload
    * dies at the decode boundary like every media path, and the
    * output row is 5 narrow columns regardless of clip length. */
  def audioFeatures(media: Dataset[MediaRecord], clipAt: Int = 120,
                    sampleRate: Int = 16000, batchSize: Int = 64): Dataset[AudioFeatures] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[AudioFeatures]
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { r =>
        val b = r.payload
        var sum = 0L; var clip = 0L; var i = 0
        while (i < b.length) {
          val v = b(i) & 0xff
          sum += v; if (v >= clipAt) clip += 1; i += 1
        }
        val n = b.length.toLong
        AudioFeatures(r.media_id, n, n * 1000L / sampleRate,
          if (n > 0) sum.toDouble / n else 0.0,
          if (n > 0) clip.toDouble / n else 0.0)
      })
    }
  }

  /** The `mm_audio_stats` queries entry: per-clip amplitude summary,
    * rounded for the cross-engine compare. */
  def audioStats(spark: SparkSession, sfDir: String): DataFrame =
    audioFeatures(mediaFromDocuments(spark, sfDir)).toDF()
      .select(col("media_id"), col("n_samples"), col("duration_ms"),
        round(col("mean_amp"), 4).as("mean_amp"),
        round(col("clip_frac"), 4).as("clip_frac"))

  /** One image's perceptual signature: the 64-bit average-hash as a
    * 64-char '0'/'1' string (string, not long, so an external oracle
    * needs no 2^63 arithmetic and the bit order is self-describing). */
  final case class ImageHash(media_id: Long, phash: String)

  /** Average-hash (aHash) perceptual image signature: decode to an
    * 8×8 grayscale thumbnail via the pluggable [[RasterDecoder]]
    * (default [[StubRaster]]: first 64 payload bytes — the
    * deterministic oracle path; [[ImageIORaster]]: real PNG/JPEG
    * decode + bilinear shrink, nothing downstream changes), threshold
    * each pixel against the thumbnail
    * mean, pack the 64 bits in raster order. Identical images hash
    * identically; near-identical ones differ in a few bits — the
    * standard cheap pre-filter before pixel-level comparison.
    *
    * Scale shape: same as every media path — the hash is extracted
    * inside the batched `mapPartitions` at the scan, the payload dies
    * there, and only (id, 64-char hash) ever shuffles. Payloads
    * shorter than 64 bytes are undecodable by the stub and skipped
    * (a real decoder has its own corrupt-file quarantine). The mean
    * divides by exactly 64, a power of two, so the threshold is an
    * EXACT double both here and in any oracle recomputation. */
  def imageHashes(media: Dataset[MediaRecord],
                  batchSize: Int = 64,
                  raster: RasterDecoder = StubRaster): Dataset[ImageHash] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ImageHash]
    media.filter(_.kind == "image")
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.flatMap { r =>
          raster.thumbnail8x8(r).map { px =>
            var i = 0; var sum = 0L
            while (i < 64) { sum += px(i); i += 1 }
            val mean = sum / 64.0
            val bits = new StringBuilder(64)
            i = 0
            while (i < 64) { bits.append(if (px(i) >= mean) '1' else '0'); i += 1 }
            ImageHash(r.media_id, bits.toString)
          }
        })
      }
  }

  /** The `mm_image_phash` queries entry: aHash every image payload and
    * roll up per signature — exact-phash dup groups (count + keeper
    * id), the image-corpus analogue of `dedup_exact`'s content-hash
    * groups. One groupBy over narrow (id, hash) rows. */
  def imagePHash(spark: SparkSession, sfDir: String): DataFrame =
    imageHashes(mediaFromDocuments(spark, sfDir)).toDF()
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n"), min(col("media_id")).as("keeper_id"))
      .orderBy(col("phash"))

  /** X145: NEAR-duplicate image pairs by perceptual-hash Hamming
    * distance — exact-phash grouping (X118) misses the one-bit wobble
    * a recompression introduces; this finds pairs within Hamming ≤ d.
    * Scale shape is the banded-signature pattern every near-dup
    * operator here uses: split the 64-bit signature into d+1 bands —
    * pigeonhole guarantees any pair within distance d agrees on ≥1
    * whole band — hash-join on (band index, band value), then verify
    * exactly with bit_count(a XOR b) per band (integer ops,
    * engine-exact).
    *
    * The signature is FIXED at 64 bits, so unlike the SRP families
    * there is no band width to auto-widen (d+1 bands of 64/(d+1) bits
    * is the only split that keeps pigeonhole recall); the scale
    * defense is the same HARD bucket cap every banded pipeline here
    * uses — Dedup.bucketPairs bounds every (band, value) bucket at
    * `maxBucket` during collection, so Σ bucket² stays linear and one
    * template image (or a degenerate all-black corpus) cannot go
    * quadratic. Dropped hot buckets are observable via
    * Dedup.droppedBuckets, the declared recall/robustness trade of
    * the LSH family. */
  def phashNearDupPairs(spark: SparkSession, sfDir: String,
                        maxDist: Int = 3, maxBucket: Int = 200): DataFrame = {
    require(maxDist >= 0 && maxDist <= 15, "bands of 16 bits need d+1 <= 16... d in [0,15]")
    val bands = maxDist + 1
    require(64 % bands == 0, "band count must divide 64")
    val width = 64 / bands
    val h = imageHashes(mediaFromDocuments(spark, sfDir)).toDF()
      .select(col("media_id"), col("phash"))
    val bandCols = (0 until bands).map(i =>
      struct(lit(i).as("b"),
        conv(substring(col("phash"), 1 + i * width, width), 2, 10)
          .cast("long").as("v")))
    val banded = h.select(col("media_id").as("id"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.b").as("band"), col("bb.v").as("bhash"))
    val cand = graft.operators.Dedup.bucketPairs(banded, maxBucket)
    val p1 = h.select(col("media_id").as("id1"), col("phash").as("pa"))
    val p2 = h.select(col("media_id").as("id2"), col("phash").as("pb"))
    val ham = (0 until bands).map { i =>
      val o = 1 + i * width
      s"bit_count(CAST(conv(substring(pa, $o, $width), 2, 10) AS BIGINT) ^ " +
        s"CAST(conv(substring(pb, $o, $width), 2, 10) AS BIGINT))"
    }.mkString("CAST(", " + ", " AS BIGINT)")
    cand.join(p1, "id1").join(p2, "id2")
      .withColumn("hamming", expr(ham))
      .where(col("hamming") <= maxDist)
      .select(col("id1"), col("id2"), col("hamming"))
      .orderBy(col("id1"), col("id2"))
  }

  /** X136: text–embedding pair curation — the CLIP-style step that
    * joins a caption corpus to its embedding table, applies the
    * quality gate, and reports per-(lang, label) cohort stats for
    * mixture decisions. The join keys doc_id ≡ vec_id (the corpus
    * convention dedup_hybrid also relies on); at 100 TB both sides
    * shuffle on that shared key once — or not at all when both are
    * bucketed on it. Per-row vector norms are one left-to-right fold
    * (engine-identical); the cohort average accumulates them as
    * DECIMAL so cross-row float-sum order is invisible. All other
    * outputs are integers. */
  def pairStats(docs: DataFrame, emb: DataFrame,
                minChars: Long = 40): DataFrame = {
    val toks = graft.functions.TextFunctions.tokens(lower(col("text")))
    val pairs = docs
      .where(col("n_chars") >= minChars)
      .select(col("doc_id"), col("lang"), size(toks).cast("long").as("n_tokens"))
      .join(emb.select(col("vec_id").as("doc_id"), col("label"), col("embedding")),
        Seq("doc_id"))
    pairs
      .withColumn("norm", round(sqrt(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))), 6))
      .groupBy(col("lang"), col("label"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("n_tokens")).as("sum_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("norm").cast("decimal(18,6)")).as("__nsum"))
      .withColumn("avg_norm", round(col("__nsum").cast("double") / col("n_pairs"), 6))
      .select(col("lang"), col("label").cast("long").as("label"), col("n_pairs"),
        col("sum_tokens"), col("max_tokens"), col("avg_norm"))
      .orderBy(col("lang"), col("label"))
  }

  /** Deterministic media table derived from the documents testdata:
    * the text bytes act as the payload, the kind cycles through the
    * three modalities. */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      lit(0).as("declared_w"),
      lit(0).as("declared_h")).as[MediaRecord]
  }

  /** The `mm_decode_stats` queries entry: decode → per-kind feature
    * stats. Payload bytes are gone before the groupBy shuffle. */
  def decodeStats(spark: SparkSession, sfDir: String): DataFrame = {
    decodeFeatures(mediaFromDocuments(spark, sfDir)).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("width")), 4).as("avg_w"),
        round(avg(col("height")), 4).as("avg_h"),
        sum(col("n_frames")).as("sum_frames"),
        sum(col("n_bytes")).as("sum_bytes"))
      .orderBy(col("kind"))
  }
}
