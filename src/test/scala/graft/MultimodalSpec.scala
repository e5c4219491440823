package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  /** A real in-memory PNG: w×h RGB filled by `pixel(x, y)`. */
  private def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out), "JDK PNG writer present")
    out.toByteArray
  }

  test("real decode: ImageIO path reads actual PNG rasters behind the MediaDecoder trait") {
    import spark.implicits._
    val records = Seq(
      Multimodal.MediaRecord(1L, "image", png(37, 21)((_, _) => 0x808080), 37, 21),
      Multimodal.MediaRecord(2L, "image", png(5, 9)((_, _) => 0xffffff), 5, 9),
      // corrupt payload: quarantines to the fallback decoder, not a crash
      Multimodal.MediaRecord(3L, "image", Array.fill[Byte](100)(7), 0, 0),
      // non-image kind: falls back regardless of payload
      Multimodal.MediaRecord(4L, "audio", png(4, 4)((_, _) => 0), 0, 0))
    val ds = spark.createDataset(records)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
    val got = Multimodal.decodeFeatures(ds, new Multimodal.ImageIODecoder())
      .collect().map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(got(1L) == ((37, 21)) && got(2L) == ((5, 9)),
      "real rasters must report their actual dimensions")
    val stub = Multimodal.StubDecoder.decode(records(2))
    assert(got(3L) == ((stub.width, stub.height)),
      "undecodable bytes take the deterministic fallback")
    val stubAudio = Multimodal.StubDecoder.decode(records(3))
    assert(got(4L) == ((stubAudio.width, stubAudio.height)))
  }

  test("real decode: aHash over ImageIO rasters separates halves and survives recompression wobble") {
    import spark.implicits._
    // left half black, right half white -> after the 8x8 shrink, four
    // left columns sit below the mean (bit 0), four right above (bit 1)
    val split = png(64, 64)((x, _) => if (x < 32) 0x000000 else 0xffffff)
    // same image with a single corner pixel flipped: a near-dup whose
    // thumbnail moves at most a couple of bits
    val wobble = png(64, 64)((x, y) =>
      if (x == 0 && y == 0) 0xffffff else if (x < 32) 0x000000 else 0xffffff)
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "image", split, 64, 64),
      Multimodal.MediaRecord(2L, "image", wobble, 64, 64),
      Multimodal.MediaRecord(3L, "image", Array.fill[Byte](8)(1), 0, 0)))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRecord])
    val hs = Multimodal.imageHashes(ds, raster = Multimodal.ImageIORaster)
      .collect().map(h => h.media_id -> h.phash).toMap
    assert(!hs.contains(3L), "undecodable payloads are quarantined, not hashed")
    val rows = hs(1L).grouped(8).toSeq
    assert(rows.forall(_ == "00001111"),
      s"half-split image must hash to per-row 00001111, got ${hs(1L)}")
    val dist = hs(1L).zip(hs(2L)).count(t => t._1 != t._2)
    assert(dist <= 3, s"one-pixel wobble must stay within near-dup Hamming range, got $dist")
  }

  test("X145: banded phash pairs equal the all-pairs Hamming join") {
    val hashes = Multimodal.imageHashes(
        Multimodal.mediaFromDocuments(spark, sf)).toDF()
      .select("media_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = Multimodal.phashNearDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expect = (for {
      (a, pa) <- hashes; (b, pb) <- hashes if a < b
      d = pa.zip(pb).count(t => t._1 != t._2).toLong if d <= 3
    } yield (a, b) -> d).toMap
    assert(got == expect)
    assert(got.nonEmpty, "stub corpus should contain near-identical images")
  }

  test("X136: pair stats match a driver-side join + norm recompute") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val got = Multimodal.pairStats(docs, emb).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val dmeta = docs.select("doc_id", "lang", "text", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    val pairs = emb.select("vec_id", "label", "embedding").collect().flatMap { r =>
      val id = r.getLong(0)
      dmeta.get(id).filter(_._3 >= 40).map { case (lang, text, _) =>
        val nTok = text.toLowerCase.split("\\s+").count(_.nonEmpty).toLong
        val vec = r.getSeq[Float](2)
        val norm = BigDecimal(math.sqrt(
          vec.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        ((lang, r.getInt(1).toLong), nTok, norm)
      }
    }
    val expect = pairs.groupBy(_._1).view.mapValues { ps =>
      val toks = ps.map(_._2)
      val avg = (ps.map(_._3).sum / ps.size).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      (ps.size.toLong, toks.sum, toks.max, avg)
    }.toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    expect.foreach { case (k, (n, st, mt, avg)) =>
      assert(got(k)._1 == n && got(k)._2 == st && got(k)._3 == mt)
      assert(math.abs(got(k)._4 - avg) < 2e-6, s"cohort $k")
    }
  }

  test("L12: decode pipeline is deterministic and preserves cardinality") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val n = media.count()
    val f1 = Multimodal.decodeFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeFeatures(media, batchSize = 7).collect().sortBy(_.media_id)
    assert(f1.length == n)
    assert(f1.toSeq == f2.toSeq, "batch size must not change results")
  }

  test("L12: stub decoder features match the documented derivation") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(spark, sf))
      .collect().map(f => f.media_id -> f).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
    docs.foreach { r =>
      val id = r.getLong(0)
      val len = r.getString(1).getBytes("UTF-8").length
      val f = feats(id)
      assert(f.width == 16 + (len % 317))
      assert(f.height == 16 + ((len * 7) % 211))
      assert(f.n_bytes == len.toLong)
      val expectedKind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(f.kind == expectedKind)
      assert(f.n_frames == (if (expectedKind == "video") 1 + (len % 5) else 1))
    }
  }

  test("L12: audio amplitude stats match a byte-level recompute; only audio rows") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val got = Multimodal.audioFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    val audio = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .filter(_.getLong(0) % 3 == 1)
    assert(got.size == audio.length, "exactly the audio-kind rows")
    audio.foreach { r =>
      val bytes = r.getString(1).getBytes("UTF-8").map(_ & 0xff)
      val f = got(r.getLong(0))
      assert(f.n_samples == bytes.length.toLong)
      assert(f.duration_ms == bytes.length.toLong * 1000 / 16000)
      assert(math.abs(f.mean_amp - bytes.sum.toDouble / bytes.length) < 1e-12)
      assert(math.abs(f.clip_frac - bytes.count(_ >= 120).toDouble / bytes.length) < 1e-12)
    }
    // batch size must not change results
    val rebatched = Multimodal.audioFeatures(media, batchSize = 7).collect()
      .map(f => f.media_id -> f).toMap
    assert(rebatched == got)
  }

  test("L12: frame sampling fans out videos deterministically with resized dims") {
    val media = Multimodal.mediaFromDocuments(spark, sf)
    val frames = Multimodal.sampleFrames(media, everyN = 2).collect()
    val feats = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    // every media row contributes ceil(n_frames / 2) frames
    val expectedCounts = feats.view.mapValues(f => (f.n_frames + 1) / 2).toMap
    val gotCounts = frames.groupBy(_.media_id).view.mapValues(_.length).toMap
    assert(gotCounts == expectedCounts)
    frames.foreach { fr =>
      assert(fr.width == 64 && fr.height == 64)
      assert(fr.frame_idx % 2 == 0)
    }
    // determinism across batch sizes
    val again = Multimodal.sampleFrames(media, everyN = 2, batchSize = 7).collect()
    assert(frames.sortBy(f => (f.media_id, f.frame_idx)).toSeq ==
           again.sortBy(f => (f.media_id, f.frame_idx)).toSeq)
  }

  test("X118: aHash matches a byte-level recompute; short payloads skipped") {
    import spark.implicits._
    def ahash(bytes: Array[Byte]): String = {
      val px = bytes.take(64).map(_ & 0xff)
      val mean = px.sum / 64.0
      px.map(v => if (v >= mean) '1' else '0').mkString
    }
    val hashes = Multimodal.imageHashes(Multimodal.mediaFromDocuments(spark, sf))
      .collect().map(h => h.media_id -> h.phash).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val images = docs.filter(_._1 % 3 == 0)
    images.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      if (bytes.length >= 64)
        assert(hashes(id) == ahash(bytes), s"media $id hash mismatch")
      else assert(!hashes.contains(id), s"short payload $id must be skipped")
    }
    assert(hashes.keySet.subsetOf(images.map(_._1).toSet),
      "only image-kind payloads are hashed")
    assert(hashes.nonEmpty)
    // entry rollup: groups partition the hashed ids, keeper is min
    val entry = Multimodal.imagePHash(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(entry.map(_._2).sum == hashes.size)
    entry.foreach { case (ph, n, keeper) =>
      val members = hashes.filter(_._2 == ph).keys
      assert(members.size == n && members.min == keeper)
    }
  }

  test("quarantine is total: readImage never throws on adversarial bytes") {
    // ImageIO readers raise RuntimeExceptions (not just IOException) on
    // malformed payloads — a valid magic number followed by garbage or
    // truncation is the classic trigger. The quarantine contract is that
    // EVERY such payload maps to None instead of crashing the task.
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val jpegMagic = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
    val gifMagic = "GIF89a".getBytes("ASCII")
    val bmpMagic = Array[Byte]('B', 'M')
    val real = png(16, 16)((x, y) => (x * 16 + y) * 0x010101)
    val adversarial: Seq[Array[Byte]] =
      Seq(pngMagic, jpegMagic, gifMagic, bmpMagic).flatMap { magic =>
        Seq(
          magic, // magic only
          magic ++ Array.fill[Byte](64)(0), // zero body
          magic ++ Array.fill[Byte](256)(0xff.toByte), // saturated body
          magic ++ Array.tabulate[Byte](512)(i => (i * 31 + 7).toByte)) // pseudo-random body
      } ++ Seq(
        Array.emptyByteArray,
        real.take(real.length / 2), // truncated real PNG
        real.take(24), // header cut mid-IHDR
        real.updated(20, 0xff.toByte).updated(21, 0xff.toByte)) // corrupted dims
    adversarial.foreach { payload =>
      val r = Multimodal.readImage(payload) // must not throw, ever
      assert(r.isEmpty || r.get.getWidth > 0) // decoded-or-quarantined, no third state
    }
    assert(Multimodal.readImage(real).exists(i => i.getWidth == 16 && i.getHeight == 16))
  }

  test("L12: payload dies at feature extraction; aggregation sees only features") {
    val plan = Multimodal.decodeStats(spark, sf).queryExecution.optimizedPlan.toString.toLowerCase
    val decodeAt = plan.indexOf("mappartitions")
    assert(decodeAt >= 0, "decode must run as mapPartitions")
    // everything above the decode (aggregate and friends) is payload-free:
    // the wide binary column exists only below the mapPartitions boundary
    val above = plan.substring(0, decodeAt)
    assert(!above.contains("payload"),
      s"payload must not flow past the decode boundary:\n$plan")
  }
}
