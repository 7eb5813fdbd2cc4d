package graft

import org.apache.spark.sql.functions._
import graft.multimodal.JvmMedia
import graft.sources.LoaderFixtures

/** Real JDK-codec multimodal path: PNG decode, perceptual hashes,
  * near-dup band join, resize, WAV PCM parse. */
class JvmMediaSpec extends SparkSpec {

  private def mediaDf(files: Seq[(Long, Array[Byte])]) =
    spark.createDataFrame(files).toDF("doc_id", "payload")

  private lazy val images = mediaDf(
    LoaderFixtures.imageFiles.zipWithIndex.map { case ((_, b), i) => (i.toLong, b) })

  test("decodeImages: real PNG dims, identical images share hashes") {
    val rows = JvmMedia.decodeImages(spark, images).collect()
      .map(r => r.doc_id -> r).toMap
    assert(rows.values.forall(r => r.width == 32 && r.height == 24))
    // img_0 and img_5 are byte-identical
    assert(rows(0L).a_hash == rows(5L).a_hash)
    assert(rows(0L).d_hash == rows(5L).d_hash)
    assert(rows(0L).mean_lum == rows(5L).mean_lum)
    // different seeds give different hashes
    assert(rows(0L).d_hash != rows(2L).d_hash)
    assert(rows(0L).hist.sum > 0.999 && rows(0L).hist.sum < 1.001)
  }

  test("imageNearDups: copy families found, distinct seeds are far apart") {
    val decoded = JvmMedia.decodeImages(spark, images).toDF()
    val pairs = JvmMedia.imageNearDups(decoded, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((0L, 5L)) && pairs((0L, 5L)) == 0) // exact copy
    assert(pairs.contains((0L, 1L))) // one hot pixel
    assert(pairs.contains((2L, 3L)))
    // no cross-family pair
    assert(!pairs.keys.exists { case (a, b) =>
      Set(a, b).subsetOf(Set(0L, 1L, 5L, 2L, 3L)) &&
        Set(a, b).intersect(Set(0L, 1L, 5L)).nonEmpty &&
        Set(a, b).intersect(Set(2L, 3L)).nonEmpty
    })
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("imageNearDups bucket cap drops a degenerate identical-image flood") {
    // 8 byte-identical images (one giant dHash bucket) + one near-dup
    // pair; seeds 2 and 5 are dHash-far (the seed term is a near-constant
    // shift, so SOME seed pairs collide — 1/2/5 are verified-far in the
    // fixture family test above)
    val flood = (0L until 8L).map(i => (i, LoaderFixtures.pngBytes(2)))
    val pair = Seq(
      (100L, LoaderFixtures.pngBytes(5)),
      (101L, LoaderFixtures.pngBytes(5, hot = Seq((5, 5)))))
    val decoded = JvmMedia.decodeImages(spark, mediaDf(flood ++ pair)).toDF()
    val uncapped = JvmMedia.imageNearDups(decoded).collect()
    assert(uncapped.length == 8 * 7 / 2 + 1)
    val capped = JvmMedia.imageNearDups(decoded, maxBucketSize = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L))) // flood dropped, real pair kept
  }

  test("resizeImages emits decodable PNGs at the target size") {
    val out = JvmMedia.resizeImages(spark, images.limit(2), 8, 6).collect()
    out.foreach { r =>
      val img = JvmMedia.readImage(r.getAs[Array[Byte]](1))
      assert(img.getWidth == 8 && img.getHeight == 6)
    }
  }

  test("parseWav: rate, duration and sine RMS of the committed tone") {
    val wav = mediaDf(Seq((7L, LoaderFixtures.wavBytes)))
    val row = JvmMedia.decodeWavs(spark, wav).collect()(0)
    assert(row.sample_rate == 8000 && row.channels == 1 && row.bits == 16)
    assert(row.n_samples == 4000)
    assert(math.abs(row.duration_s - 0.5) < 1e-12)
    assert(math.abs(row.rms - 0.5 / math.sqrt(2.0)) < 1e-3)
  }

  test("goertzelPower: energy concentrates at the driven frequency") {
    val rate = 8000
    val s = Array.tabulate(1024)(i =>
      0.5 * math.sin(2 * math.Pi * 440.0 * i / rate))
    val at440 = JvmMedia.goertzelPower(s, 0, 1024, 440.0, rate)
    val at1000 = JvmMedia.goertzelPower(s, 0, 1024, 1000.0, rate)
    assert(at440 > 1000 * at1000, s"440=$at440 1000=$at1000")
  }

  test("spectralFingerprint is gain-invariant; distinct spectra differ") {
    val rate = 8000
    def mix(fa: Seq[(Double, Double)]) = Array.tabulate(4000)(i =>
      fa.map { case (f, a) => a * math.sin(2 * math.Pi * f * i / rate) }.sum)
    val base = JvmMedia.spectralFingerprint(mix(Seq(440.0 -> 0.5, 880.0 -> 0.25)), rate)
    val gained = JvmMedia.spectralFingerprint(mix(Seq(440.0 -> 0.25, 880.0 -> 0.125)), rate)
    val other = JvmMedia.spectralFingerprint(mix(Seq(660.0 -> 0.5, 1320.0 -> 0.25)), rate)
    assert(base.sameElements(gained)) // halved gain keeps every sign bit
    assert(!base.sameElements(other))
  }

  test("audioNearDups: re-gained clip matches, distinct spectrum does not") {
    val clips = mediaDf(LoaderFixtures.audioClipFiles.zipWithIndex.map {
      case ((_, b), i) => (i.toLong, b)
    })
    val fps = JvmMedia.audioFingerprints(spark, clips).toDF()
    val pairs = JvmMedia.audioNearDups(fps)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("parseWav: corrupt negative chunk size fails instead of looping forever") {
    val bad = LoaderFixtures.wavBytes.clone()
    // fmt chunk size field lives at byte 16; -8 would stall pos forever
    java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, -8)
    val e = intercept[IllegalArgumentException](JvmMedia.parseWav(bad))
    assert(e.getMessage.contains("negative size"))
  }

  test("parseWav: data chunk ordered before fmt still decodes") {
    val rate = 8000; val n = 4
    val b = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("ASCII"))
    b.put("data".getBytes("ASCII")).putInt(2 * n)
    Seq[Short](0, 16384, 0, -16384).foreach(b.putShort)
    b.put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
    val (r, ch, bits, samples) = JvmMedia.parseWav(b.array())
    assert(r == rate && ch == 1 && bits == 16)
    assert(samples.toSeq == Seq(0.0, 0.5, 0.0, -0.5))
  }

  test("parseWav: data chunk overrunning the file fails loudly") {
    val bad = LoaderFixtures.wavBytes.clone()
    // data chunk size field lives at byte 40; claim more than the file has
    java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 1 << 28)
    val e = intercept[IllegalArgumentException](JvmMedia.parseWav(bad))
    assert(e.getMessage.contains("overruns"))
  }

  private lazy val videos = mediaDf(
    LoaderFixtures.videoFiles.zipWithIndex.map { case ((_, b), i) => (i.toLong, b) })

  test("parseAvi: container metadata and per-frame JPEG payloads") {
    val v = JvmMedia.parseAvi(LoaderFixtures.videoFiles.head._2)
    assert(v.width == 32 && v.height == 24)
    assert(v.fps == 10.0 && v.handler == "MJPG")
    assert(v.frames.length == 12)
    // frame 7 repeats frame 0 exactly (same (seed, hot) args)
    assert(v.frames(7).toSeq == v.frames(0).toSeq)
    // every frame payload is a decodable JPEG at the stream dims
    v.frames.foreach { f =>
      val img = JvmMedia.readImage(f)
      assert(img.getWidth == 32 && img.getHeight == 24)
    }
  }

  test("decodeVideos: fps, frame count and duration per clip") {
    val rows = JvmMedia.decodeVideos(spark, videos).collect()
      .map(r => r.doc_id -> r).toMap
    assert(rows(0L).n_frames == 12 && rows(0L).fps == 10.0)
    assert(math.abs(rows(0L).duration_s - 1.2) < 1e-12)
    assert(rows(1L).n_frames == 6 && rows(1L).fps == 5.0)
    assert(rows(1L).handler == "MJPG")
  }

  test("sampleVideoFrames + sceneCuts: the hard cut at frame 8 is found") {
    val frames = JvmMedia.sampleVideoFrames(spark, videos, stride = 1).toDF()
    val cuts = JvmMedia.sceneCuts(frames).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx")) ->
        r.getAs[Boolean]("is_cut")).toMap
    assert(cuts((0L, 8)), "seed change at frame 8 must register as a cut")
    // within-scene hot-pixel drift and the clip_1 pan are not cuts
    assert(cuts.count { case ((d, _), c) => d == 0L && c } == 1)
    assert(!cuts.exists { case ((d, _), c) => d == 1L && c })
    // duplicate frames hash identically
    val h = frames.where(col("doc_id") === 0).collect()
      .map(r => r.getAs[Int]("frame_idx") -> r.getAs[Long]("d_hash")).toMap
    assert(h(0) == h(7))
  }

  test("sampleVideoFrames stride decodes only sampled positions") {
    val idx = JvmMedia.sampleVideoFrames(spark, videos, stride = 3).toDF()
      .where(col("doc_id") === 0)
      .select("frame_idx").collect().map(_.getInt(0)).sorted.toSeq
    assert(idx == Seq(0, 3, 6, 9))
  }

  test("clipNearDups: the scene-A re-cut matches clip_0, clip_1 nothing") {
    // stride=1: scene A hashes to 2 distinct dHashes, scene B to 1, so
    // clip_0 holds 3 and clip_2 (scene A only) 2 — a strict subset:
    // shared=2, overlap = 2/min(3,2) = 1.0. clip_1 shares nothing.
    val frames = JvmMedia.sampleVideoFrames(spark, videos, stride = 1).toDF()
    val nd = JvmMedia.clipNearDups(frames).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toSeq
    assert(nd == Seq((0L, 2L, 2L, 3L, 2L, 1.0)))
  }

  test("parseAvi: corrupt chunk size fails instead of looping forever") {
    val bad = LoaderFixtures.videoFiles.head._2.clone()
    // first chunk inside AVI body: LIST hdrl size field at byte 16
    java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, -8)
    val e = intercept[IllegalArgumentException](JvmMedia.parseAvi(bad))
    assert(e.getMessage.contains("corrupt"))
  }

  test("non-image payload fails loudly, not silently") {
    intercept[org.apache.spark.SparkException] {
      JvmMedia.decodeImages(spark,
        mediaDf(Seq((1L, Array[Byte](1, 2, 3))))).collect()
    }
  }
}
