package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** REAL multimodal decode kernels on the JDK's own codecs — no external
  * libraries: `javax.imageio` (PNG/JPEG/BMP/GIF), the RIFF/WAVE PCM
  * layout, and MJPEG-in-AVI video (hand-parsed RIFF/AVI container whose
  * frame payloads are JPEGs `javax.imageio` decodes). This replaces
  * [[Multimodal.FakeCodec]] for every format expressible with JDK codecs;
  * only inter-frame-compressed video (H.264 etc.) has no pure-JVM path.
  *
  * Reference surface: the training-data pipeline's image dedup /
  * preprocess stages (decode → perceptual hash → near-dup band join →
  * resize), the same shape as the text MinHash path ([[graft.dedup.Dedup]])
  * with dHash bands in place of minhash bands.
  *
  * Scale design: decode runs in `mapPartitions` (one codec context per
  * partition, rows streamed); hashes/features are a few doubles per image
  * — the heavy payload column never shuffles. Near-dup candidates come
  * from a band join on 16-bit slices of the 64-bit dHash (Hamming ≤ 3
  * per 4-band pigeonhole ⇒ at least one identical band), verified by
  * exact Hamming distance — fan-out is band-bucket occupancy, corpus².
  */
object JvmMedia {

  final case class ImageRow(
      doc_id: Long,
      width: Int,
      height: Int,
      a_hash: Long,
      d_hash: Long,
      mean_lum: Double,
      hist: Array[Double])

  final case class WavRow(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_samples: Int,
      duration_s: Double,
      rms: Double)

  // ---- pure kernels (bytes in, numbers out — unit-testable off-Spark)

  def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable image payload")
    img
  }

  /** Nearest-neighbor luminance downsample to (w, h) — deterministic
    * across JVMs (no Graphics2D filtering involved). */
  def grayDownsample(
      img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Double] = {
    val out = new Array[Double](w * h)
    var y = 0
    while (y < h) {
      val sy = y * img.getHeight / h
      var x = 0
      while (x < w) {
        val sx = x * img.getWidth / w
        val rgb = img.getRGB(sx, sy)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        out(y * w + x) = 0.299 * r + 0.587 * g + 0.114 * b
        x += 1
      }
      y += 1
    }
    out
  }

  /** Average hash: 8×8 gray, bit set where pixel > mean. */
  def aHash(img: java.awt.image.BufferedImage): Long = {
    val px = grayDownsample(img, 8, 8)
    val mean = px.sum / 64.0
    px.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v > mean) acc | (1L << i) else acc
    }
  }

  /** Difference hash: 9×8 gray, bit set where left < right neighbor. */
  def dHash(img: java.awt.image.BufferedImage): Long = {
    val px = grayDownsample(img, 9, 8)
    var acc = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (px(y * 9 + x) < px(y * 9 + x + 1)) acc |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    acc
  }

  /** 8-bin luminance histogram, normalized. */
  def lumHistogram(img: java.awt.image.BufferedImage): Array[Double] = {
    val hist = new Array[Double](8)
    val px = grayDownsample(img, math.min(img.getWidth, 64),
      math.min(img.getHeight, 64))
    px.foreach(v => hist(math.min(7, (v / 32).toInt)) += 1.0)
    hist.map(_ / px.length)
  }

  /** Nearest-neighbor resize re-encoded as PNG (deterministic bytes for a
    * given JDK encoder — the preprocessing op of an image pipeline). */
  def resizePng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = readImage(bytes)
    val dst = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val sy = y * src.getHeight / h
      var x = 0
      while (x < w) {
        dst.setRGB(x, y, src.getRGB(x * src.getWidth / w, sy))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }

  /** Minimal RIFF/WAVE PCM parser (the public WAV layout: RIFF header,
    * `fmt ` chunk with rate/channels/bits, `data` chunk with interleaved
    * little-endian PCM). */
  def parseWav(bytes: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 44 && new String(bytes, 0, 4, "ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "ASCII") == "WAVE", "not a RIFF/WAVE file")
    var pos = 12
    var rate = 0; var channels = 0; var bits = 0
    var dataPos = -1; var dataSize = -1
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "ASCII")
      val size = b.getInt(pos + 4)
      // a corrupt negative size would make pos stall or move backwards —
      // fail loudly instead of looping forever on an executor
      require(size >= 0, s"corrupt WAV chunk '$id' at $pos: negative size $size")
      if (id == "fmt ") {
        channels = b.getShort(pos + 10)
        rate = b.getInt(pos + 12)
        bits = b.getShort(pos + 22)
      } else if (id == "data") {
        dataPos = pos + 8; dataSize = size
      }
      pos += 8 + size + (size & 1)
    }
    require(rate > 0 && dataPos >= 0, "missing fmt/data chunk")
    // deferred until both chunks are seen: a data chunk ordered before
    // fmt must not trip the bits check while bits is still 0
    require(bits == 16, s"only PCM s16le supported, got $bits-bit")
    require(dataPos + dataSize <= bytes.length,
      s"data chunk (size $dataSize at $dataPos) overruns file of ${bytes.length} bytes")
    val samples =
      Array.tabulate(dataSize / 2)(i => b.getShort(dataPos + 2 * i) / 32768.0)
    (rate, channels, bits, samples)
  }

  /** Parsed MJPEG AVI: stream metadata + the raw JPEG bytes per frame. */
  final case class AviVideo(
      width: Int,
      height: Int,
      fps: Double,
      handler: String,
      frames: IndexedSeq[Array[Byte]])

  /** Minimal RIFF/AVI parser for MJPEG video (the public AVI 1.0 layout:
    * LIST hdrl{avih, LIST strl{strh, strf}}, LIST movi{00dc/00db frame
    * chunks, possibly nested in LIST rec}, optional idx1 — frame payloads
    * are plain JPEGs for the MJPG handler). Walks the chunk tree
    * iteratively; fails loudly on corrupt sizes like [[parseWav]]. */
  def parseAvi(bytes: Array[Byte]): AviVideo = {
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 24 && new String(bytes, 0, 4, "ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "ASCII") == "AVI ", "not a RIFF/AVI file")
    var width = 0; var height = 0
    var scale = 0; var rate = 0; var usPerFrame = 0
    var handler = ""
    var sawVids = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val id = new String(bytes, pos, 4, "ASCII")
        val size = b.getInt(pos + 4)
        require(size >= 0 && pos + 8 + size <= bytes.length,
          s"corrupt AVI chunk '$id' at $pos: size $size")
        if (id == "LIST") walk(pos + 12, pos + 8 + size)
        else if (id == "avih") {
          usPerFrame = b.getInt(pos + 8)
          width = b.getInt(pos + 40)
          height = b.getInt(pos + 44)
        } else if (id == "strh") {
          val fccType = new String(bytes, pos + 8, 4, "ASCII")
          if (fccType == "vids") {
            sawVids = true
            handler = new String(bytes, pos + 12, 4, "ASCII")
            scale = b.getInt(pos + 28)
            rate = b.getInt(pos + 32)
          }
        } else if (isFrameId(id)) {
          frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size)
        }
        pos += 8 + size + (size & 1)
      }
    }
    walk(12, bytes.length)
    require(sawVids, "no vids stream header")
    require(width > 0 && height > 0, "missing avih dimensions")
    val fps =
      if (scale > 0 && rate > 0) rate.toDouble / scale
      else { require(usPerFrame > 0, "no frame rate"); 1e6 / usPerFrame }
    AviVideo(width, height, fps, handler, frames.toIndexedSeq)
  }

  // ---- Spark stages

  /** Decode stage over (doc_id, payload) image rows: one pass, narrow. */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = readImage(bytes)
        ImageRow(id, img.getWidth, img.getHeight, aHash(img), dHash(img),
          grayDownsample(img, 8, 8).sum / 64.0, lumHistogram(img))
      })
  }

  /** Image near-duplicate pairs: 4×16-bit dHash band join (pigeonhole:
    * Hamming ≤ 3 guarantees a shared band) + exact Hamming verify.
    *
    * `maxBucketSize` caps degenerate buckets exactly like the text path
    * ([[graft.dedup.Dedup.lshCandidatePairs]]): a corpus of near-black
    * thumbnails shares one dHash and would otherwise explode the
    * self-join quadratically; buckets above the cap are dropped. 0 = no
    * cap. */
  def imageNearDups(
      decoded: DataFrame,
      maxHamming: Int = 3,
      maxBucketSize: Int = 0): DataFrame = {
    val bands0 = decoded.select(col("doc_id"), col("d_hash"))
      .select(col("doc_id"), col("d_hash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_key", expr("(d_hash >> (band * 16)) & 65535"))
    val bands =
      if (maxBucketSize <= 0) bands0
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("band", "band_key")
        bands0.withColumn("_bsz", count(lit(1)).over(w))
          .where(col("_bsz") <= maxBucketSize)
          .drop("_bsz")
      }
    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.d_hash").as("h_a"), col("b.d_hash").as("h_b"))
      .distinct()
    pairs
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Resize stage: payload → resized PNG payload, narrow mapPartitions. */
  def resizeImages(
      spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, resizePng(bytes, w, h)) })
      .toDF("doc_id", "payload")
  }

  final case class VideoRow(
      doc_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      fps: Double,
      duration_s: Double,
      handler: String)

  final case class FrameRow(
      doc_id: Long,
      frame_idx: Int,
      d_hash: Long,
      mean_lum: Double)

  /** Video metadata decode over (doc_id, payload) AVI rows: container
    * parse only (no frame decode) — one pass, narrow. */
  def decodeVideos(spark: SparkSession, media: DataFrame): Dataset[VideoRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val v = parseAvi(bytes)
        VideoRow(id, v.width, v.height, v.frames.length, v.fps,
          v.frames.length / v.fps, v.handler)
      })
  }

  /** Frame sampling with REAL decode: every `stride`-th frame's JPEG is
    * decoded and hashed (the keyframe-extraction stage of a video
    * pipeline). Narrow mapPartitions; only sampled frames are decoded, and
    * the heavy payload never shuffles — downstream ops see a few numbers
    * per frame. */
  def sampleVideoFrames(
      spark: SparkSession, media: DataFrame, stride: Int = 1): Dataset[FrameRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val v = parseAvi(bytes)
        (0 until v.frames.length by stride).iterator.map { i =>
          val img = readImage(v.frames(i))
          FrameRow(id, i, dHash(img), grayDownsample(img, 8, 8).sum / 64.0)
        }
      })
  }

  /** Shot-boundary detection over sampled frame hashes: a cut is a frame
    * whose dHash Hamming distance to the previous sampled frame exceeds
    * `threshold`. Declarative lag window per video — single shuffle on
    * doc_id, no payload involved. */
  def sceneCuts(frames: DataFrame, threshold: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("prev_hash", lag(col("d_hash"), 1).over(w))
      .withColumn("hamming",
        when(col("prev_hash").isNull, lit(null))
          .otherwise(expr("bit_count(d_hash ^ prev_hash)")))
      .withColumn("is_cut",
        coalesce(col("hamming") > threshold, lit(false)))
      .drop("prev_hash")
  }

  /** Clip-level near-duplicate detection over sampled frame hashes: two
    * videos are near-dups when the overlap of their distinct frame-hash
    * SETS (shared ÷ smaller set) reaches `minOverlap` — the re-encode /
    * re-cut case where frames hash identically. The join keys on the
    * 64-bit hash itself (exact-match banding), so candidate pairs are
    * bounded by genuinely shared content, never all-pairs; payloads are
    * long gone by this stage (a few longs per frame). */
  def clipNearDups(frames: DataFrame, minOverlap: Double = 0.5): DataFrame = {
    val f = frames.select(col("doc_id"), col("d_hash")).distinct()
    val counts = f.groupBy("doc_id").agg(count(lit(1)).as("n"))
    f.as("a").join(f.as("b"),
        col("a.d_hash") === col("b.d_hash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("overlap", col("shared") / least(col("n_a"), col("n_b")))
      .where(col("overlap") >= minOverlap)
      .select("doc_a", "doc_b", "shared", "n_a", "n_b", "overlap")
  }

  /** Decode stage over (doc_id, payload) WAV rows. */
  def decodeWavs(spark: SparkSession, media: DataFrame): Dataset[WavRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (rate, channels, bits, samples) = parseWav(bytes)
        val n = samples.length / math.max(1, channels)
        val rms = math.sqrt(samples.map(s => s * s).sum / math.max(1, samples.length))
        WavRow(id, rate, channels, bits, n, n.toDouble / rate, rms)
      })
  }

  // ---- audio fingerprinting (spectral-band signature, Goertzel DFT) ----

  final case class AudioFpRow(doc_id: Long, frame_idx: Int, fp: Long)

  /** Signal power at one DFT bin via the Goertzel recurrence — O(len)
    * per frequency with no FFT library (pure JVM arithmetic; the
    * standard single-bin DFT used by DTMF detectors). */
  def goertzelPower(
      samples: Array[Double], start: Int, len: Int,
      freq: Double, rate: Int): Double = {
    val k = math.round(len * freq / rate).toInt
    val w = 2 * math.Pi * k / len
    val coeff = 2 * math.cos(w)
    var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < len) {
      val s0 = samples(start + i) + coeff * s1 - s2
      s2 = s1; s1 = s0; i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** Per-frame 16-bit spectral fingerprints: 17 log-spaced band energies
    * (200 Hz → 3 kHz), bit m set when E(m) > E(m+1) — the within-frame
    * half of the Haitsma–Kalker (2002) sign-feature fingerprint. Sign
    * comparisons make the signature invariant to gain (a re-encoded or
    * re-normalized copy keeps every bit, since positive scaling
    * preserves all energy orderings) while distinct spectral content
    * flips the band ordering. */
  def spectralFingerprint(
      samples: Array[Double], rate: Int,
      frameLen: Int = 256, hop: Int = 128, nBands: Int = 17): Array[Long] = {
    val nFrames = math.max(0, (samples.length - frameLen) / hop + 1)
    val freqs = Array.tabulate(nBands)(m =>
      200.0 * math.pow(15.0, m.toDouble / (nBands - 1)))
    Array.tabulate(nFrames) { n =>
      val e = freqs.map(f => goertzelPower(samples, n * hop, frameLen, f, rate))
      var fp = 0L
      var m = 0
      while (m < nBands - 1) {
        if (e(m) > e(m + 1)) fp |= (1L << m)
        m += 1
      }
      fp
    }
  }

  /** Fingerprint stage over (doc_id, payload) WAV rows — the audio
    * analog of [[sampleVideoFrames]]: mapPartitions decode, one row per
    * frame, payload bytes never shuffle. */
  def audioFingerprints(spark: SparkSession, media: DataFrame): Dataset[AudioFpRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val (rate, channels, _, samples) = parseWav(bytes)
        // mixdown: average interleaved channels (mono fixtures pass through)
        val mono =
          if (channels <= 1) samples
          else Array.tabulate(samples.length / channels)(i =>
            (0 until channels).map(c => samples(i * channels + c)).sum / channels)
        spectralFingerprint(mono, rate).zipWithIndex.map {
          case (fp, idx) => AudioFpRow(id, idx, fp)
        }
      })
  }

  /** Audio near-duplicates by shared frame fingerprints — same overlap
    * join as [[clipNearDups]] with spectral fps in place of frame
    * dHashes: candidates come from an equality join on the fp value
    * (hash-partitioned, fan-out = bucket occupancy), overlap = shared
    * distinct fps / smaller clip's distinct count. */
  def audioNearDups(fps: DataFrame, minOverlap: Double = 0.5): DataFrame = {
    val sets = graft.Caching.cache(fps.select("doc_id", "fp").distinct())
    val counts = sets.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sets.as("a")
      .join(sets.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("overlap", col("shared") / least(col("n_a"), col("n_b")))
      .where(col("overlap") >= minOverlap)
      .select("doc_a", "doc_b", "shared", "n_a", "n_b", "overlap")
  }
}
