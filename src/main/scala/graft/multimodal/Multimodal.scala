package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with typed metadata, plus decode / feature-extract
  * / frame-sample stages.
  *
  * REAL decode lives in [[JvmMedia]] (JDK-built-in codecs: PNG/JPEG/BMP/
  * GIF via javax.imageio, RIFF/WAVE PCM, MJPEG-in-AVI video with
  * per-frame decode + shot detection) — perceptual hashes, near-dup band
  * join, resize, audio stats, frame sampling, all gate-checked over
  * committed fixtures. [[FakeCodec]] remains ONLY as the documented
  * integration contract for codecs the JVM cannot host (inter-frame
  * video such as H.264): a clearly-marked deterministic stand-in whose
  * surrounding shape — schema, typed `Dataset` batch shape, the
  * `mapPartitions` one-codec-per-partition pattern, narrow shuffle-free
  * feature extraction — is identical to the real [[JvmMedia]] stages.
  */
object Multimodal {

  /** A media row: opaque payload + media kind. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded metadata + features (what a real codec would emit). */
  final case class DecodedRow(
      doc_id: Long,
      media_type: String,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Double])

  /** STUB codec: deterministic fake "decode" deriving dims from payload
    * bytes and an 8-bin byte histogram as the feature vector. Replace the
    * body with a real image/audio library in production — the signature
    * (bytes in, dims + float features out) is the real contract. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Double]) = {
      val len = payload.length
      val width = 16 + (len % 64)
      val height = 16 + ((len * 7) % 64)
      val nFrames = 1 + len / 100
      val hist = new Array[Double](8)
      payload.foreach(b => hist((b & 0xff) / 32) += 1.0)
      val features = if (len == 0) hist else hist.map(_ / len)
      (width, height, nFrames, features)
    }
  }

  /** Attach an opaque binary payload column (here: the UTF-8 text bytes as
    * a stand-in payload) + typed metadata. In a real pipeline the payload
    * column comes straight from the source (e.g. parquet BinaryType). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("image/fake").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .withColumn("byte_len", octet_length(col("payload")))

  /** Decode stage: typed mapPartitions — one codec per partition, rows
    * streamed through it (the batch-shaped UDF pattern; swap FakeCodec
    * for a real library without touching the plan). Narrow: no shuffle. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media
      .select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition codec init would go here (expensive native state)
        rows.map { r =>
          val (w, h, f, feat) = FakeCodec.decode(r.payload)
          DecodedRow(r.doc_id, r.media_type, r.payload.length, w, h, f, feat)
        }
      }
  }

  /** Frame sampling: positions 0, stride, 2·stride … over n_frames —
    * declarative (sequence + explode), no UDF. */
  def sampleFrames(decoded: Dataset[DecodedRow], stride: Int = 2): DataFrame =
    decoded.toDF()
      .select(
        col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** The SQL-expressible metadata slice of the decode (dims derive from
    * byte length only) — used by the correctness gate; the histogram
    * features are covered by the typed spec instead. */
  def metadata(docs: DataFrame): DataFrame =
    attachBinary(docs).select(
      col("doc_id"),
      col("media_type"),
      col("byte_len"),
      (lit(16) + col("byte_len") % 64).as("width"),
      (lit(16) + (col("byte_len") * 7) % 64).as("height"),
      (lit(1) + expr("byte_len div 100")).as("n_frames"))
}
