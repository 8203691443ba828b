package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as `mapPartitions` over typed Datasets (the
  * Scala analog of arrow-batched pandas UDFs: per-partition batching, no
  * per-row closure dispatch into Python).
  *
  * The actual media codecs are STUBBED behind [[FakeCodec]] (no image/audio
  * libraries in this environment): the container format is a deterministic
  * fake (`GFT1` magic + big-endian u16 width/height + payload), so the
  * Spark-side plumbing — schema, batching, partitioning, null handling —
  * is real and tested while the codec is swappable.
  */
object Multimodal {

  val Magic: Array[Byte] = "GFT1".getBytes("UTF-8")

  final case class MediaRow(id: Long, content: Array[Byte])
  final case class MediaMeta(
      id: Long, width: Int, height: Int, nBytes: Int, valid: Boolean)

  /** The codec seam. A real deployment swaps this for javax.imageio /
    * ffmpeg bindings; the interface (bytes in, small struct or bytes out)
    * is what the pipeline depends on.
    */
  object FakeCodec {
    /** Encode a fake "image": magic, u16 width, u16 height, then a payload
      * of (width*height) bytes derived deterministically from the seed.
      */
    def encode(width: Int, height: Int, seed: Long): Array[Byte] = {
      val buf = ByteBuffer.allocate(8 + width * height)
      buf.put(Magic)
      buf.putShort(width.toShort)
      buf.putShort(height.toShort)
      var i = 0
      var s = seed
      while (i < width * height) {
        s = s * 6364136223846793005L + 1442695040888963407L
        buf.put((s >>> 56).toByte)
        i += 1
      }
      buf.array()
    }

    def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta = {
      if (bytes == null || bytes.length < 8 ||
        !bytes.take(4).sameElements(Magic)) {
        MediaMeta(id, 0, 0, if (bytes == null) 0 else bytes.length, valid = false)
      } else {
        val buf = ByteBuffer.wrap(bytes, 4, 4)
        MediaMeta(id, buf.getShort & 0xffff, buf.getShort & 0xffff,
          bytes.length, valid = true)
      }
    }

    /** "Resize": keep every stride-th payload byte — stands in for a real
      * scaler; preserves the container format.
      */
    def resize(bytes: Array[Byte], stride: Int): Array[Byte] = {
      val m = decodeMeta(0, bytes)
      if (!m.valid) return bytes
      val w = math.max(1, m.width / stride)
      val h = math.max(1, m.height / stride)
      val out = ByteBuffer.allocate(8 + w * h)
      out.put(Magic).putShort(w.toShort).putShort(h.toShort)
      var i = 0
      while (i < w * h) {
        out.put(bytes(8 + math.min(bytes.length - 9, i * stride * stride)))
        i += 1
      }
      out.array()
    }
  }

  /** Decode metadata for a binary media column — partition-parallel, the
    * shape a 100 TB media scan needs (each task touches only its split's
    * blobs; nothing collects to the driver).
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => FakeCodec.decodeMeta(r.id, r.content)))
  }

  /** Resize every blob; returns the same schema (id, content). */
  def resizeAll(media: Dataset[MediaRow], stride: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      MediaRow(r.id, FakeCodec.resize(r.content, stride))))
  }

  /** Frame sampling for "video" blobs: treat the payload as a sequence of
    * width×height frames and keep every n-th — emits (id, frame_idx, frame).
    */
  def sampleFrames(
      media: Dataset[MediaRow], every: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val m = FakeCodec.decodeMeta(r.id, r.content)
      if (!m.valid || m.width * m.height == 0) Iterator.empty
      else {
        val frameSize = m.width * m.height
        val nFrames = (r.content.length - 8) / frameSize
        (0 until nFrames by every).iterator.map { f =>
          (r.id, f, r.content.slice(8 + f * frameSize, 8 + (f + 1) * frameSize))
        }
      }
    }.toDF("id", "frame_idx", "frame")
  }

  /** Build a synthetic media table from any keyed DataFrame (used by tests
    * and the bench: deterministic blobs, no external fixtures).
    */
  def synthesize(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      MediaRow(id, FakeCodec.encode(
        width = 8 + (id % 16).toInt, height = 8 + (id % 8).toInt, seed = id))
    }
  }
}
