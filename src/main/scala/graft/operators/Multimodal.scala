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
  * Two [[MediaCodec]] implementations sit behind the seam:
  * [[ImageCodec]] — REAL PNG/JPEG/GIF/BMP decode + resize on the JDK's
  * `javax.imageio` (no external jars) — and [[FakeCodec]], a deterministic
  * container (`GFT1` magic + u16 dims + payload) kept for reproducible
  * frame-sampling tests and the synthetic bench corpus. Every operator
  * takes the codec as a parameter, so the pipeline shape (schema,
  * batching, partitioning, null handling) is identical either way.
  */
object Multimodal {

  val Magic: Array[Byte] = "GFT1".getBytes("UTF-8")

  final case class MediaRow(id: Long, content: Array[Byte])
  final case class MediaMeta(
      id: Long, width: Int, height: Int, nBytes: Int, valid: Boolean)

  /** The codec seam: bytes in → small struct or bytes out. Implementations
    * must be Serializable — they execute inside tasks, partition-parallel.
    */
  trait MediaCodec extends Serializable {
    def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta
    def resize(bytes: Array[Byte], stride: Int): Array[Byte]
  }

  /** Real image codec on `javax.imageio` (ships with the JDK): decodes
    * PNG/JPEG/GIF/BMP metadata and performs an actual rescale (bilinear
    * `Graphics2D.drawImage` onto a `stride`-times smaller canvas,
    * re-encoded as PNG). Undecodable/corrupt payloads degrade to
    * `valid = false` metadata — never a task failure, same contract as the
    * fake codec.
    */
  object ImageCodec extends MediaCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    override def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta =
      if (bytes == null) MediaMeta(id, 0, 0, 0, valid = false)
      else try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) MediaMeta(id, 0, 0, bytes.length, valid = false)
        else MediaMeta(id, img.getWidth, img.getHeight, bytes.length, valid = true)
      } catch {
        case _: Exception => MediaMeta(id, 0, 0, bytes.length, valid = false)
      }

    override def resize(bytes: Array[Byte], stride: Int): Array[Byte] =
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) bytes
        else {
          val w = math.max(1, img.getWidth / stride)
          val h = math.max(1, img.getHeight / stride)
          val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new ByteArrayOutputStream()
          ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      } catch { case _: Exception => bytes }
  }

  /** Deterministic fake container (tests/bench): `GFT1` magic + u16
    * width/height + payload bytes derived from a seed.
    */
  object FakeCodec extends MediaCodec {
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

    override def decodeMeta(id: Long, bytes: Array[Byte]): MediaMeta = {
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
    override def resize(bytes: Array[Byte], stride: Int): Array[Byte] = {
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
  def decodeMeta(
      media: Dataset[MediaRow],
      codec: MediaCodec = FakeCodec): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => codec.decodeMeta(r.id, r.content)))
  }

  /** Resize every blob; returns the same schema (id, content). */
  def resizeAll(
      media: Dataset[MediaRow], stride: Int,
      codec: MediaCodec = FakeCodec): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      MediaRow(r.id, codec.resize(r.content, stride))))
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
