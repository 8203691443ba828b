package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{FakeCodec, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary media columns: encode → decodeMeta round-trips dimensions") {
    val ids = spark.range(0, 50).toDF("id")
    val media = Multimodal.synthesize(spark, ids, "id")
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length == 50)
    assert(meta.forall(_.valid))
    val m7 = meta.find(_.id == 7).get
    assert(m7.width == 8 + 7 % 16 && m7.height == 8 + 7 % 8)
    assert(m7.nBytes == 8 + m7.width * m7.height)
  }

  test("corrupt blobs are flagged invalid, not fatal") {
    val bad = spark.createDataset(Seq(
      MediaRow(1, "nope".getBytes("UTF-8")),
      MediaRow(2, null),
      MediaRow(3, FakeCodec.encode(4, 4, 3))))
    val meta = Multimodal.decodeMeta(bad).collect().sortBy(_.id)
    assert(!meta(0).valid && !meta(1).valid && meta(2).valid)
  }

  test("resize shrinks payload but preserves container validity") {
    val media = Multimodal.synthesize(spark, spark.range(0, 10).toDF("id"), "id")
    val resized = Multimodal.resizeAll(media, stride = 2)
    val meta = Multimodal.decodeMeta(resized).collect()
    assert(meta.forall(_.valid))
    val orig = Multimodal.decodeMeta(media).collect().map(m => m.id -> m).toMap
    meta.foreach { m =>
      assert(m.width == math.max(1, orig(m.id).width / 2))
      assert(m.nBytes < orig(m.id).nBytes)
    }
  }

  test("ImageCodec decodes and resizes REAL PNG and JPEG payloads") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // render real images in-memory (javax.imageio ships with the JDK)
    def img(w: Int, h: Int, format: String): Array[Byte] = {
      val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = b.createGraphics()
      try { g.setColor(java.awt.Color.ORANGE); g.fillRect(0, 0, w, h) }
      finally g.dispose()
      val bos = new ByteArrayOutputStream()
      ImageIO.write(b, format, bos)
      bos.toByteArray
    }
    val media = spark.createDataset(Seq(
      MediaRow(1, img(64, 48, "png")),
      MediaRow(2, img(32, 32, "jpg")),
      MediaRow(3, "not an image".getBytes("UTF-8"))))
    val meta = Multimodal.decodeMeta(media, Multimodal.ImageCodec)
      .collect().sortBy(_.id)
    assert(meta(0).valid && meta(0).width == 64 && meta(0).height == 48)
    assert(meta(1).valid && meta(1).width == 32 && meta(1).height == 32)
    assert(!meta(2).valid) // undecodable → flagged, not fatal
    // real bilinear downscale through the distributed operator
    val resized = Multimodal.resizeAll(media.filter(_.id <= 2), stride = 2,
      codec = Multimodal.ImageCodec)
    val rmeta = Multimodal.decodeMeta(resized, Multimodal.ImageCodec)
      .collect().sortBy(_.id)
    assert(rmeta(0).valid && rmeta(0).width == 32 && rmeta(0).height == 24)
    assert(rmeta(1).valid && rmeta(1).width == 16 && rmeta(1).height == 16)
  }

  test("frame sampling yields every n-th frame of a multi-frame blob") {
    // build a 3-frame "video": 4x4 frames => payload 48 bytes
    val header = FakeCodec.encode(4, 4, 0).take(8)
    val payload = Array.tabulate[Byte](48)(i => i.toByte)
    val video = spark.createDataset(Seq(MediaRow(9, header ++ payload)))
    val frames = Multimodal.sampleFrames(video, every = 2)
      .select(col("frame_idx")).as[Int].collect().sorted
    assert(frames.toSeq == Seq(0, 2))
  }
}
