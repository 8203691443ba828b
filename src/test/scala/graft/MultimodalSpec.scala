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
