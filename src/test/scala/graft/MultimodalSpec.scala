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

  test("pHash: resize/re-encode invariant, distinct images far apart") {
    import graft.operators.Multimodal.ImageCodec
    val a = ImageCodec.encodePng(Multimodal.sinusoidImage(64, 64, 7L))
    val b = ImageCodec.encodePng(Multimodal.sinusoidImage(64, 64, 8L))
    def ph(bytes: Array[Byte]): Long =
      Multimodal.PHash.fromLuma32(ImageCodec.luma32(bytes).get)
    val ha = ph(a)
    // 2× bilinear downscale + PNG re-encode: same perceptual content
    assert(java.lang.Long.bitCount(ha ^ ph(ImageCodec.resize(a, 2))) <= 2)
    // a DIFFERENT image is many bits away
    assert(java.lang.Long.bitCount(ha ^ ph(b)) > 10)
    // undecodable payloads yield no luma (degrade, never throw)
    assert(ImageCodec.luma32("junk".getBytes("UTF-8")).isEmpty)
  }

  test("pHash near-dup pairs: planted copies found partition-parallel, nothing else") {
    val ids = spark.range(0, 60).toDF("id")
    val originals = Multimodal.synthesizeImages(spark, ids, "id")
      .repartition(8) // decode+hash runs per-partition, not on the driver
    val copies = originals.filter(_.id % 10 == 0).map(r =>
      MediaRow(r.id + 1000L, Multimodal.ImageCodec.resize(r.content, 2)))
    val hashes = Multimodal.imagePHashes(originals.union(copies))
    assert(hashes.rdd.getNumPartitions > 1) // distributed, no collect
    val pairs = Multimodal.phashNearDupPairs(hashes, maxHamming = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == (0L until 60L by 10).map(i => (i, i + 1000L)).toSet)
  }

  test("pHash at rest: arrival probe == cross pair set, reads pruned partitions") {
    import org.apache.spark.sql.functions.col
    val ids = spark.range(0, 60).toDF("id")
    val originals = Multimodal.synthesizeImages(spark, ids, "id")
    val corpusHashes = Multimodal.imagePHashes(originals)
    val table = graft.table.WarehouseTable(tmpDir("phrest") + "/idx")
    Multimodal.phashIndexAtRest(corpusHashes, table, maxHamming = 2)
    val arrivals = originals.filter(_.id % 10 == 0).map(r =>
      MediaRow(r.id + 1000L, Multimodal.ImageCodec.resize(r.content, 2)))
    val arrivalHashes = Multimodal.imagePHashes(arrivals)
    val got = Multimodal.phashLookupAtRest(spark, arrivalHashes, table, 2)
    val rows = got.select("arrival_id", "corpus_id")
      .as[(Long, Long)].collect().toSet
    assert(rows == (0L until 60L by 10).map(i => (i + 1000L, i)).toSet)
    // pruning: the scan touches a strict subset of the index partitions
    val touched = got.inputFiles.filter(_.contains("pb="))
      .flatMap(f => "pb=(\\d+)".r.findFirstMatchIn(f).map(_.group(1))).toSet
    val all = spark.read.parquet(table.root + "/data")
      .select("pb").distinct().count()
    assert(touched.nonEmpty && touched.size < all,
      s"probe read ${touched.size} of $all partitions - expected a strict subset")
    // a mismatched radius must fail loudly, not silently miss
    intercept[IllegalArgumentException] {
      Multimodal.phashLookupAtRest(spark, arrivalHashes, table, maxHamming = 6)
    }
    ()
  }

  test("pHash at rest: incremental commit — batch 2 probes find batch 1's accepted images; replay no-op") {
    import org.apache.spark.sql.functions.col
    val ids = spark.range(0, 40).toDF("id")
    val originals = Multimodal.synthesizeImages(spark, ids, "id")
    val table = graft.table.WarehouseTable(tmpDir("phcommit") + "/idx")
    Multimodal.phashIndexAtRest(Multimodal.imagePHashes(originals), table,
      maxHamming = 2)
    // batch 1: fresh images 100..104 — no corpus match, accepted
    val b1 = Multimodal.synthesizeImages(
      spark, spark.range(100, 105).toDF("id"), "id")
    val b1Hashes = Multimodal.imagePHashes(b1)
    assert(Multimodal.phashLookupAtRest(spark, b1Hashes, table, 2).isEmpty)
    Multimodal.phashIndexCommit(spark, b1Hashes, table)
    val nRows = table.read(spark).count()
    // batch 2: a resized copy of accepted image 102 must now be caught
    val b2 = b1.filter(_.id == 102L).map(r =>
      MediaRow(r.id + 1000L, Multimodal.ImageCodec.resize(r.content, 2)))
    val hits = Multimodal.phashLookupAtRest(
        spark, Multimodal.imagePHashes(b2), table, 2)
      .select("arrival_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((1102L, 102L)))
    // replay: byte-identical keyed upsert — no extra rows
    Multimodal.phashIndexCommit(spark, b1Hashes, table)
    assert(table.read(spark).count() == nRows)
    // a non-index table refuses commits
    val bare = graft.table.WarehouseTable(tmpDir("phbare") + "/t")
    bare.create(table.schema)
    val e = intercept[IllegalArgumentException] {
      Multimodal.phashIndexCommit(spark, b1Hashes, bare)
    }
    assert(e.getMessage.contains("phash"))
    ()
  }
}
