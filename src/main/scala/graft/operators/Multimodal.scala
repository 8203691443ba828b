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

    /** 32×32 luminance grid (row-major doubles) for perceptual hashing;
      * None for undecodable payloads (degrade, never fail — the
      * decodeMeta contract).
      */
    def luma32(bytes: Array[Byte]): Option[Array[Double]]
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

    /** Decode + bilinear-rescale to 32×32 + BT.601 luminance. */
    override def luma32(bytes: Array[Byte]): Option[Array[Double]] =
      try {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val out = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, 32, 32, null)
          } finally g.dispose()
          val luma = new Array[Double](32 * 32)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              val rgb = out.getRGB(x, y)
              luma(y * 32 + x) =
                0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) +
                  0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          Some(luma)
        }
      } catch { case _: Exception => None }

    /** PNG-encode a BufferedImage (the synthesis/test helper). */
    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
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

    /** Exact block-average pooling of the payload grid into 32×32.
      * A TRUNCATED payload (header claims more pixels than the blob
      * carries) degrades to None like every other invalid input — the
      * trait's contract is degrade-never-fail, and one corrupt blob must
      * not kill a whole decode task.
      */
    override def luma32(bytes: Array[Byte]): Option[Array[Double]] = {
      val m = decodeMeta(0, bytes)
      // Long math: width/height are 16-bit fields, so their Int product
      // can overflow negative (65535×65535) and bypass the guard.
      if (!m.valid || m.width == 0 || m.height == 0
        || (bytes.length - 8).toLong < m.width.toLong * m.height) None
      else {
        val luma = new Array[Double](32 * 32)
        var cy = 0
        while (cy < 32) {
          var cx = 0
          while (cx < 32) {
            val y0 = cy * m.height / 32; val y1 = math.max(y0 + 1, (cy + 1) * m.height / 32)
            val x0 = cx * m.width / 32; val x1 = math.max(x0 + 1, (cx + 1) * m.width / 32)
            var s = 0.0; var n = 0
            var y = y0
            while (y < math.min(y1, m.height)) {
              var x = x0
              while (x < math.min(x1, m.width)) {
                s += (bytes(8 + y * m.width + x) & 0xff).toDouble
                n += 1; x += 1
              }
              y += 1
            }
            luma(cy * 32 + cx) = if (n == 0) 0.0 else s / n
            cx += 1
          }
          cy += 1
        }
        Some(luma)
      }
    }
  }

  /** 64-bit perceptual hash (pHash): 8×8 low-frequency block of the 2D
    * DCT-II over a 32×32 luminance grid, each bit = coefficient > median
    * of the 63 AC coefficients (DC's bit is always 0 — its magnitude is
    * just overall brightness). Two renderings of the same content —
    * resized, re-encoded, lightly filtered — keep nearly identical
    * low-frequency structure, so their hashes sit within a few bits;
    * unrelated images differ in ~half. Pure JVM double math, no external
    * libs; deterministic for a given luminance grid.
    */
  object PHash {
    private val N = 32
    // Cos(u)(x) = cos((2x+1)·u·π / 64) — the DCT-II basis, u < 8 only
    // (higher frequencies never contribute to the hash)
    private val Cos: Array[Array[Double]] = Array.tabulate(8, N)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * N)))

    def fromLuma32(luma: Array[Double]): Long = {
      require(luma.length == N * N, s"luma grid must be $N×$N")
      // separable partial DCT: first each row → 8 freqs, then columns
      val rowF = Array.ofDim[Double](N, 8)
      var y = 0
      while (y < N) {
        var v = 0
        while (v < 8) {
          var s = 0.0; var x = 0
          while (x < N) { s += luma(y * N + x) * Cos(v)(x); x += 1 }
          rowF(y)(v) = s; v += 1
        }
        y += 1
      }
      val coef = new Array[Double](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0; var yy = 0
          while (yy < N) { s += Cos(u)(yy) * rowF(yy)(v); yy += 1 }
          coef(u * 8 + v) = s; v += 1
        }
        u += 1
      }
      val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
      java.util.Arrays.sort(ac)
      val median = ac(31) // middle of the 63 AC coefficients
      var bits = 0L; var k = 1
      while (k < 64) { if (coef(k) > median) bits |= (1L << k); k += 1 }
      bits
    }
  }

  /** Per-image 64-bit perceptual hashes — partition-parallel decode +
    * hash, the [[decodeMeta]] shape (each task touches only its split's
    * blobs). Undecodable payloads are dropped (they have no visual
    * content to deduplicate; route them via `decodeMeta().valid` checks).
    */
  def imagePHashes(
      media: Dataset[MediaRow],
      codec: MediaCodec = ImageCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r =>
      codec.luma32(r.content).map(l => (r.id, PHash.fromLuma32(l)))))
      .toDF("id", "phash")
  }

  /** Perceptual-hash near-duplicate image pairs: pHash per image, then
    * the shared 64-bit hamming kernel ([[TextDedup.fp64Pairs]] —
    * pigeonhole-blocked banded equi-join with guaranteed recall at the
    * radius, exact `bit_count` verify). `(id_a, id_b, hamming)`,
    * `id_a < id_b`. The image analog of SimHash near-dup text pairs:
    * same blocking machinery, different fingerprint.
    */
  def phashNearDupPairs(
      hashes: DataFrame, // id, phash
      maxHamming: Int = 6): DataFrame =
    TextDedup.fp64Pairs(
      hashes.select(col("id").as("doc_id"), col("phash").as("fp")),
      maxHamming)
      .select(col("d1").as("id_a"), col("d2").as("id_b"), col("hamming"))

  /** Deterministic smooth test images (seeded sinusoid fields, PNG): the
    * low-frequency content survives resize/re-encode — what pHash is FOR
    * — while distinct seeds give uncorrelated hashes. Frequencies stay
    * ≤ 6 cycles/image so nothing aliases under the 32×32 hash pooling.
    */
  def synthesizeImages(
      spark: SparkSession, ids: DataFrame, idCol: String,
      width: Int = 64, height: Int = 64): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].map { id =>
      MediaRow(id, ImageCodec.encodePng(sinusoidImage(width, height, id)))
    }
  }

  private[graft] def sinusoidImage(
      w: Int, h: Int, seed: Long): java.awt.image.BufferedImage = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33).toDouble) / (1L << 31).toDouble // [0, 1)
    }
    // Eight plane waves with CONTINUOUS frequencies spanning the whole
    // low band (0.6..7 cycles/image): every 8×8 DCT cell can carry
    // energy, so all 63 hash bits are informative and organic collisions
    // are vanishingly rare — a sparser family (few waves, or integer
    // frequencies) concentrates energy in a handful of cells and two
    // seeds collide to hamming ≤ 2 at corpus scale (measured). All
    // frequencies stay below the 32×32 pooling Nyquist limit, so the
    // content survives resize/re-encode — what pHash is FOR.
    val nWaves = 8
    val fx = Array.fill(nWaves)(0.6 + next() * 6.4)
    val fy = Array.fill(nWaves)(0.6 + next() * 6.4)
    val ph = Array.fill(nWaves)(next() * 2 * math.Pi)
    val am = Array.fill(nWaves)(12.0 + next() * 14.0)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = 128.0
        var k = 0
        while (k < nWaves) {
          v += am(k) * math.sin(
            2 * math.Pi * fx(k) * x / w + 2 * math.Pi * fy(k) * y / h + ph(k))
          k += 1
        }
        val b = math.max(0, math.min(255, math.round(v).toInt))
        img.setRGB(x, y, (b << 16) | (b << 8) | b)
        x += 1
      }
      y += 1
    }
    img
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
    // fail fast on the driver: a zero/negative stride would otherwise
    // throw 'step cannot be 0' inside an executor task
    require(every >= 1, s"every=$every must be >= 1")
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

  /** Persist the image-hash dedup index AT REST (q66's pattern for
    * IMAGES): the corpus pHashes land pigeonhole-blocked
    * ([[TextDedup.fp64Blocks]]) in a `pb = blk·partBuckets + (bv mod
    * partBuckets)`-partitioned warehouse table, so an arrival batch
    * probes only the partitions its own block values name. Unlike the
    * MinHash banding, RECALL HERE IS A THEOREM: a pair within the hamming
    * radius must agree on ≥1 whole block (pigeonhole), so the blocked
    * probe + exact `bit_count` verify equals the brute-force pair scan
    * bit-for-bit. The blocking radius is part of the index format —
    * persisted and validated at lookup (a probe blocked for a different
    * radius would silently miss).
    */
  def phashIndexAtRest(
      hashes: DataFrame, // id, phash
      table: graft.table.WarehouseTable,
      maxHamming: Int = 2,
      partBuckets: Int = 8,
      compression: String = "snappy"): Unit = {
    val idx = TextDedup.fp64Blocks(
      hashes.select(col("id").as("doc_id"), col("phash").as("fp")), maxHamming)
      .withColumn("pb",
        (col("blk") * partBuckets + pmod(col("bv"), lit(partBuckets))).cast("int"))
    // MOR + no stats, same shape as the minhash index: a batch's blocks
    // scatter over every pb partition, so COW merges are index-bound while
    // MOR deltas are batch-bound. Contract (as documented on the commit):
    // an id's hash is immutable, so rows never move partitions while live
    // and partition-pruned arbitration is exact. Probes prune by pb only.
    table.create(idx.schema, partition = Some("pb"),
      properties = graft.table.WarehouseTable.tableProperties("MOR", compression) ++
        Map(
          "stats.mode" -> "none",
          "phash.maxHamming" -> maxHamming.toString,
          "phash.partBuckets" -> partBuckets.toString))
    table.append(idx)
  }

  /** Incremental maintenance of the at-rest image-hash index — the
    * minhash-commit pattern for IMAGES: after [[phashLookupAtRest]]
    * classifies an arrival batch, MERGE the ACCEPTED images' blocked
    * hash rows into the index so the next batch's probes catch near-dups
    * of everything accepted so far. Blocking parameters are read from
    * the table itself (they ARE the persisted index format — hashes
    * blocked under a different radius never merge). Rows are keyed
    * `(doc_id, blk)` — a pure function of the image hash — so replaying
    * a batch upserts byte-identical rows: idempotent. The COW merge
    * rewrites only the `pb` partitions the batch's blocks land in.
    */
  def phashIndexCommit(
      spark: SparkSession,
      accepted: DataFrame, // id, phash
      table: graft.table.WarehouseTable): Unit = {
    val stored = table.properties
    def param(k: String): Int = stored.getOrElse(s"phash.$k",
      throw new IllegalArgumentException(
        s"index table has no phash.$k property — not a pHash index")).toInt
    val maxHamming = param("maxHamming"); val partBuckets = param("partBuckets")
    val idx = TextDedup.fp64Blocks(
      accepted.select(col("id").as("doc_id"), col("phash").as("fp")), maxHamming)
      .withColumn("pb",
        (col("blk") * partBuckets + pmod(col("bv"), lit(partBuckets))).cast("int"))
    table.merge(spark, idx, Seq("doc_id", "blk"))
  }

  /** Near-dup image lookup of an arrival batch against the at-rest index:
    * arrival hashes are blocked map-side, the bounded distinct `pb` set
    * decides which partitions to READ (manifest pruning — ≤ nBlocks ×
    * partBuckets values), candidates come from the `(blk, bv)` equi-join
    * inside them, and the exact hamming verify makes the output exactly
    * the cross pair set within the radius. `(arrival_id, corpus_id,
    * hamming)`.
    */
  def phashLookupAtRest(
      spark: SparkSession,
      arrivals: DataFrame, // id, phash
      table: graft.table.WarehouseTable,
      maxHamming: Int = 2,
      partBuckets: Int = 8): DataFrame = {
    val stored = table.properties
    Seq("phash.maxHamming" -> maxHamming, "phash.partBuckets" -> partBuckets)
      .foreach { case (k, v) =>
        stored.get(k).foreach(sv => require(sv == v.toString,
          s"index was built with $k=$sv but the lookup passed $v — " +
            "blocks from different radii never match"))
      }
    val probe = TextDedup.fp64Blocks(
      arrivals.select(col("id").as("doc_id"), col("phash").as("fp")), maxHamming)
      .withColumn("pb",
        (col("blk") * partBuckets + pmod(col("bv"), lit(partBuckets))).cast("int"))
      .localCheckpoint() // one materialization: partition decision + join
    val pbVals = probe.select(col("pb")).distinct()
      .collect().map(_.get(0)).toSeq // bounded: ≤ nBlocks·partBuckets
    val idx = table.read(spark, partitions = Some(pbVals))
    probe.join(idx
        .select(col("doc_id").as("cid"), col("fp").as("cfp"),
          col("blk").as("cblk"), col("bv").as("cbv")),
        col("blk") === col("cblk") && col("bv") === col("cbv"))
      .select(col("doc_id").as("arrival_id"), col("cid").as("corpus_id"),
        bit_count(col("fp").bitwiseXOR(col("cfp"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
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
