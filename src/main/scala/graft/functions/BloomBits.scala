package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Fixed-geometry Bloom bitset as a native aggregate — the building block
  * of the warehouse's per-dir membership index ([[graft.table]]'s bloom
  * sidecar). Input is a 64-bit HASH column (the caller hashes; this
  * aggregate only sets bits), buffer is `m/64` longs:
  *  - map-side partials reduce each partition to one fixed-size bitset
  *    before the shuffle (state is O(m), never O(rows));
  *  - partials merge by bitwise OR — associative, commutative, lossless,
  *    so the same aggregate serves builds, incremental refreshes, and
  *    cross-batch unions;
  *  - bit positions derive from the single input hash by
  *    Kirsch–Mitzenmacher double hashing ([[BloomBits.position]] — the
  *    SAME function the driver-side probe uses, so build and probe can
  *    never disagree).
  *
  * Output: the bitset as BINARY (big-endian longs).
  */
case class BloomBits(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(mBits >= 64 && (mBits & (mBits - 1)) == 0 && mBits <= (1 << 27),
    s"mBits=$mBits must be a power of two in [64, 2^27]")
  require(k >= 1 && k <= 16, s"k=$k out of range [1, 16]")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bits needs a LONG hash input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val pos = BloomBits.position(h, i, mBits)
        buf(pos >>> 6) |= (1L << (pos & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = BloomBits.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomBits.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomBits.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBits =
    copy(child = newChild)

  override def prettyName: String = "bloom_bits"
}

object BloomBits {
  def apply(c: Column, mBits: Int, k: Int): Column =
    GraftBridge.column(
      BloomBits(GraftBridge.expression(c), mBits, k).toAggregateExpression())

  /** Kirsch–Mitzenmacher: the i-th bit position for 64-bit hash `h` in an
    * `mBits`-bit filter (`mBits` a power of two). `h2` is forced odd so
    * the stride is invertible mod a power of two — the i-th probes cycle
    * through distinct positions instead of collapsing when the high half
    * of the hash happens to be even.
    */
  def position(h: Long, i: Int, mBits: Int): Int =
    (((h + i.toLong * ((h >>> 32) | 1L)) & (mBits - 1).toLong)).toInt

  /** Driver-side membership probe against [[toBytes]]-encoded bits. */
  def mayContain(bits: Array[Long], mBits: Int, k: Int, h: Long): Boolean = {
    var i = 0
    while (i < k) {
      val pos = position(h, i, mBits)
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }
}
