package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values distinct sketch as a native aggregate — the bounded-
  * state way to count distinct keys per group at corpus scale.
  *
  * The aggregation buffer is the set of the `k` smallest DISTINCT hash
  * values seen so far (a `TreeSet` trimmed to `k` on every insert), so:
  *  - map-side partial aggregation reduces every partition to ≤ k longs
  *    before the shuffle (an exact `count(distinct)` shuffles every
  *    distinct key — at 100 TB that is the corpus itself);
  *  - partial buffers MERGE losslessly (union-then-trim), so the sketch
  *    composes across partitions, batches, and snapshots — the property
  *    an incremental corpus-statistics pipeline needs;
  *  - the result is DETERMINISTIC (no randomness: the "uniform" variate
  *    is the md5-derived hash the caller feeds in, the q37 rule), so a
  *    DuckDB oracle reproduces it bit-for-bit with a rank window.
  *
  * Output: the ascending array of the ≤ k retained hashes. The estimator
  * lives in [[graft.operators.Sketches]]: with hashes uniform on
  * [0, 2^52), `(k-1) · 2^52 / kth_min` (Bar-Yossef et al. 2002; the KMV
  * estimator also used by DataSketches' theta sketch family).
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "kmv sketch needs k >= 2 (the estimator uses the kth min)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv needs a LONG hash input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last.longValue && buf.add(v)) { buf.remove(buf.last); () }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next().longValue)
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next().longValue; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)

  override def prettyName: String = "kmv"
}

object KMinValues {
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(
      KMinValues(GraftBridge.expression(c), k).toAggregateExpression())
}
