package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** SimHash (Charikar 2002) of a token array as a native Catalyst expression
  * with whole-stage codegen: each token is hashed to 64 bits (two 32-bit
  * Murmur3 passes over the UTF-8 bytes, Spark's own codegen-safe hash);
  * bit position p contributes +1/-1 to a counter by the hash's p-th bit;
  * the sign vector of the 64 counters is the fingerprint.
  *
  * Near-duplicate documents (small token-set edits) land within a few bits
  * of Hamming distance, so candidate pairs can be found by exact-joining on
  * 16-bit blocks (pigeonhole: hamming ≤ 3 ⇒ ≥1 of 4 blocks equal) instead
  * of comparing all pairs — the SimHash stage of a 100 TB dedup pipeline is
  * a pure map + 4-way explode + equi-join, no O(n²) anywhere.
  *
  * A custom Expression (not a UDF) keeps this inside Tungsten codegen: no
  * row boxing, no Scala closure dispatch per row.
  */
case class SimHash64(child: Expression, seedLo: Int, seedHi: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got ${other.catalogString}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.compute(arr, seedLo, seedHi)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c, $seedLo, $seedHi)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  /** Default token-hash seeds (the historical 64-bit fingerprint). A second
    * fingerprint from independent seeds gives 64 more independent sign bits:
    * two seeded fingerprints concatenate into a 128-bit SimHash with exactly
    * the statistics of a native 128-bit one (each bit is the sign of an
    * independent random projection of the token set).
    */
  val SeedLoA = 42
  val SeedHiA = 1871
  val SeedLoB = 7777
  val SeedHiB = 24036583

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, seedLo: Int, seedHi: Int): Long = {
    val counters = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = hash64(s, seedLo, seedHi)
        var p = 0
        while (p < 64) {
          if (((h >>> p) & 1L) == 1L) counters(p) += 1 else counters(p) -= 1
          p += 1
        }
      }
      i += 1
    }
    var out = 0L
    var p = 0
    while (p < 64) {
      if (counters(p) >= 0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** 64-bit token hash from two seeded Murmur3_x86_32 passes. */
  def hash64(s: UTF8String, seedLo: Int, seedHi: Int): Long = {
    val lo = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, seedLo)
    val hi = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, seedHi)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  import org.apache.spark.sql.GraftBridge

  def apply(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c), SeedLoA, SeedHiA))

  /** The second, independent 64 bits of the 128-bit fingerprint. */
  def part2(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c), SeedLoB, SeedHiB))
}
