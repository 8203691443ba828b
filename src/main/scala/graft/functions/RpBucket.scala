package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Random-projection LSH bucket of an `array<float>` embedding as a native
  * codegen expression — the hot map side of embedding near-dup mining
  * (q24): every corpus row evaluates `nPlanes` pseudo-random ±1
  * projections per LSH table.
  *
  * Semantically IDENTICAL to the HOF formulation it replaces
  * ([[VectorFunctions.randomProjectionBucket]]'s
  * `aggregate(zip_with(...xxhash64...))`): the ±1 pattern is the parity of
  * the same chained XXH64 (`hashInt(seed*1024+plane, 42)` then
  * `hashInt(i, ·)`), elements accumulate left-to-right in double, and the
  * sign test is `sum >= 0` — so buckets are bit-for-bit the ones the HOF
  * produced, including for the ×2-scaled planted copies whose sign
  * equality the q24 recall proof rests on. The HOF version re-walks an
  * interpreted lambda tree and allocates a zipped array per (row, plane);
  * this is one fused loop per row inside whole-stage codegen (measured:
  * the q24 candidate stage dominated by exactly this map work).
  */
case class RpBucket(child: Expression, nPlanes: Int, seed: Int)
    extends UnaryExpression {

  require(nPlanes > 0 && nPlanes <= 30, s"nPlanes $nPlanes out of range")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rp_bucket needs array<float>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RpBucket.compute(input.asInstanceOf[ArrayData], nPlanes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RpBucket.compute($c, $nPlanes, $seed)")

  override protected def withNewChildInternal(newChild: Expression): RpBucket =
    copy(child = newChild)

  override def prettyName: String = "rp_bucket"
}

object RpBucket {

  /** Shared by interpreted eval and generated code. One pass over the
    * array; per-plane accumulators fold in element order (the HOF parity
    * contract).
    */
  def compute(arr: ArrayData, nPlanes: Int, seed: Int): Int = {
    val n = arr.numElements()
    val planeSeeds = new Array[Long](nPlanes)
    var p = 0
    while (p < nPlanes) {
      planeSeeds(p) = XXH64.hashInt(seed * 1024 + p, 42L)
      p += 1
    }
    val acc = new Array[Double](nPlanes)
    var i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble
      p = 0
      while (p < nPlanes) {
        val h = XXH64.hashInt(i, planeSeeds(p))
        // pmod(h, 2) == 0 → +x, else -x (matches the HOF's when/otherwise)
        acc(p) += (if ((h & 1L) == 0L) x else -x)
        p += 1
      }
      i += 1
    }
    var bucket = 0
    p = 0
    while (p < nPlanes) {
      if (acc(p) >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  import org.apache.spark.sql.GraftBridge

  def apply(c: Column, nPlanes: Int, seed: Int): Column =
    GraftBridge.column(RpBucket(GraftBridge.expression(c), nPlanes, seed))
}
