package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native expressions for the quantized-integer geometry the k-means /
  * PQ family runs on ([[graft.operators.KMeans]] quantizes vectors to
  * `floor(x·scale)` LONGs so every distance is exact integer math).
  *
  * The HOF formulation (`aggregate(zip_with(...))` per centroid inside a
  * `transform` over a literal codebook) evaluates interpreted — per row
  * it re-walks the lambda tree k·dim times, which made the q72 trainer's
  * assignment pass the dominant cost at sf0.1 (measured 22 s; the same
  * pathology [[CosineSim]] fixed for float cosine). These do one fused
  * JVM loop per row from generated code, bit-identical results.
  */
object QuantGeometry {

  /** Exact squared L2 over the common prefix of two LONG arrays. */
  def sqDist(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Argmin over a flattened `k × dim` codebook: returns `(d, cid)` with
    * ties to the smaller cid (strict `<` keeps the first/smallest cid —
    * the same total order as the (d ASC, cid ASC) array_min it replaces).
    */
  def nearest(qv: ArrayData, flatCents: Array[Long], dim: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val k = flatCents.length / dim
    val n = math.min(qv.numElements(), dim)
    var bestD = Long.MaxValue
    var bestC = 0
    var c = 0
    while (c < k) {
      val off = c * dim
      var acc = 0L
      var i = 0
      while (i < n) {
        val d = qv.getLong(i) - flatCents(off + i)
        acc += d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; bestC = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }
}

/** Exact squared L2 between two quantized (LONG) vector columns. */
case class LongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_sq_dist needs two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    QuantGeometry.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.QuantGeometry.sqDist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSqDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "long_sq_dist"
}

object LongSqDist {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      LongSqDist(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Nearest centroid of a quantized vector against a CONSTANT codebook —
  * the codebook is a model property that rides in the expression (a
  * reference object in generated code, not k literal sub-trees), so one
  * fused k·dim loop replaces the interpreted transform/aggregate chain.
  * Returns `struct(d: bigint, cid: int)`; ties go to the smaller cid.
  */
case class NearestCentroid(child: Expression, cents: Seq[Seq[Long]])
    extends UnaryExpression {

  require(cents.nonEmpty && cents.forall(_.length == cents.head.length),
    "codebook must be non-empty and rectangular")

  private val dim: Int = cents.head.length
  @transient private lazy val flat: Array[Long] = cents.flatten.toArray

  override def dataType: DataType = StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid needs array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    QuantGeometry.nearest(input.asInstanceOf[ArrayData], flat, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", flat, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.QuantGeometry.nearest($c, $ref, $dim)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  def apply(c: Column, cents: Seq[Seq[Long]]): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(c), cents))
}
