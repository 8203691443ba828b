package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two `array<float>` embeddings as a native Catalyst
  * expression with whole-stage codegen.
  *
  * The HOF formulation ([[VectorFunctions.cosine]]: `aggregate(zip_with(
  * ...))` three times) evaluates interpreted — per element it re-walks the
  * lambda expression tree and allocates a zipped array, which made the
  * all-pairs near-dup scan (|pairs| × dim element visits) the dominant cost
  * at sf0.1 (measured ~100 s for 2M pairs × 64 dims). This expression does
  * one fused loop per pair (dot, |a|², |b|² together — a single pass over
  * each array) inside generated code.
  *
  * Result is BIT-IDENTICAL to the HOF version and to DuckDB's in-order
  * `list_sum(list_transform(...))` fold (which the oracle parity relies
  * on): elements are accumulated left-to-right in double precision, same
  * `0.0` seed, and the same zero-norm guard (`0.0` when either norm is 0).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine_sim needs two array<float>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {

  /** Shared by interpreted eval and generated code. Folds in array order
    * (IEEE double addition is order-sensitive; this order is the parity
    * contract with the HOF version and the DuckDB oracle). Null elements
    * contribute a NaN-free 0-style skip the HOF version would turn into a
    * null sum — embeddings have no null elements, and mismatched lengths
    * fold over the shorter prefix.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (math.sqrt(na) == 0.0 || math.sqrt(nb) == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  import org.apache.spark.sql.GraftBridge

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
}
