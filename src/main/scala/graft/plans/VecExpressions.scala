package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over `array<float>` columns.
  *
  * The composable form (zip_with + aggregate) is CodegenFallback —
  * interpreted per row with array allocation — which dominates wall-clock on
  * all-pairs similarity. This expression runs one compiled loop per pair.
  *
  * Semantics are bit-identical to the higher-order form and the DuckDB
  * oracle: floats are promoted to double before multiplying, and the three
  * accumulators (dot, |a|², |b|²) fold left in index order, then
  * dot / (sqrt(na) * sqrt(nb)). Inputs of unequal length compare over the
  * common prefix (embeddings are fixed-dim by contract).
  */
object VecOps {
  /** Left-fold dot product in double precision, index order. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
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
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.VecOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VecOps.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {
  /** Compiled cosine similarity between two array<float> columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(
      CosineSimExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Compiled double-precision dot product of two array<float> columns. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProductExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
