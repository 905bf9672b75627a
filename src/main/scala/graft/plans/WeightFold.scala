package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Scalar: `bias + Σ weights(b)` over a bucket-id array — the row-local
  * margin of a linear model whose weight vector lives on the DRIVER
  * (graft.functions.Classifier's perceptron rounds).
  *
  * Exists for PLAN-BUILD latency, not row throughput: the equivalent
  * `aggregate(bkts, bias, (acc, b) -> acc + element_at(map, b))` fold
  * re-enters Catalyst each training round with a fresh lambda and a
  * 2·|model|-literal map in the expression tree — analysis + lambda
  * resolution + optimizer passes over that tree were ~half the measured
  * wall of a 12-round training at sf0.1. Here the model is a
  * CONSTRUCTOR PARAMETER (one tree node; the array rides codegen's
  * reference-object table), so per-round planning touches a constant-
  * size tree, and the fold itself stays inside whole-stage codegen.
  *
  * Long arithmetic with an explicit overflow trap (`Math.addExact` —
  * loud failure, never a silent wrap): the budget is |margin| ≤
  * (distinct buckets per doc + 1) · max|w|, and max|w| is bounded by
  * rounds × corpus docs — ~10^15-scale at a 10^12-doc corpus, three
  * orders under 2^63. Bucket ids must sit in [0, weights.length): the
  * builder hashes with pmod, and anything else throws with the id in
  * the message.
  */
case class WeightFoldSum(child: Expression, bias: Long, weights: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"weight_fold_sum requires array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WeightFoldSum.fold(input.asInstanceOf[ArrayData], bias, weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "long[]")
    // bias rides the reference table too (NOT an inlined `${bias}L`):
    // training calls this once per round with fresh model values, and
    // inlining any of them would change the generated source text each
    // round — a fresh janino compile per round (~half the per-round
    // driver latency) where reference-table values leave the source
    // byte-identical and the codegen cache hot.
    val b = ctx.addReferenceObj("bias", java.lang.Long.valueOf(bias),
      "java.lang.Long")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WeightFoldSum.fold($c, $b.longValue(), $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): WeightFoldSum =
    copy(child = newChild)
}

object WeightFoldSum {
  /** Static kernel shared by interpreted eval and generated code. */
  def fold(bkts: ArrayData, bias: Long, weights: Array[Long]): Long = {
    var s = bias
    var i = 0
    val n = bkts.numElements()
    while (i < n) {
      val b = bkts.getLong(i)
      if (b < 0 || b >= weights.length)
        throw new IllegalArgumentException(
          s"weight_fold_sum: bucket id $b outside [0, ${weights.length})")
      s = Math.addExact(s, weights(b.toInt))
      i += 1
    }
    s
  }

  /** Column builder: margin of `bkts` (array<bigint> of bucket ids)
    * under a dense weight vector with a bias term. */
  def margin(bkts: Column, bias: Long, weights: Array[Long]): Column =
    GraftBridge.column(
      WeightFoldSum(GraftBridge.expression(bkts), bias, weights))
}
