package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Fixed-point base-2 logarithm WITHOUT libm — the engine's cross-engine
  * logarithm: log2q(x) = e * 2^16 + frac for integer x >= 1, where e is
  * the exact integer part (bit position of the MSB) and frac is 16
  * binary fraction digits computed by the classical repeated-squaring
  * algorithm (normalize the mantissa to [1, 2) in 20-bit fixed point;
  * square; each time the square reaches [2, 4) emit a 1-bit and halve).
  * Every step is integer shift/multiply/compare, so the result is
  * bit-identical in ANY engine with 64-bit integers — DuckDB replays
  * the same 16 squaring stages as a CTE chain over the (bounded) value
  * table, keeping the repo's no-libm discipline while unlocking the
  * log-domain operators (naive-Bayes log-odds, entropy) that exact
  * rationals cannot reach multiplicatively.
  *
  * Error: the integer part is exact; truncation makes the result a
  * lower bound within 2^-16 of floor(log2(x) * 2^16) up to one final
  * ulp — a DETERMINISTIC approximation (the contract is bit-stability,
  * not last-bit rounding of the real value). Overflow-free for every
  * positive long: the mantissa normalization only shifts right once the
  * argument exceeds 2^20, and the squared mantissa stays below 2^42.
  */
object FixLog {

  val FracBits = 16
  val Scale = 1L << FracBits // log2q(2) == Scale

  private val MBits = 20
  private val MOne = 1L << MBits // mantissa fixed-point 1.0

  /** log2q of one positive long — the reference arithmetic both the
    * compiled expression and the DuckDB chain must match bit for bit.
    */
  def log2q(x: Long): Long = {
    require(x >= 1L, s"log2q needs x >= 1, got $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e >= MBits) x >> (e - MBits) else x << (MBits - e)
    var frac = 0L
    var i = 0
    while (i < FracBits) {
      m = (m * m) >> MBits
      if (m >= (MOne << 1)) { m >>= 1; frac = frac * 2 + 1 }
      else frac = frac * 2
      i += 1
    }
    e.toLong * Scale + frac
  }

  /** Column form over a long column (null-safe, errors on x < 1). */
  def log2qCol(c: Column): Column =
    GraftBridge.column(Log2FixedExpr(GraftBridge.expression(c)))
}

/** Scalar expression: FixLog.log2q compiled into the scan stage. */
case class Log2FixedExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"log2q requires a bigint argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    FixLog.log2q(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FixLog.log2q($c)")

  override protected def withNewChildInternal(newChild: Expression): Log2FixedExpr =
    copy(child = newChild)
}
