package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token-level LONGEST COMMON SUBSEQUENCE — the sequence-alignment
  * primitive behind ROUGE-L (Lin 2004): unlike the n-gram overlaps
  * (ROUGE-N, Jaccard, containment), LCS credits in-order but
  * non-contiguous agreement, so a paraphrase that interleaves novel
  * words through a copied sentence still scores its shared spine.
  *
  * The DP is inherently sequential (O(m·n) with a data dependence on
  * the previous row), so it lives as a compiled scalar expression over
  * BOUNDED token prefixes (`cap`, the editdist-verify discipline:
  * candidates × cap² cost, never corpus × full-text²) — not as a
  * relational plan, and NOT under the DuckDB hash oracle (no SQL
  * engine exposes an LCS; the spec pins it against a brute-force
  * reference instead — the writers/streaming verification split).
  */
object Lcs {

  /** LCS length between the two strings' whitespace-token sequences,
    * each truncated to its first `cap` tokens. Two-row DP, O(cap²)
    * worst case, zero allocations beyond the two int rows.
    */
  def tokenLcs(a: String, b: String, cap: Int): Int = {
    val ta = TokenScan.tokensCapped(a, cap)
    val tb = TokenScan.tokensCapped(b, cap)
    val m = ta.length
    val n = tb.length
    if (m == 0 || n == 0) return 0
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      var j = 1
      while (j <= n) {
        cur(j) =
          if (ta(i - 1) == tb(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(n)
  }

  /** Column form: token-LCS of two string columns at `cap`. */
  def tokenLcsCol(a: Column, b: Column, cap: Int): Column =
    GraftBridge.column(TokenLcsExpr(GraftBridge.expression(a),
      GraftBridge.expression(b), cap))
}

/** Scan-stage builder of ROUGE-N's occurrence-indexed hashed gram set:
  * the k-th occurrence of word n-gram g becomes the long
  * polyHash(g)·2^20 + k (h < 2^30, occurrences bounded far below 2^20
  * — the element fits a long exactly), sorted ascending. One compiled
  * pass per document — the relational form (explode → groupBy →
  * re-explode → collect_list) paid two corpus shuffles for the same
  * array.
  */
object RougeGrams {
  def gramSet(s: String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = TokenScan.tokensCapped(s, Int.MaxValue)
    val m = toks.length - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val counts = new java.util.HashMap[Long, Integer]()
    val out = new Array[Long](m)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = PolyHash.eval(sb.toString)
      val occ = counts.merge(h, 1, (a, b) => a + b)
      out(i) = h * 1048576L + occ.toLong
      i += 1
    }
    java.util.Arrays.sort(out)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map(Long.box): Array[Any])
  }
}

/** Scalar: RougeGrams.gramSet compiled into the scan stage. */
case class RougeGramSetExpr(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rouge_gram_set requires a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    RougeGrams.gramSet(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.RougeGrams.gramSet($c.toString(), $n)")

  override protected def withNewChildInternal(
      newChild: Expression): RougeGramSetExpr = copy(child = newChild)
}

/** Scalar: Lcs.tokenLcs compiled into the scan stage — one static call
  * per row pair, no per-token expression tree. */
case class TokenLcsExpr(left: Expression, right: Expression, cap: Int)
    extends BinaryExpression {
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_lcs requires two string arguments, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    Lcs.tokenLcs(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString, cap)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.Lcs.tokenLcs($a.toString(), $b.toString(), $cap)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TokenLcsExpr =
    copy(left = newLeft, right = newRight)
}
