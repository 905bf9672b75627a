package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql` users (and any BI layer on
  * top) can call them without touching the Scala API:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *
  *   SELECT poly_hash(text), cosine_sim(a.embedding, b.embedding) ...
  */
object GraftFunctions {

  /** Extract a non-null integral literal argument or fail analysis with a
    * named, bounded error — the shared gate for every function taking a
    * compile-time size/width parameter.
    */
  private def requireIntLiteral(fn: String, what: String, e: Expression,
      min: Int, max: Int = Int.MaxValue): Int = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = e.dataType == IntegerType || e.dataType == LongType ||
      e.dataType == ShortType || e.dataType == ByteType
    val v = if (e.foldable && integral) e.eval() else null
    if (v == null) // non-literal, wrong type, or a NULL literal
      throw new IllegalArgumentException(
        s"$fn: the $what must be a non-null integer literal")
    val n = v.asInstanceOf[Number].intValue()
    if (n < min || n > max) {
      val range = if (max == Int.MaxValue) s">= $min" else s"in [$min, $max]"
      throw new IllegalArgumentException(s"$fn: the $what must be $range, got $n")
    }
    n
  }

  val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("poly_hash", classOf[PolyHashExpr], {
      case Seq(c) => PolyHashExpr(c)
      case args => throw new IllegalArgumentException(
        s"poly_hash expects 1 argument, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("hashed_shingles", classOf[HashedShingles], {
      case Seq(c, n) =>
        HashedShingles(c, requireIntLiteral("hashed_shingles", "shingle size", n, 1))
      case args => throw new IllegalArgumentException(
        s"hashed_shingles expects (text, n), got ${args.length} arguments")
    }: Seq[Expression] => Expression),
    ("hashed_shingles_pos", classOf[HashedShinglesPos], {
      case Seq(c, n) =>
        HashedShinglesPos(c,
          requireIntLiteral("hashed_shingles_pos", "shingle size", n, 1))
      case args => throw new IllegalArgumentException(
        s"hashed_shingles_pos expects (text, n), got ${args.length} arguments")
    }: Seq[Expression] => Expression),
    ("token_count", classOf[TokenCountExpr], {
      case Seq(c) => TokenCountExpr(c)
      case args => throw new IllegalArgumentException(
        s"token_count expects 1 argument, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("token_chars", classOf[TokenCharsExpr], {
      case Seq(c) => TokenCharsExpr(c)
      case args => throw new IllegalArgumentException(
        s"token_chars expects 1 argument, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("token_gini", classOf[TokenGiniExpr], {
      case Seq(c) => TokenGiniExpr(c)
      case args => throw new IllegalArgumentException(
        s"token_gini expects 1 argument, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("repetition_ratio", classOf[RepetitionRatioExpr], {
      case Seq(c, n) =>
        RepetitionRatioExpr(c,
          requireIntLiteral("repetition_ratio", "n-gram size", n, 1))
      case args => throw new IllegalArgumentException(
        s"repetition_ratio expects (text, n), got ${args.length} arguments")
    }: Seq[Expression] => Expression),
    // Scan-stage SimHash with the library's standard permutation
    // (Dedup.permA(0)/permB(0) mod 2^31-1) — the SQL twin of
    // Dedup.simhashScan.
    ("simhash", classOf[SimhashExpr], {
      case Seq(c, n) =>
        SimhashExpr(c, requireIntLiteral("simhash", "bit width", n, 1, 62),
          graft.functions.Dedup.permA(0), graft.functions.Dedup.permB(0),
          graft.functions.Dedup.MersennePrime)
      case args => throw new IllegalArgumentException(
        s"simhash expects (text, bits), got ${args.length} arguments")
    }: Seq[Expression] => Expression),
    ("marker_hits", classOf[MarkerHitsExpr], {
      case Seq(c, w) =>
        import org.apache.spark.sql.catalyst.util.ArrayData
        import org.apache.spark.sql.types.{ArrayType, StringType}
        val isStrArr = w.dataType match {
          case ArrayType(StringType, _) => true
          case _ => false
        }
        val v = if (w.foldable && isStrArr) w.eval() else null
        if (v == null) // non-literal, wrong type, or a NULL literal
          throw new IllegalArgumentException(
            "marker_hits: the word list must be a non-null array<string> literal")
        val words = v.asInstanceOf[ArrayData].toObjectArray(StringType)
          .map(x => if (x == null) null else x.toString)
        if (words.contains(null))
          throw new IllegalArgumentException(
            "marker_hits: the word list must not contain nulls")
        MarkerHitsExpr(c, words.toSeq)
      case args => throw new IllegalArgumentException(
        s"marker_hits expects (text, words), got ${args.length} arguments")
    }: Seq[Expression] => Expression),
    ("cosine_sim", classOf[CosineSimExpr], {
      case Seq(a, b) => CosineSimExpr(a, b)
      case args => throw new IllegalArgumentException(
        s"cosine_sim expects 2 arguments, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("dot_product", classOf[DotProductExpr], {
      case Seq(a, b) => DotProductExpr(a, b)
      case args => throw new IllegalArgumentException(
        s"dot_product expects 2 arguments, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("rp_lsh_bucket", classOf[RpLshBucketExpr], {
      case Seq(v, n) =>
        RpLshBucketExpr(v, requireIntLiteral("rp_lsh_bucket", "bit count", n, 1, 63))
      case args => throw new IllegalArgumentException(
        s"rp_lsh_bucket expects (vector, nBits), got ${args.length} arguments")
    }: Seq[Expression] => Expression))

  /** Register into an already-running session (builder-time extensions
    * only apply to sessions created after `withExtensions`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, clazz, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name,
        new ExpressionInfo(clazz.getCanonicalName, name), builder)
    }
}

/** Config-only integration: a session created with
  * `spark.sql.extensions=graft.plans.GraftExtensions` gets the SQL
  * functions, the TopK planning strategy, AND the window-rank rewrite —
  * no Scala calls needed. The rewrite is injected as a pre-CBO rule: it
  * runs after the operator-optimization fixed point (so the Filter sits
  * directly on its Window, projects collapsed) and rewrites at most once
  * (the matched pattern disappears). `TopKNative.enable` remains the
  * imperative equivalent for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, clazz, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getCanonicalName, name), builder))
    }
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectPreCBORule(_ => TopKRewrite)
  }
}
