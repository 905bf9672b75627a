package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece-style greedy segmentation (Wu et al. 2016, "Google's Neural
  * Machine Translation System" §4.1 — the BERT tokenizer's algorithm):
  * each whitespace word is segmented left to right by the LONGEST vocab
  * piece matching at the cursor; where nothing matches, one character is
  * consumed as the unknown token. Deterministic by construction (the
  * longest matching prefix of a fixed string is unique), which is what
  * lets the whole segmentation sit under the hash oracle — DuckDB
  * reproduces it with a recursive CTE whose step picks the same longest
  * prefix.
  *
  * Deviation from BERT noted: no `##` continuation marking — pieces
  * match anywhere in the word, not just at starts (the continuation
  * alphabet doubles the vocab and adds nothing to the engine shape).
  * The companion trained-merges path is [[graft.functions.Bpe]]; this
  * expression is the INFERENCE side for a given vocabulary, map-only at
  * parquet-scan speed with the vocab as a shared reference object.
  */
final class WpVocab(val pieces: Seq[String], val unk: String)
    extends Serializable {
  require(pieces.nonEmpty, "empty vocabulary")
  require(pieces.forall(_.nonEmpty), "empty piece")
  require(pieces.distinct.size == pieces.size, "duplicate pieces")
  private val set = {
    val s = new java.util.HashSet[String]()
    pieces.foreach(s.add)
    s
  }
  private val maxLen = pieces.iterator.map(_.length).max

  /** Append the greedy segmentation of one word to `out`. */
  def segment(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    var i = 0
    val len = word.length
    while (i < len) {
      var l = math.min(maxLen, len - i)
      var found: String = null
      while (l >= 1 && found == null) {
        val cand = word.substring(i, i + l)
        if (set.contains(cand)) found = cand
        l -= 1
      }
      if (found == null) { out.add(UTF8String.fromString(unk)); i += 1 }
      else { out.add(UTF8String.fromString(found)); i += found.length }
    }
  }

  /** All pieces of all whitespace words of `s`, flattened in order. */
  def tokenize(s: String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    var start = -1
    val len = s.length
    while (i < len) {
      val ws = TokenScan.isWs(s.charAt(i))
      if (!ws && start < 0) start = i
      if (ws && start >= 0) { segment(s.substring(start, i), out); start = -1 }
      i += 1
    }
    if (start >= 0) segment(s.substring(start), out)
    new GenericArrayData(out.toArray)
  }
}

/** Scalar: greedy WordPiece segmentation to `array<string>` in one
  * compiled pass, vocab shared as a reference object.
  */
case class WordPieceExpr(child: Expression, pieces: Seq[String], unk: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val vocab = new WpVocab(pieces, unk)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wordpiece requires a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    vocab.tokenize(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("wpVocab", vocab, "graft.plans.WpVocab")
    // Call the INSTANCE method on the reference object: Scala emits no
    // static forwarder for the companion's tokenize(String, WpVocab)
    // (the class already declares tokenize(String)), so the static call
    // fails Janino compilation and every row silently ran interpreted
    // (CodegenSpec guards the whole expression family against this).
    defineCodeGen(ctx, ev, c => s"$vRef.tokenize($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceExpr =
    copy(child = newChild)
}

object WordPiece {
  /** Column form: greedy WordPiece pieces of a text column. */
  def wordpiece(c: Column, pieces: Seq[String],
      unk: String = "[UNK]"): Column =
    GraftBridge.column(WordPieceExpr(GraftBridge.expression(c), pieces, unk))
}
