package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit, typedLit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled WordPiece greedy segmentation (the BERT tokenizer's
  * longest-match-first encode; see [[graft.ext.Pipeline.wordpieceEncode]]
  * for the training/serving contract and the DuckDB-oracle semantics).
  *
  * Why a native expression (preference order (b), the [[UnigramImpl]] /
  * [[BpeImpl]] precedent — r11): the pure-relational form was an
  * `aggregate` fold whose per-position candidate probe ran
  * `element_at` against TWO map LITERALS of the whole vocabulary.
  * The corpus-side cost was fine (the distinct-word relation is tiny),
  * but the ~2×|vocab| literal children survived into every consumer of
  * the fold through optimizer inlining, and each analyzer/optimizer
  * pass re-walked the tens-of-thousands-node tree — the QUERY spent
  * ~3 s of DRIVER time planning a 31-row fold (r10 bench outlier
  * x_pipe_wordpiece, 0.9 → 6.8 s sf0.1). Here the vocab crosses
  * analysis ONCE (the function builder folds the array literals) and
  * the expression carries it as two opaque hash sets — a single plan
  * node, whole-stage-codegen'd, O(len · maxPieceLen) lookups per word.
  *
  * Value parity with the fold (and the oracle's recursive CTE): at
  * each position take the LONGEST piece ≤ maxPieceLen present in the
  * position-appropriate vocab side (word-initial vs `##`-continuation,
  * stored UNPREFIXED in `cont`); emit continuation pieces
  * `##`-prefixed; a word with an unmatchable position encodes to
  * `['[UNK]']` whole (the BERT contract). Substrings use
  * `substringSQL` — SQL codepoint semantics.
  */
object WordpieceImpl {

  private val UNK = UTF8String.fromString("[UNK]")
  private val HH = UTF8String.fromString("##")

  def segment(word: UTF8String, init: java.util.HashSet[UTF8String],
      cont: java.util.HashSet[UTF8String], maxPieceLen: Int): ArrayData = {
    val n = word.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var pos = 1
    while (pos <= n) {
      val set = if (pos == 1) init else cont
      var l = math.min(maxPieceLen, n - pos + 1)
      var found = 0
      while (l >= 1 && found == 0) {
        if (set.contains(word.substringSQL(pos, l))) found = l
        else l -= 1
      }
      if (found == 0)
        return new GenericArrayData(Array[AnyRef](UNK))
      val piece = word.substringSQL(pos, found)
      out += (if (pos == 1) piece else UTF8String.concat(HH, piece))
      pos += found
    }
    new GenericArrayData(out.toArray)
  }
}

/** `wordpiece_segment(word, init_pieces, cont_pieces, max_piece_len)`
  * → array<string> of greedy longest-match pieces (continuations
  * `##`-prefixed), or `['[UNK]']` if any position is unmatchable. The
  * piece arrays are analysis-time constants (the bounded shipped-model
  * artifact, same contract as the BPE merge table).
  */
case class WordpieceSegment(child: Expression, initPieces: Seq[String],
    contPieces: Seq[String], maxPieceLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_segment expects a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_segment"

  @transient private lazy val initSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](initPieces.size * 2)
    initPieces.foreach(p => s.add(UTF8String.fromString(p)))
    s
  }
  @transient private lazy val contSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](contPieces.size * 2)
    contPieces.foreach(p => s.add(UTF8String.fromString(p)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    WordpieceImpl.segment(input.asInstanceOf[UTF8String], initSet, contSet,
      maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val iref = ctx.addReferenceObj("wpInit", initSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    val cref = ctx.addReferenceObj("wpCont", contSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordpieceImpl.segment($c, $iref, $cref, $maxPieceLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordpieceSegment =
    copy(child = newChild)
}

object WordpieceFunctions {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wordpiece_segment",
      exprs => {
        def piecesOf(e: Expression, side: String): Seq[String] = {
          // constant-ness check is eval-ability against no input row,
          // not e.foldable (the BpeFunctions lesson: literal-built
          // collection expressions can report foldable=false)
          val ad = (try e.eval(null) catch {
            case ex: Exception => throw new IllegalArgumentException(
              s"wordpiece_segment: the $side piece array must be an " +
                "analysis-time constant", ex)
          }).asInstanceOf[ArrayData]
          (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
        }
        def intOf(e: Expression): Int = e.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"wordpiece_segment: max_piece_len must be an integer literal, got $other")
        }
        WordpieceSegment(exprs(0), piecesOf(exprs(1), "init"),
          piecesOf(exprs(2), "cont"), intOf(exprs(3)))
      },
      "built-in")

  /** Column API (requires [[register]] on the session). */
  def wordpiece_segment(word: Column, initPieces: Seq[String],
      contPieces: Seq[String], maxPieceLen: Int): Column =
    call_function("wordpiece_segment", word, typedLit(initPieces),
      typedLit(contPieces), lit(maxPieceLen))
}
