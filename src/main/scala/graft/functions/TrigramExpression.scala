package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled distinct-trigram kernel for the char-trigram language
  * classifier ([[graft.ext.TextAnalysis.charTrigramLangId]]).
  *
  * Why a native expression (preference order (b) — Expression before
  * UDF): the relational formulation builds trigrams with a
  * `transform(sequence(...), i -> substr(s, i, 3))` lambda, which
  * evaluates INTERPRETED (outside whole-stage codegen — the same tax
  * the winnowing kernel removes), then pays a corpus-wide DISTINCT
  * shuffle to dedupe per-document occurrences. This kernel emits each
  * document's DISTINCT trigrams in one compiled JVM call — no lambda
  * interpretation, and the dedup happens in-row, so the downstream
  * `DISTINCT` disappears entirely.
  *
  * Value parity: each trigram is encoded as the collision-FREE BIGINT
  * `cp1·2^42 + cp2·2^21 + cp3` over full Unicode code points — exactly
  * the `ascii(tg)`-based encoding in the DuckDB oracle (`ascii`
  * returns identical code points in Spark and DuckDB; verified on
  * CJK). Code-point (not UTF-16-unit) iteration matches SQL `substr`
  * semantics on supplementary characters.
  */
object TrigramImpl {
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i + 2 < n) {
      val h = cps(i).toLong * 4398046511104L +
        cps(i + 1).toLong * 2097152L + cps(i + 2).toLong
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `char_trigrams_e(lowered_text)` → array<bigint> of the document's
  * DISTINCT code-point-encoded trigrams. Whole-stage-codegen'd: one
  * static call into [[TrigramImpl.compute]].
  */
case class CharTrigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_trigrams_e expects a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_trigrams_e"

  override protected def nullSafeEval(input: Any): Any =
    TrigramImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrigramImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
    copy(child = newChild)
}

object TrigramFunctions {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_trigrams_e", exprs => CharTrigrams(exprs(0)), "built-in")

  /** Column API (requires [[register]] on the session). */
  def char_trigrams_e(lowered: Column): Column =
    call_function("char_trigrams_e", lowered)
}
