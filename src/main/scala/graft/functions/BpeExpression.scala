package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled BPE merge application (Sennrich et al. 2016; see
  * [[graft.ext.Pipeline.bpeEncode]] for the training/serving contract
  * and the shared semantics).
  *
  * Why a native expression (preference order (b), the [[WinnowImpl]]
  * precedent): the pure-relational form was a NESTED `aggregate` fold
  * — outer over merges, inner over symbols — whose per-symbol step
  * rebuilt the accumulator array (`concat(slice(…), array(…))`), i.e.
  * O(len²) per merge in an interpreted lambda (r8 verdict item 4:
  * 76.6 s at sf1). This kernel applies each merge as one in-place
  * compaction pass over a mutable symbol array: O(len) per merge,
  * compiled, inside whole-stage codegen.
  *
  * Value parity (== the SQL fold == the DuckDB oracle): merges apply
  * in rank (step) order, each greedily LEFT-TO-RIGHT — after a merge
  * the new symbol immediately becomes the left operand for the next
  * position (so merge (a,a) on "aaaa" yields [aa, aa]). Initial
  * symbols are the word's codepoints (`substringSQL` semantics).
  */
object BpeImpl {

  def segment(word: UTF8String,
      merges: Array[Array[UTF8String]]): ArrayData = {
    val n = word.numChars()
    var len = n
    val syms = new Array[UTF8String](math.max(n, 1))
    var i = 0
    while (i < n) { syms(i) = word.substringSQL(i + 1, 1); i += 1 }
    var m = 0
    while (m < merges.length) {
      val l = merges(m)(0)
      val r = merges(m)(1)
      // one left-to-right compaction pass: w writes, j reads
      var w = 0
      var j = 0
      while (j < len) {
        if (w > 0 && syms(w - 1).equals(l) && syms(j).equals(r)) {
          syms(w - 1) = UTF8String.concat(l, syms(j))
        } else {
          syms(w) = syms(j)
          w += 1
        }
        j += 1
      }
      len = w
      m += 1
    }
    val out = new Array[AnyRef](len)
    i = 0
    while (i < len) { out(i) = syms(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** `bpe_segment(word, merges)` → array<string> of the word's BPE
  * symbols under the merge table (an analysis-time array<struct<l,r>>
  * literal — the bounded shipped artifact, the same contract as the
  * unigram cost map).
  */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_segment expects a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"

  @transient private lazy val table: Array[Array[UTF8String]] =
    merges.map { case (l, r) =>
      Array(UTF8String.fromString(l), UTF8String.fromString(r))
    }.toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.segment(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeImpl.segment($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegment =
    copy(child = newChild)
}

object BpeFunctions {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_segment",
      exprs => {
        def mergesOf(e: Expression): Seq[(String, String)] = {
          // constant-ness check is eval-ability against no input row,
          // not e.foldable: CreateArray-of-struct literals report
          // foldable=false even with all-literal children
          val ad = (try e.eval(null) catch {
            case ex: Exception => throw new IllegalArgumentException(
              "bpe_segment: the merge table must be an analysis-time constant", ex)
          }).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          (0 until ad.numElements()).map { i =>
            val row = ad.getStruct(i, 2)
            (row.getUTF8String(0).toString, row.getUTF8String(1).toString)
          }
        }
        BpeSegment(exprs(0), mergesOf(exprs(1)))
      },
      "built-in")

  /** Column API (requires [[register]] on the session); `mergesArr`
    * must be a foldable array<struct<l: string, r: string>> literal.
    */
  def bpe_segment(word: Column, mergesArr: Column): Column =
    call_function("bpe_segment", word, mergesArr)
}
