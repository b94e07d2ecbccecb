package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit, typedLit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled unigram-LM Viterbi segmentation kernel (Kudo 2018; see
  * [[graft.ext.Pipeline.unigramLm]] for the training loop and the
  * shared semantics).
  *
  * Why a native expression (preference order (b) — Expression before
  * UDF, the [[WinnowImpl]] precedent): the previous pure-relational
  * DP was an `aggregate` fold whose per-candidate piece lookup ran
  * `try_element_at` against a map LITERAL — and Spark's
  * ArrayBasedMapData lookup is a LINEAR SCAN of the key array, so
  * every (position × piece-length) candidate paid O(|vocab|) string
  * compares inside an interpreted higher-order-function body (r8
  * verdict: the most expensive query at both scales, 193 s at sf1).
  * This kernel is the same DP as one compiled JVM call per row:
  * O(len · maxPieceLen) candidates, each a single hash lookup, no
  * per-element boxing, inside whole-stage codegen.
  *
  * Value parity with the relational fold (and the DuckDB oracle's
  * recursive CTE): integer micro-nat costs; pieces missing from the
  * model price at the same +∞ sentinel (1e12); `best[i] = min over
  * l ≤ min(maxPieceLen, i) of (best[i−l] + cost(substr(i−l+1, l)))`
  * with ties broken toward the SMALLER last-piece length (ascending-l
  * scan with strict `<` — `array_min`'s (cost, len) struct order);
  * substrings use `substringSQL`, the same codepoint semantics as SQL
  * `substring`. The returned piece list is the backtrace from the
  * word end (last piece first — the fold's own order; every consumer
  * aggregates, so order is immaterial but kept identical anyway).
  */
object UnigramImpl {
  val INF = 1000000000000L

  def segment(word: UTF8String,
      costs: java.util.HashMap[UTF8String, java.lang.Long],
      maxPieceLen: Int): ArrayData = {
    val n = word.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val bestC = new Array[Long](n + 1)
    val bestL = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bc = Long.MaxValue
      var bl = 1
      val lmax = if (maxPieceLen < i) maxPieceLen else i
      var l = 1
      while (l <= lmax) {
        val pc = costs.get(word.substringSQL(i - l + 1, l))
        val c = bestC(i - l) + (if (pc == null) INF else pc.longValue())
        if (c < bc) { bc = c; bl = l }
        l += 1
      }
      bestC(i) = bc
      bestL(i) = bl
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var pos = n
    while (pos > 0) {
      val l = bestL(pos)
      out += word.substringSQL(pos - l + 1, l)
      pos -= l
    }
    new GenericArrayData(out.toArray)
  }
}

/** `unigram_segment(word, costs_map, max_piece_len)` → array<string>
  * of the word's Viterbi pieces under the model. The cost map is an
  * analysis-time constant (the bounded shipped-model artifact, same
  * contract as the BPE merge table): the registry builder folds it
  * once and the expression carries it as a plain Scala map, rebuilding
  * the per-JVM hash table lazily on each executor.
  */
case class UnigramSegment(child: Expression, costs: Map[String, Long],
    maxPieceLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment expects a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](costs.size * 2)
    costs.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    UnigramImpl.segment(input.asInstanceOf[UTF8String], table, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramCosts", table,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, java.lang.Long>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramImpl.segment($c, $ref, $maxPieceLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramFunctions {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "unigram_segment",
      exprs => {
        def intOf(e: Expression): Int = e.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"unigram_segment: max_piece_len must be an integer literal, got $other")
        }
        def mapOf(e: Expression): Map[String, Long] = {
          // constant-ness check is eval-ability against no input row,
          // not e.foldable (the BpeFunctions lesson: literal-built
          // collection expressions can report foldable=false)
          val md = (try e.eval(null) catch {
            case ex: Exception => throw new IllegalArgumentException(
              "unigram_segment: the cost map must be an analysis-time constant", ex)
          }).asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
          val ks = md.keyArray()
          val vs = md.valueArray()
          (0 until md.numElements())
            .map(i => ks.getUTF8String(i).toString -> vs.getLong(i)).toMap
        }
        UnigramSegment(exprs(0), mapOf(exprs(1)), intOf(exprs(2)))
      },
      "built-in")

  /** Column API (requires [[register]] on the session). */
  def unigram_segment(word: Column, costs: Map[String, Long],
      maxPieceLen: Int): Column =
    call_function("unigram_segment", word, typedLit(costs), lit(maxPieceLen))
}
