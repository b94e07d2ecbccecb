package graft.functions

import graft.text.{PorterStemmer, Tokenizer}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize → per-token-transform kernel for the indexing
  * pipelines (VERDICT r12 item 6a: the stem/fold/ascii seq-UDFs were
  * the last UDF family on a hot-ish path — the FTS index build).
  *
  * Why a native expression: the seq-UDF form paid the ScalaUDF tax on
  * BOTH sides of the map — every token array converted
  * Catalyst → Seq[String] on entry and back on exit, on top of the
  * interpreted per-row closure — and the split itself ran as a
  * separate `split`/`filter` expression pair. This kernel does split +
  * transform in ONE codegen'd static call on the UTF8String, emitting
  * the token array directly as Catalyst ArrayData.
  *
  * Value parity with the seq-UDF pipeline it replaces (pinned by
  * `TokenizerParitySpec` and the SQLite-golden f4/o1 gate checks):
  * identical split regexes, identical per-token transforms
  * ([[Tokenizer.foldDiacritics]] / memoized Porter stem /
  * [[Tokenizer.asciiLower]]); Java `Pattern.split` drops trailing
  * empties where Spark's `split` keeps them, but both pipelines filter
  * empties, so the kept sequences are identical. Case folding for the
  * porter/fold modes stays OUTSIDE the kernel (Spark's own `lower`),
  * so fold semantics are bit-identical to the previous pipeline by
  * construction.
  */
object TokenPipeImpl {
  val Porter = 0
  val Fold = 1
  val Ascii = 2

  private val uniSplit =
    java.util.regex.Pattern.compile(Tokenizer.unicodeSplitPattern)
  private val asciiSplit =
    java.util.regex.Pattern.compile(Tokenizer.asciiSplitPattern)

  def compute(s: UTF8String, mode: Int): ArrayData = {
    val str = s.toString
    val parts = (if (mode == Ascii) asciiSplit else uniSplit).split(str)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.nonEmpty) {
        val v = mode match {
          case Porter => Tokenizer.cachedStem(t)
          case Fold   => Tokenizer.foldDiacritics(t)
          case _      => Tokenizer.asciiLower(t)
        }
        out += UTF8String.fromString(v)
      }
      i += 1
    }
    new GenericArrayData(out.toArray[AnyRef])
  }
}

/** `token_pipe_e(text, mode)` → array<string> of transformed tokens.
  * Whole-stage-codegen'd: one static call into [[TokenPipeImpl]].
  */
case class TokenPipe(child: Expression, mode: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_pipe_e expects a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_pipe_e"

  override protected def nullSafeEval(input: Any): Any =
    TokenPipeImpl.compute(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenPipeImpl.compute($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): TokenPipe =
    copy(child = newChild)
}

object TokenFunctions {

  /** Resolve the `mode` argument to an Int at analysis time. SQL
    * integer literals arrive as Int, but `2L`-style BIGINT literals
    * (java.lang.Long), SMALLINT/TINYINT casts, and foldable arithmetic
    * are all legitimate ways to spell a constant — widen numerically
    * instead of a raw `asInstanceOf[Int]` (which threw
    * ClassCastException on Long and NPE'd on NULL, ADVICE r13). A
    * non-foldable or non-integral mode is a clear analysis error, not
    * an opaque eval failure.
    */
  def resolveMode(e: Expression): Int = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def fromValue(v: Any): Int = v match {
      case i: Int   => i
      case l: Long  => Math.toIntExact(l)
      case s: Short => s.toInt
      case b: Byte  => b.toInt
      case _ => throw modeError(e)
    }
    e match {
      case Literal(null, _) => throw modeError(e)
      case Literal(v, _) => fromValue(v)
      case other if other.foldable =>
        other.eval() match { case null => throw modeError(e)
                             case v => fromValue(v) }
      case _ => throw modeError(e)
    }
  }

  private def modeError(e: Expression) =
    new org.apache.spark.sql.AnalysisException(
      "_LEGACY_ERROR_TEMP_3000",
      Map("message" ->
        s"token_pipe_e: mode must be a non-NULL foldable integer literal, got ${e.sql}"))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_pipe_e",
      exprs => TokenPipe(exprs(0), resolveMode(exprs(1))), "built-in")

  /** Column API (requires [[register]] on the session). */
  def token_pipe(text: Column, mode: Int): Column =
    call_function("token_pipe_e", text,
      org.apache.spark.sql.functions.lit(mode))
}
