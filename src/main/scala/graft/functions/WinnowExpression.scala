package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled winnowing kernel (Schleimer/Wilkerson/Aiken 2003; see
  * [[graft.ext.TextAnalysis.winnowFingerprints]] for the relational
  * formulation and the shared semantics).
  *
  * Why a native expression (preference order (b) — Expression before
  * UDF): the pure-relational in-row variant pays Spark's interpreted
  * higher-order-function tax — `transform`/`zip_with` lambda bodies
  * run outside whole-stage codegen, so its per-k-gram md5 is ~2-3×
  * slower than codegen'd hashing (measured, PLANS_r4.md), while the
  * explode+window variant shuffles ~corpus-chars rows. This kernel
  * keeps BOTH properties: one compiled JVM call per row (tight loops,
  * no per-element boxing) and zero exchange.
  *
  * Value parity: hash = first 15 hex chars of md5 of the UTF-8 bytes
  * (== `Dedup.portableHash` == DuckDB `substr(md5(x),1,15)`), taken
  * mod 2^31-1; selection key = h·2^31 + (2^31 - pos) (rightmost-min
  * rule as one scalar min); fingerprint = key >> 31. Substrings use
  * `substringSQL`, the same codepoint semantics as SQL `substr`.
  */
object WinnowImpl {
  val Prime = 2147483647L // 2^31-1
  private val Two31 = 2147483648L
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Distinct selected fingerprints of `s` (already lowercased by the
    * caller — the column layer applies Spark's own `lower` so case
    * folding can never diverge from the relational variants).
    */
  def compute(s: UTF8String, k: Int, window: Int): ArrayData = {
    val nGrams = s.numChars() - k + 1
    if (nGrams < window) return new GenericArrayData(Array.empty[Long])
    val md = mdLocal.get()
    val keys = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      val d = md.digest(s.substringSQL(i + 1, k).getBytes)
      // first 15 hex chars as a number: bytes 0..6 + high nibble of 7
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      v = (v << 4) | ((d(7) >> 4) & 0x0fL)
      keys(i) = (v % Prime) * Two31 + (Two31 - (i + 1))
      i += 1
    }
    val seen = new java.util.HashSet[Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    i = window - 1
    while (i < nGrams) {
      var m = keys(i)
      var j = 1
      while (j < window) {
        val c = keys(i - j)
        if (c < m) m = c
        j += 1
      }
      val fp = m >> 31
      if (seen.add(fp)) out += fp
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `winnow_fps(lowered_text, k, window)` → array<bigint> of the doc's
  * distinct winnowing fingerprints. Whole-stage-codegen'd: the
  * generated code is a single static call into [[WinnowImpl.compute]].
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowImpl.compute(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowImpl.compute($c, $k, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFunctions {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fps",
      exprs => {
        def intOf(e: Expression): Int = e.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"winnow_fps: k/window must be integer literals, got $other")
        }
        WinnowFingerprints(exprs(0), intOf(exprs(1)), intOf(exprs(2)))
      },
      "built-in")

  /** Column API (requires [[register]] on the session). */
  def winnow_fps(lowered: Column, k: Int, window: Int): Column =
    call_function("winnow_fps", lowered,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(window))
}
