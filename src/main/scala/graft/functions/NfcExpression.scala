package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression — Spark has no
  * built-in (`java.text.Normalizer` is JDK-standard; DuckDB's
  * `nfc_normalize` is the oracle's equivalent — both implement UAX #15
  * canonical composition, so composed/decomposed spellings of the same
  * text become byte-identical in both engines).
  */
object NfcImpl {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: NFC-normalized already (all-ASCII always is)
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_e(text)` → NFC-normalized text. Whole-stage-codegen'd. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_e expects a string column, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_e"

  override protected def nullSafeEval(input: Any): Any =
    NfcImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcFunctions {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_e", exprs => NfcNormalize(exprs(0)), "built-in")

  /** Column API (requires [[register]] on the session). */
  def nfc_e(text: Column): Column = call_function("nfc_e", text)
}
