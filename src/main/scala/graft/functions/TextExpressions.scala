package graft.functions

import graft.text.PorterStemmer
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemming as a Catalyst expression, so stemming composes inside
  * plans (e.g. `transform(tokens, t -> porter_stem(t))`) and inside user
  * SQL without Scala-UDF marshalling (no Row encoding, direct
  * UTF8String in/out). The stem itself is branchy string logic — a poor
  * codegen candidate — so this is a CodegenFallback leaf: the
  * surrounding operators stay in whole-stage codegen and only the stem
  * call is interpreted.
  */
case class PorterStem(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"porter_stem expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "porter_stem"

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(PorterStemmer.stem(v.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): PorterStem =
    copy(child = newChild)
}
