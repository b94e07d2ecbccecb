package graft.functions

import graft.text.{FtsQuery, Tokenize, Tokenizer}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `fts_match(title, search_1, 'query')` — the reference's
  * `search_index_fts MATCH :query` predicate (reference
  * dogsheep_beta/__init__.py:131) as a SQL boolean expression: full
  * query language (AND/OR/NOT/phrase/prefix/column filter) with the
  * escape fallback, evaluated per row over the two indexed fields.
  *
  * This is the brute-force score-scan form — usable on any relation,
  * anywhere in SQL, with zero index state. Selective queries against
  * the built index should go through SearchEngine.matchSet (postings
  * semi-join); a future optimizer rule could rewrite this predicate
  * into that join automatically (SURVEY §4).
  *
  * The query string must be foldable (a literal/constant): the parse
  * happens once per plan, not per row.
  */
case class FtsMatch(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "fts_match"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).exists(_.dataType != StringType))
      TypeCheckResult.TypeCheckFailure("fts_match expects (string, string, string)")
    else if (!third.foldable)
      TypeCheckResult.TypeCheckFailure("fts_match query must be a constant")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val parsed: Option[FtsQuery.Node] = {
    val q = Option(third.eval(null))
      .map(_.asInstanceOf[UTF8String].toString).getOrElse("")
    FtsQuery.parseOrEscape(q, Tokenize.None_)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    parsed match {
      case None => false // blank query matches nothing as a predicate
      case Some(node) =>
        def toks(e: Expression): IndexedSeq[String] =
          Option(e.eval(input)) match {
            case None => Vector.empty
            case Some(v) =>
              Tokenizer.tokenize(v.asInstanceOf[UTF8String].toString,
                Tokenize.None_).toIndexedSeq
          }
        FtsQuery.matches(node, toks(first), toks(second))
    }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): FtsMatch = copy(f, s, t)
}
