package graft.plans

import graft.functions.FtsMatch
import graft.text.{FtsQuery, Tokenize}
import graft.text.FtsQuery._
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Coalesce, Expression, Literal, Lower, Not => CNot, Or => COr, RLike}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: compile [[graft.functions.FtsMatch]] predicates into
  * native, codegen-able expression trees (SURVEY §4's optional
  * `Rule[LogicalPlan]` for the MATCH surface).
  *
  * `fts_match(title, search_1, 'a NOT b')` evaluates interpreted
  * (CodegenFallback) — correct but per-row virtual calls outside
  * whole-stage codegen. This rule rewrites it at optimization time into
  * boundary-anchored RLIKE predicates over the raw strings:
  *
  * {{{ term t  ⇔  lower(col) RLIKE '(^|[^a-z0-9])t([^a-z0-9]|$)' }}}
  *
  * which is exactly token membership under the ASCII tokenizer (terms
  * are parser-guaranteed alphanumeric, so no regex escaping is needed).
  * Phrases become the same pattern with `[^a-z0-9]+` separators;
  * prefixes drop the right anchor. Every RLIKE is null-coalesced to
  * false so three-valued logic matches the evaluator's
  * empty-tokens-for-null behavior exactly.
  *
  * Install: `GraftExtensions` (builder) or
  * `spark.experimental.extraOptimizations ++= Seq(RewriteFtsMatch)`
  * (live session). Sessions without it still get correct results via
  * the interpreted eval — this is purely a plan-level speedup.
  */
object RewriteFtsMatch extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case fm: FtsMatch
          if fm.third.foldable && fm.first.resolved && fm.second.resolved &&
            FtsQuery.parseOrEscape(
              Option(fm.third.eval(null))
                .map(_.asInstanceOf[UTF8String].toString).getOrElse(""),
              Tokenize.None_).forall(!containsNear(_)) =>
        val q = Option(fm.third.eval(null))
          .map(_.asInstanceOf[UTF8String].toString).getOrElse("")
        FtsQuery.parseOrEscape(q, Tokenize.None_) match {
          case None       => Literal(false)
          case Some(node) => build(node, fm.first, fm.second)
        }
    }

  /** NEAR needs token-distance counting — not a regex; trees containing
    * it keep the interpreted FtsMatch eval (correct, just not
    * compiled). Everything else compiles.
    */
  private def containsNear(n: Node): Boolean = n match {
    case Near(_, _)   => true
    case And(ns)      => ns.exists(containsNear)
    case Or(ns)       => ns.exists(containsNear)
    case Not(pos, ng) => containsNear(pos) || containsNear(ng)
    case Field(_, m)  => containsNear(m)
    case _            => false
  }

  private def termPat(t: String): String = s"(^|[^a-z0-9])$t([^a-z0-9]|$$)"
  private def phrasePat(ts: Seq[String]): String = {
    // a starred token (phrase-prefix last leg) matches any completion
    // of the prefix; a starred LAST token also drops the right anchor
    val body = ts.map(t =>
      if (t.endsWith("*")) t.dropRight(1) + "[a-z0-9]*" else t)
      .mkString("[^a-z0-9]+")
    if (ts.last.endsWith("*")) s"(^|[^a-z0-9])$body"
    else s"(^|[^a-z0-9])$body([^a-z0-9]|$$)"
  }
  private def prefixPat(p: String): String = s"(^|[^a-z0-9])$p"

  /** RLIKE over the lowered column, null-safe (null text = no match). */
  private def rlike(e: Expression, pat: String): Expression =
    Coalesce(Seq(RLike(Lower(e), Literal(pat)), Literal(false)))

  private def anyField(fields: Seq[Expression], pat: String): Expression =
    fields.map(rlike(_, pat)).reduce(COr(_, _))

  private def build(n: Node, title: Expression, s1: Expression): Expression = {
    def go(n: Node, fields: Seq[Expression]): Expression = n match {
      case Term(t)      => anyField(fields, termPat(t))
      case Phrase(ts)   => anyField(fields, phrasePat(ts))
      case Prefix(p)    => anyField(fields, prefixPat(p))
      case And(ns)      => ns.map(go(_, fields)).reduce(CAnd(_, _))
      case Or(ns)       => ns.map(go(_, fields)).reduce(COr(_, _))
      case Not(pos, ng) => CAnd(go(pos, fields), CNot(go(ng, fields)))
      case Field(f, m)  => go(m, Seq(if (f == "title") title else s1))
      // ^phrase: the first maximal alnum run must start the phrase —
      // anchor at string start, allowing only non-token chars before;
      // a starred anchor token matches any completion of the prefix
      case First(ts) =>
        val body = ts.map(t =>
          if (t.endsWith("*")) t.dropRight(1) + "[a-z0-9]*" else t)
          .mkString("[^a-z0-9]+")
        anyField(fields, s"^[^a-z0-9]*$body([^a-z0-9]|$$)")
      case Near(_, _) =>
        sys.error("unreachable: NEAR trees are excluded by containsNear")
    }
    go(n, Seq(title, s1))
  }
}
