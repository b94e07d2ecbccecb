package graft.serve

import scala.collection.concurrent.TrieMap

/** Data-level rendering of a rule's `display` template — the engine
  * equivalent of the reference's per-result Jinja render
  * (reference dogsheep_beta/__init__.py:169-185):
  *
  *  - templates are compiled once per type and cached
  *    (`templates_by_type`, __init__.py:170-176);
  *  - `{{ path }}` substitutes a dot-path lookup into the render
  *    context (the result row merged with its `display.*` dict),
  *    HTML-escaped (Jinja `autoescape=True`); `{{ path|safe }}` opts
  *    out; missing paths render as the empty string (Jinja Undefined);
  *  - `{% for v in path %}…{% endfor %}` iterates a sequence value,
  *    binding `v` and the Jinja `loop` helper (`index`/`index0`/
  *    `first`/`last`/`length`); an Undefined path iterates as empty
  *    (Jinja's default Undefined is an empty iterable);
  *  - `{% if cond %}…{% elif cond %}…{% else %}…{% endif %}` with the
  *    condition surface the reference's own template exercises
  *    (templates/beta.html:43-72): truthiness of a dot-path, `not`,
  *    and `==` / `!=` against a path, quoted string, or integer
  *    literal — Python truthiness (None/False/0/""/empty seq → false);
  *  - render errors raise, unless `template_debug` is set, in which
  *    case they render the reference's red debug block
  *    (__init__.py:179-185): escaped error + JSON dump of the result +
  *    the template source;
  *  - rules WITHOUT a display template get the default rendering — the
  *    result as an escaped JSON `<pre>` block (__init__.py:186-189).
  *
  * Anything beyond that surface (filters other than `|safe`, function
  * calls, `{% extends %}`…) is a compile error, surfaced through the
  * same debug contract.
  */
object DisplayTemplate {

  final class TemplateError(msg: String) extends RuntimeException(msg)

  // ---- compiled representation ------------------------------------

  private[serve] sealed trait Node
  private final case class Lit(s: String) extends Node
  private final case class Expr(path: Seq[String], safe: Boolean) extends Node
  private final case class For(varName: String, path: Seq[String],
      body: Vector[Node]) extends Node
  private final case class If(branches: Seq[(Cond, Vector[Node])],
      orElse: Vector[Node]) extends Node

  private sealed trait Operand
  private final case class PathOp(path: Seq[String]) extends Operand
  private final case class StrOp(s: String) extends Operand
  private final case class NumOp(n: Long) extends Operand

  private final case class Cond(left: Operand, op: Option[(String, Operand)],
      negated: Boolean)

  private[serve] final case class Compiled(nodes: Vector[Node]) {
    def render(context: Map[String, Any]): String = {
      val sb = new StringBuilder
      renderNodes(nodes, context, sb)
      sb.toString
    }
  }

  // per-type compiled-template cache (reference __init__.py:170-176)
  private val cache = TrieMap.empty[(String, String), Compiled]

  // ---- parsing -----------------------------------------------------

  private val tagRe = """\{\{\s*(.*?)\s*\}\}|\{%\s*(.*?)\s*%\}""".r
  private val pathRe = """^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$""".r
  private val forRe = """^for\s+([A-Za-z_][A-Za-z0-9_]*)\s+in\s+(\S+)$""".r

  /** Template tokens: literal runs, `{{ expr }}`, `{% tag %}`. */
  private sealed trait Tok
  private final case class LitTok(s: String) extends Tok
  private final case class ExprTok(body: String) extends Tok
  private final case class TagTok(body: String) extends Tok

  private def tokenize(template: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var last = 0
    for (m <- tagRe.findAllMatchIn(template)) {
      if (m.start > last) toks += LitTok(template.substring(last, m.start))
      if (m.group(1) != null) toks += ExprTok(m.group(1))
      else toks += TagTok(m.group(2))
      last = m.end
    }
    val tail = template.substring(last)
    if (tail.contains("{{") || tail.contains("{%"))
      throw new TemplateError("unclosed template tag")
    if (tail.nonEmpty) toks += LitTok(tail)
    toks.result()
  }

  private def parsePath(s: String): Seq[String] = {
    if (!pathRe.matches(s))
      throw new TemplateError(s"unsupported template expression: $s")
    scala.collection.immutable.ArraySeq.unsafeWrapArray(s.split('.'))
  }

  private def parseOperand(s: String): Operand =
    if ((s.startsWith("\"") && s.endsWith("\"") && s.length >= 2) ||
        (s.startsWith("'") && s.endsWith("'") && s.length >= 2))
      StrOp(s.substring(1, s.length - 1))
    else if (s.nonEmpty && s.forall(c => c.isDigit || c == '-') && s != "-")
      NumOp(s.toLong)
    else PathOp(parsePath(s))

  /** `[not] operand [(==|!=) operand]` — the beta.html condition set. */
  private def parseCond(raw: String): Cond = {
    var s = raw.trim
    val negated = s.startsWith("not ") || s == "not"
    if (negated) s = s.stripPrefix("not").trim
    if (s.isEmpty) throw new TemplateError(s"bad condition: $raw")
    val opIdx = Seq("==", "!=").flatMap { op =>
      val i = s.indexOf(op)
      if (i >= 0) Some((i, op)) else None
    }.sortBy(_._1).headOption
    opIdx match {
      case Some((i, op)) =>
        val l = parseOperand(s.substring(0, i).trim)
        val r = parseOperand(s.substring(i + op.length).trim)
        Cond(l, Some((op, r)), negated)
      case None => Cond(parseOperand(s), None, negated)
    }
  }

  /** Recursive-descent block parser over the token stream.
    * `stop` = the end tags that close the current block (`endfor`,
    * `endif`/`elif`/`else`); returns at the stop tag without consuming.
    */
  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0

    def atEnd: Boolean = pos >= toks.length
    def peekTag: Option[String] = toks.lift(pos).collect { case TagTok(b) => b }

    def parseBlock(stop: String => Boolean): Vector[Node] = {
      val nodes = Vector.newBuilder[Node]
      while (!atEnd) {
        toks(pos) match {
          case TagTok(body) if stop(keyword(body)) => return nodes.result()
          case TagTok(body) => pos += 1; nodes += parseTag(body)
          case ExprTok(body) => pos += 1; nodes += parseExpr(body)
          case LitTok(s) => pos += 1; nodes += Lit(s)
        }
      }
      nodes.result()
    }

    private def keyword(tagBody: String): String =
      tagBody.split("\\s+", 2).head

    private def parseExpr(raw: String): Expr = {
      val (body, safe) =
        if (raw.endsWith("|safe")) (raw.dropRight(5).trim, true)
        else (raw, false)
      if (!pathRe.matches(body))
        throw new TemplateError(s"unsupported template expression: {{ $raw }}")
      Expr(parsePath(body), safe)
    }

    private def expectTag(kw: String): String = {
      if (atEnd)
        throw new TemplateError(s"missing {% $kw %}")
      toks(pos) match {
        case TagTok(body) if keyword(body) == kw => pos += 1; body
        case t => throw new TemplateError(s"expected {% $kw %}, found $t")
      }
    }

    private def parseTag(body: String): Node = keyword(body) match {
      case "for" =>
        body match {
          case forRe(v, pathStr) =>
            val inner = parseBlock(kw => kw == "endfor")
            expectTag("endfor")
            For(v, parsePath(pathStr), inner)
          case _ => throw new TemplateError(s"bad for tag: {% $body %}")
        }
      case "if" =>
        val branches = Seq.newBuilder[(Cond, Vector[Node])]
        var cond = parseCond(body.stripPrefix("if").trim)
        var done = false
        var orElse = Vector.empty[Node]
        while (!done) {
          val inner = parseBlock(kw => kw == "elif" || kw == "else" || kw == "endif")
          branches += ((cond, inner))
          peekTag.map(keyword) match {
            case Some("elif") =>
              cond = parseCond(toks(pos).asInstanceOf[TagTok].body
                .stripPrefix("elif").trim)
              pos += 1
            case Some("else") =>
              pos += 1
              orElse = parseBlock(kw => kw == "endif")
              expectTag("endif")
              done = true
            case Some("endif") => pos += 1; done = true
            case _ => throw new TemplateError("missing {% endif %}")
          }
        }
        If(branches.result(), orElse)
      case other =>
        throw new TemplateError(
          s"unsupported tag {% $body %} (only for/if control structures)")
    }
  }

  private[serve] def compile(template: String): Compiled = {
    val p = new Parser(tokenize(template))
    val nodes = p.parseBlock(_ => false)
    // a stray endfor/elif/else/endif at top level stops parseBlock early
    if (!p.atEnd)
      throw new TemplateError(s"unexpected {% ${p.peekTag.getOrElse("")} %}")
    Compiled(nodes)
  }

  // ---- rendering ---------------------------------------------------

  private def renderNodes(nodes: Vector[Node], ctx: Map[String, Any],
      sb: StringBuilder): Unit =
    nodes.foreach {
      case Lit(s) => sb.append(s)
      case Expr(path, safe) =>
        val v = strVal(lookupRaw(ctx, path))
        sb.append(if (safe) v else escapeHtml(v))
      case For(v, path, body) =>
        val items = lookupRaw(ctx, path) match {
          case None | Some(null) => Seq.empty // Undefined iterates empty
          case Some(xs: Seq[_]) => xs
          case Some(xs: Iterable[_]) => xs.toSeq
          case Some(xs: Array[_]) =>
            scala.collection.immutable.ArraySeq.unsafeWrapArray(xs)
          case Some(other) => throw new TemplateError(
            s"'${path.mkString(".")}' is not iterable: $other")
        }
        val n = items.size
        items.iterator.zipWithIndex.foreach { case (item, i) =>
          val loopCtx = ctx + (v -> item) + ("loop" -> Map[String, Any](
            "index" -> (i + 1), "index0" -> i, "first" -> (i == 0),
            "last" -> (i == n - 1), "length" -> n))
          renderNodes(body, loopCtx, sb)
        }
      case If(branches, orElse) =>
        branches.find { case (c, _) => evalCond(c, ctx) } match {
          case Some((_, body)) => renderNodes(body, ctx, sb)
          case None => renderNodes(orElse, ctx, sb)
        }
    }

  private def operandVal(op: Operand, ctx: Map[String, Any]): Option[Any] =
    op match {
      case PathOp(p) => lookupRaw(ctx, p)
      case StrOp(s) => Some(s)
      case NumOp(n) => Some(n)
    }

  private def evalCond(c: Cond, ctx: Map[String, Any]): Boolean = {
    val base = c.op match {
      case None => truthy(operandVal(c.left, ctx))
      case Some((op, right)) =>
        val eq = valuesEqual(operandVal(c.left, ctx), operandVal(right, ctx))
        if (op == "==") eq else !eq
    }
    if (c.negated) !base else base
  }

  /** Python truthiness over the context's value universe. */
  private def truthy(v: Option[Any]): Boolean = v match {
    case None | Some(null) => false
    case Some(b: Boolean) => b
    case Some(s: String) => s.nonEmpty
    case Some(n: Number) => n.doubleValue() != 0.0
    case Some(xs: Iterable[_]) => xs.nonEmpty
    case Some(xs: Array[_]) => xs.nonEmpty
    case Some(_) => true
  }

  /** Jinja `==`: numeric compare when both sides are numbers, else
    * string-representation compare (context values are row scalars).
    */
  private def valuesEqual(a: Option[Any], b: Option[Any]): Boolean =
    (a, b) match {
      case (None | Some(null), None | Some(null)) => true
      case (None | Some(null), _) | (_, None | Some(null)) => false
      case (Some(x: Number), Some(y: Number)) =>
        x.doubleValue() == y.doubleValue()
      case (Some(x), Some(y)) => x.toString == y.toString
    }

  /** Dot-path lookup returning the raw value; None = Jinja Undefined. */
  private def lookupRaw(ctx: Any, path: Seq[String]): Option[Any] =
    path.foldLeft(Option[Any](ctx)) {
      case (Some(m: Map[_, _]), seg) =>
        m.asInstanceOf[Map[String, Any]].get(seg)
      case _ => None
    }

  private def strVal(v: Option[Any]): String = v match {
    case Some(null) | None => ""
    case Some(x) => x.toString
  }

  /** markupsafe-compatible HTML escape (&, <, >, ", '). */
  def escapeHtml(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&#34;"
    case '\'' => "&#39;"
    case c => c.toString
  }

  /** Render `template` for one result row under the reference contract.
    *
    * @param typeTag       cache key (the rule's `"{db}/{type}"`)
    * @param context       result row + nested `display` map
    * @param templateDebug render errors as the red debug block instead
    *                      of raising (reference `template_debug` config)
    */
  def render(typeTag: String, template: String, context: Map[String, Any],
      templateDebug: Boolean = false): String =
    try cache.getOrElseUpdate((typeTag, template), compile(template)).render(context)
    catch {
      case e: TemplateError if templateDebug =>
        val asJson = SearchPage.rowJson(context.collect {
          case (k, v: String) => k -> v
          case (k, null)      => k -> (null: String)
          case (k, v)         => k -> v.toString
        })
        s"""<p style="color: red">${escapeHtml(e.getMessage)}</p>""" +
          s"<pre>${escapeHtml(asJson)}</pre>" +
          s"<p>Template:</p><pre>${escapeHtml(template)}</pre>"
    }

  /** Default rendering for rules without a display template: the result
    * row as an escaped JSON block (reference __init__.py:186-189).
    */
  def renderDefault(row: Map[String, String]): String =
    s"<pre>${escapeHtml(SearchPage.rowJson(row))}</pre>"
}
