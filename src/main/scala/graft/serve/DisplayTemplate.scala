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
  *  - render errors raise, unless `template_debug` is set, in which
  *    case they render the reference's red debug block
  *    (__init__.py:179-185): escaped error + JSON dump of the result +
  *    the template source;
  *  - rules WITHOUT a display template get the default rendering — the
  *    result as an escaped JSON `<pre>` block (__init__.py:186-189).
  *
  * The supported expression surface is dot-path lookup + `|safe` (what
  * the reference's own config corpus exercises — tests/test_plugin.py
  * fixtures use `{{ display.field }}` exclusively); control structures
  * are compile errors, surfaced through the same debug contract.
  */
object DisplayTemplate {

  final class TemplateError(msg: String) extends RuntimeException(msg)

  /** A compiled template: literal segments interleaved with lookups. */
  private[serve] sealed trait Seg
  private final case class Lit(s: String) extends Seg
  private final case class Expr(path: Seq[String], safe: Boolean) extends Seg

  private[serve] final case class Compiled(segs: Seq[Seg]) {
    def render(context: Map[String, Any]): String =
      segs.map {
        case Lit(s) => s
        case Expr(path, safe) =>
          val v = lookup(context, path)
          if (safe) v else escapeHtml(v)
      }.mkString
  }

  // per-type compiled-template cache (reference __init__.py:170-176)
  private val cache = TrieMap.empty[(String, String), Compiled]

  private val exprRe = """\{\{\s*([^}]*?)\s*\}\}""".r
  private val pathRe = """^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$""".r

  private[serve] def compile(template: String): Compiled = {
    if (template.contains("{%"))
      throw new TemplateError(
        "control structures ({% ... %}) are not supported in display templates")
    val segs = Seq.newBuilder[Seg]
    var last = 0
    for (m <- exprRe.findAllMatchIn(template)) {
      if (m.start > last) segs += Lit(template.substring(last, m.start))
      val raw = m.group(1).trim
      val (body, safe) =
        if (raw.endsWith("|safe")) (raw.dropRight(5).trim, true) else (raw, false)
      if (!pathRe.matches(body))
        throw new TemplateError(s"unsupported template expression: {{ $raw }}")
      segs += Expr(body.split('.').toSeq, safe)
      last = m.end
    }
    if (template.indexOf("{{", last) >= 0)
      throw new TemplateError("unclosed {{ expression")
    if (last < template.length) segs += Lit(template.substring(last))
    Compiled(segs.result())
  }

  /** Dot-path lookup; missing segments yield "" (Jinja Undefined). */
  private def lookup(ctx: Any, path: Seq[String]): String = {
    val v = path.foldLeft(Option[Any](ctx)) {
      case (Some(m: Map[_, _]), seg) =>
        m.asInstanceOf[Map[String, Any]].get(seg)
      case _ => None
    }
    v match {
      case Some(null) | None => ""
      case Some(x)           => x.toString
    }
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
