package graft.serve

import org.scalatest.funsuite.AnyFunSuite

/** Display-template rendering parity with the reference's per-result
  * Jinja render (reference dogsheep_beta/__init__.py:169-189): dot-path
  * substitution, autoescape, Undefined-renders-empty, the
  * template_debug error block, and the default JSON rendering.
  */
class DisplayTemplateSpec extends AnyFunSuite {

  private val emailCtx: Map[String, Any] = Map(
    "type" -> "emails.db/emails", "key" -> "2", "title" -> "What's going on",
    "display" -> Map("from_" -> "blah@example.com", "subject" -> "What's going on"))

  test("dot-path substitution with autoescape (test_plugin.py:19-26)") {
    val out = DisplayTemplate.render("emails.db/emails",
      "<p>Email from {{ display.from_ }}, subject {{ display.subject }}", emailCtx)
    assert(out == "<p>Email from blah@example.com, subject What&#39;s going on")
  }

  test("literal text is untouched; |safe opts out of escaping") {
    val ctx = Map[String, Any]("v" -> "<b>bold</b>")
    assert(DisplayTemplate.render("t1", """say "hi" {{ v }}""", ctx) ==
      "say \"hi\" &lt;b&gt;bold&lt;/b&gt;")
    assert(DisplayTemplate.render("t2", "{{ v|safe }}", ctx) == "<b>bold</b>")
  }

  test("missing paths render empty (Jinja Undefined)") {
    assert(DisplayTemplate.render("t3",
      "[{{ display.nope }}][{{ missing.deep.path }}]", emailCtx) == "[][]")
  }

  test("template errors raise without template_debug") {
    intercept[DisplayTemplate.TemplateError](
      DisplayTemplate.render("t4", "{% for x in y %}", emailCtx))
    intercept[DisplayTemplate.TemplateError](
      DisplayTemplate.render("t5", "{{ func(arg) }}", emailCtx))
  }

  test("template_debug renders the red error block (reference __init__.py:179-185)") {
    val out = DisplayTemplate.render("t6", "{% broken %}", emailCtx,
      templateDebug = true)
    assert(out.startsWith("""<p style="color: red">"""))
    assert(out.contains("<p>Template:</p><pre>"))
    assert(out.contains(DisplayTemplate.escapeHtml("{% broken %}")))
  }

  test("default rendering: escaped JSON <pre> block (reference __init__.py:186-189)") {
    val out = DisplayTemplate.renderDefault(Map("a" -> "x<y", "b" -> null))
    assert(out == "<pre>{&#34;a&#34;: &#34;x&lt;y&#34;, &#34;b&#34;: null}</pre>")
  }

  test("compiled templates are cached per (type, template)") {
    val c1 = DisplayTemplate.compile("{{ a }}")
    assert(c1.render(Map("a" -> "1")) == "1")
  }

  // ---- control flow (reference templates/beta.html:43-88) ----------

  test("{% if %} truthiness: beta.html:3 title pattern") {
    val tpl = "Dogsheep Beta{% if q %}: {{ q }}{% endif %}"
    assert(DisplayTemplate.render("c1", tpl, Map("q" -> "owl")) ==
      "Dogsheep Beta: owl")
    assert(DisplayTemplate.render("c1", tpl, Map("q" -> "")) == "Dogsheep Beta")
    assert(DisplayTemplate.render("c1", tpl, Map[String, Any]()) ==
      "Dogsheep Beta")
  }

  test("{% if %} != comparison: beta.html:52 pluralize pattern") {
    val tpl = "{{ count }} result{% if count != 1 %}s{% endif %}"
    assert(DisplayTemplate.render("c2", tpl, Map("count" -> 2)) == "2 results")
    assert(DisplayTemplate.render("c2", tpl, Map("count" -> 1)) == "1 result")
  }

  test("{% if %} string equality and elif/else chain") {
    val tpl = "{% if sort == 'newest' %}N{% elif sort == 'oldest' %}O" +
      "{% else %}R{% endif %}"
    assert(DisplayTemplate.render("c3", tpl, Map("sort" -> "newest")) == "N")
    assert(DisplayTemplate.render("c3", tpl, Map("sort" -> "oldest")) == "O")
    assert(DisplayTemplate.render("c3", tpl, Map("sort" -> "relevance")) == "R")
  }

  test("{% for %} over maps with loop.last separator: beta.html:54-55") {
    val tpl = "{% for s in sorts %}<a href=\"{{ s.url }}\">{{ s.label }}</a>" +
      "{% if not loop.last %} / {% endif %}{% endfor %}"
    val ctx = Map[String, Any]("sorts" -> Seq(
      Map("url" -> "?sort=new", "label" -> "newest"),
      Map("url" -> "?sort=old", "label" -> "oldest")))
    assert(DisplayTemplate.render("c4", tpl, ctx) ==
      "<a href=\"?sort=new\">newest</a> / <a href=\"?sort=old\">oldest</a>")
  }

  test("{% for %} with nested {% if %}: beta.html:66-72 facet items") {
    val tpl = "{% for item in results %}" +
      "{% if item.selected %}[{{ item.label }}]{% else %}{{ item.label }}" +
      "{% endif %} {% endfor %}"
    val ctx = Map[String, Any]("results" -> Seq(
      Map("label" -> "dogs", "selected" -> true),
      Map("label" -> "cats", "selected" -> false)))
    assert(DisplayTemplate.render("c5", tpl, ctx) == "[dogs] cats ")
  }

  test("{% for %} over an Undefined path iterates as empty (Jinja Undefined)") {
    assert(DisplayTemplate.render("c6",
      "a{% for x in missing %}X{% endfor %}b", Map[String, Any]()) == "ab")
  }

  test("loop.index/index0/first/length inside nested loops") {
    val tpl = "{% for x in xs %}{{ loop.index }}:{{ x }}" +
      "{% if loop.first %}*{% endif %};{% endfor %}"
    assert(DisplayTemplate.render("c7", tpl,
      Map[String, Any]("xs" -> Seq("a", "b", "c"))) == "1:a*;2:b;3:c;")
  }

  test("autoescape applies inside control blocks") {
    val out = DisplayTemplate.render("c8",
      "{% for x in xs %}{{ x }}{% endfor %}",
      Map[String, Any]("xs" -> Seq("<b>")))
    assert(out == "&lt;b&gt;")
  }

  test("unterminated {% if %} and stray {% endif %} raise") {
    intercept[DisplayTemplate.TemplateError](
      DisplayTemplate.compile("{% if a %}x"))
    intercept[DisplayTemplate.TemplateError](
      DisplayTemplate.compile("x{% endif %}"))
    intercept[DisplayTemplate.TemplateError](
      DisplayTemplate.compile("{% extends 'base.html' %}"))
  }
}
