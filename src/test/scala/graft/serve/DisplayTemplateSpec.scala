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
}
