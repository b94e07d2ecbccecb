package graft.serve

import graft.serve.DisplayTemplate.escapeHtml
import graft.serve.SearchPage.{Facet, Page}

/** HTML rendering of a [[SearchPage.Page]] — the engine-side equivalent
  * of the reference's `beta.html` content block (reference
  * dogsheep_beta/templates/beta.html:1-92): title, search form with
  * hidden filter fields, the "Got N results, sorted by" line with
  * other-sort links, the facet sidebar with toggle/deselect links, and
  * one `div.result` per row carrying the pre-rendered (`|safe`) display
  * output.
  *
  * The reference extends Datasette's `base.html` and ships a Leaflet
  * map loader; both are host-page chrome, not query results, so this
  * renderer emits a standalone document with the same content block.
  * All interpolated values are HTML-escaped EXCEPT `result.output`,
  * which the template marks `|safe` because [[DisplayTemplate]] already
  * autoescaped every variable while rendering it.
  */
object BetaHtml {

  private val style =
    """.result { padding: 1em 0; border-bottom: 1px solid #666; }
      |.result img { max-width: 100%; }
      |.facet h2 { font-size: 1em; }
      |.facet .x:link, .facet .x:visited, .facet .x:hover,
      |.facet .x:focus, .facet .x:active { text-decoration: none; }
      |.facet .label { word-wrap: break-word; }
      |aside { float: right; width: 30%; }
      |section.results { margin-right: 30%; padding-right: 2em; }
      |pre, blockquote { white-space: pre-wrap; }
      |""".stripMargin

  /** Render the full page document. */
  def render(page: Page): String = {
    val sb = new StringBuilder(8192)
    val title = "Dogsheep Beta" + (if (page.q.nonEmpty) ": " + page.q else "")
    sb ++= "<!DOCTYPE html>\n<html>\n<head>\n<meta charset=\"utf-8\">\n"
    sb ++= s"<title>${escapeHtml(title)}</title>\n<style>\n$style</style>\n</head>\n<body>\n"
    sb ++= s"<h1>${escapeHtml(title)}</h1>\n\n"

    // search form (beta.html:40-49): q box, sort carried as a hidden
    // field when non-default, the active FILTER_COLS as hidden fields
    sb ++= "<form action=\"/-/beta\" method=\"get\"><div>\n"
    sb ++= s"""    <input type="search" name="q" value="${escapeHtml(page.q)}" id="q">\n"""
    if (page.sortedBy != "relevance")
      sb ++= s"""    <input type="hidden" name="sort" value="${escapeHtml(page.sortedBy)}">\n"""
    sb ++= "    <input type=\"submit\" value=\"Search\">\n"
    page.hiddens.foreach { h =>
      sb ++= s"""    <input type="hidden" name="${escapeHtml(h.name)}" value="${escapeHtml(h.value)}">\n"""
    }
    sb ++= "</div></form>\n\n"

    // "Got 1,234 results, sorted by newest / relevance / oldest"
    // (beta.html:51-56): intcomma count, pluralized, sort links joined
    // with " / " and no trailing separator (loop.last contract)
    val plural = if (page.count != 1L) "s" else ""
    sb ++= s"<p>Got ${SearchPage.intcomma(page.count)} result$plural, sorted by\n"
    sb ++= s"    <strong>${escapeHtml(page.sortedBy)}</strong> /\n    "
    sb ++= page.otherSortOrders.map { s =>
      s"""<a href="${escapeHtml(s.url)}">${escapeHtml(s.label)}</a>"""
    }.mkString(" / ")
    sb ++= "\n</p>\n\n<aside>\n"

    page.facets.foreach(f => renderFacet(sb, f))
    sb ++= "</aside>\n\n<section class=\"results\">\n"

    page.results.foreach { r =>
      val key = r.getOrElse("type", "") + ":" + r.getOrElse("key", "")
      sb ++= s"""    <div class="result" data-table-key="${escapeHtml(key)}">\n"""
      // |safe: DisplayTemplate.render already autoescaped its variables
      sb ++= "        " + r.getOrElse("output", "") + "\n    </div>\n"
    }
    sb ++= "</section>\n</body>\n</html>\n"
    sb.result()
  }

  /** One facet block (beta.html:59-80); empty facets are skipped
    * entirely (`{% if facet.results %}`).
    */
  private def renderFacet(sb: StringBuilder, f: Facet): Unit = {
    if (f.values.isEmpty) return
    sb ++= s"""    <div class="facet">\n        <h2>${escapeHtml(f.name)}</h2>\n        <ul>\n"""
    f.values.foreach { v =>
      val liCls = if (v.selected) " class=\"selected\"" else ""
      sb ++= s"            <li$liCls>"
      if (v.selected)
        // selected: plain label + an ✖ deselect link (beta.html:67-68)
        sb ++= s"""<span class="label">${escapeHtml(v.label)}</span> <a href="${escapeHtml(v.toggleUrl)}" class="x">✖</a>"""
      else
        sb ++= s"""<a href="${escapeHtml(v.toggleUrl)}" class="label">${escapeHtml(v.label)}</a>"""
      sb ++= s""" - <span class="count">${SearchPage.intcomma(v.count)}</span></li>\n"""
    }
    sb ++= "        </ul>\n    </div>\n"
  }
}
