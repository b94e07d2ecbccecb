package graft.serve

import graft.{RefFixtures, TestSpark}
import graft.index.IndexJob
import graft.query.SearchEngine.Request
import graft.text.Tokenize
import org.scalatest.funsuite.AnyFunSuite
import java.net.{HttpURLConnection, URI}
import scala.io.Source

/** The `/-/beta` serving shell: HTML rendering of the assembled page
  * (reference templates/beta.html:38-92) and a live HTTP round-trip on
  * an ephemeral port (reference register_routes, __init__.py:261-263).
  */
class BetaServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val index = {
    RefFixtures.registerPlugin(spark)
    IndexJob.buildIndex(spark, RefFixtures.pluginRules).cache()
  }

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  test("render: count line, form state, facets, and |safe result output") {
    val page = SearchPage.assemble(spark, index, RefFixtures.pluginRules,
      Request(q = Some("things"), tokenize = Tokenize.Porter))
    val html = BetaHtml.render(page)
    assert(html.contains("<title>Dogsheep Beta: things</title>"))
    assert(html.contains("Got 3 results, sorted by"))
    assert(html.contains("<strong>relevance</strong>"))
    // other-sort links " / "-joined with no trailing separator
    assert(html.contains("""<a href="?q=things&amp;sort=newest">newest</a> / <a href="?q=things&amp;sort=oldest">oldest</a>"""))
    // relevance is the default: no hidden sort field
    assert(!html.contains("name=\"sort\""))
    // facet block with a toggle link and an intcomma'd count
    assert(html.contains("<h2>type</h2>"))
    assert(html.contains("""<a href="?type=emails.db%2Femails&amp;q=things" class="label">emails.db/emails</a> - <span class="count">2</span>"""))
    // result divs keyed type:key, carrying the pre-rendered |safe output
    assert(html.contains("""data-table-key="github.db/commits:"""))
    assert(html.contains("<p>Commit to dogsheep/dogsheep-beta on 2020-08-01T00:05:02"))
  }

  test("render: selected facet deselects with ✖; hidden filter fields carried") {
    val page = SearchPage.assemble(spark, index, RefFixtures.pluginRules,
      Request(q = Some("things"), isPublic = Some("1"), tokenize = Tokenize.Porter))
    val html = BetaHtml.render(page)
    assert(html.contains("""<li class="selected"><span class="label">1</span> <a href="?q=things" class="x">✖</a>"""))
    assert(html.contains("""<input type="hidden" name="is_public" value="1">"""))
    assert(html.contains("Got 1 result,")) // singular, no 's'
  }

  test("render: timeline page carries the sort as a hidden form field") {
    val page = SearchPage.assemble(spark, index, RefFixtures.pluginRules,
      Request(q = None, tokenize = Tokenize.Porter))
    val html = BetaHtml.render(page)
    assert(page.sortedBy == "newest")
    assert(html.contains("""<input type="hidden" name="sort" value="newest">"""))
    assert(html.contains("<title>Dogsheep Beta</title>")) // no ': q' suffix
  }

  test("query-string parsing: parse_qsl+dict semantics") {
    assert(BetaServer.parseQuery("q=hey+there&type=a%2Fb&q=last") ==
      Map("q" -> "last", "type" -> "a/b"))
    assert(BetaServer.parseQuery(null) == Map.empty)
    assert(BetaServer.parseQuery("q=") == Map("q" -> ""))
    val req = BetaServer.toRequest(
      Map("q" -> "x", "is_public" -> "1", "timestamp__date" -> "2020-08-01",
        "sort" -> "oldest"), Tokenize.Porter)
    assert(req == Request(q = Some("x"), isPublic = Some("1"),
      timestampDate = Some("2020-08-01"), sort = Some("oldest"),
      tokenize = Tokenize.Porter))
  }

  test("live HTTP round-trip on an ephemeral port") {
    val server = BetaServer.start(spark, index, RefFixtures.pluginRules,
      port = 0, tokenize = Tokenize.Porter)
    try {
      val base = s"http://localhost:${server.getAddress.getPort}/-/beta"
      val (code, body) = get(s"$base?q=things")
      assert(code == 200, s"body: ${body.take(2000)}")
      // the served bytes ARE the renderer's output for the same request
      val expected = BetaHtml.render(SearchPage.assemble(spark, index,
        RefFixtures.pluginRules, Request(q = Some("things"), tokenize = Tokenize.Porter)))
      assert(body == expected)

      // filtered request: the filter narrows results AND facet counts
      val (c2, b2) = get(s"$base?q=things&is_public=1")
      assert(c2 == 200 && b2.contains("Got 1 result,"), s"c2=$c2 body: ${b2.take(1500)}")

      // malformed filter value filters to empty, never 500s (the
      // try_cast contract — SQLite's loose parameter binding)
      val (c3, b3) = get(s"$base?q=things&category=banana")
      assert(c3 == 200 && b3.contains("Got 0 results"), s"c3=$c3 body: ${b3.take(1500)}")

      // _searchmode=raw: a well-formed query behaves exactly as default
      val (c4, b4) = get(s"$base?q=things&_searchmode=raw")
      assert(c4 == 200 && b4 == body, s"c4=$c4")
      // ...but a query that only the escape fallback could serve now
      // surfaces its parse error instead of degrading (reference
      // __init__.py:200-211: raw skips escape_fts)
      val (c5, _) = get(s"$base?q=%23hashtag")
      assert(c5 == 200, "default mode escapes #hashtag")
      val (c6, b6) = get(s"$base?q=%23hashtag&_searchmode=raw")
      assert(c6 == 500 && b6.contains("500"), s"c6=$c6 body: ${b6.take(500)}")

      // the Leaflet map shortcut ships on every page (beta.html:92-145)
      assert(body.contains("data-map-latitude") &&
        body.contains("unpkg.com/leaflet@1.5.1"))
    } finally server.stop(0)
  }
}
