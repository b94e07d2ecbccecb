package graft.serve

import graft.core.{IndexRule, Schema}
import graft.query.{Enrich, SearchEngine}
import graft.query.SearchEngine.{Request, TextArtifacts}
import graft.text.FtsQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.net.URLEncoder

/** The full `/-/beta` page assembled in-engine: results + total count +
  * the four facets (with Datasette-contract toggle URLs and labels) +
  * batched display enrichment — the whole reference request lifecycle
  * (reference dogsheep_beta/__init__.py:55-108 / SURVEY §3.2) as one
  * result object. HTML rendering (Jinja templates, Leaflet maps) stays
  * out of engine scope; the page is data.
  *
  * Where the reference makes one SQL round-trip per facet, an
  * in-process HTTP call for counts, and a point query per result row,
  * this assembly runs: one top-k job, one GROUPING SETS job for
  * count + all four facets, and one enrichment join per result type.
  */
object SearchPage {

  final case class FacetValue(value: String, label: String, count: Long,
      toggleUrl: String, selected: Boolean)
  final case class Facet(name: String, values: Seq[FacetValue])
  final case class Page(q: String, count: Long, results: Seq[Map[String, String]],
      facets: Seq[Facet])

  /** `intcomma` number formatting for "Got 1,234 results"
    * (reference __init__.py:266-268).
    */
  def intcomma(n: Long): String = "%,d".formatLocal(java.util.Locale.US, n)

  /** Default rendering for rules without a display template: the result
    * row as JSON, sorted keys (reference __init__.py:186-189 renders a
    * JSON `<pre>` block; the engine returns the data, not the HTML).
    */
  private[graft] def rowJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      val vs = if (v == null) "null" else "\"" + escape(v) + "\""
      "\"" + escape(k) + "\": " + vs
    }.mkString("{", ", ", "}")

  private def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Datasette facet-value toggle URL: `?<param>=<value>&q=<q>` —
    * non-underscore params only, `q` re-injected
    * (reference __init__.py:248-257; expected URLs
    * tests/test_plugin.py:45-108).
    */
  private[graft] def toggleUrl(param: String, value: String, q: String): String = {
    def enc(s: String) = URLEncoder.encode(s, "UTF-8")
    val qPart = if (q.nonEmpty) s"&q=${enc(q)}" else ""
    s"?$param=${enc(value)}$qPart"
  }

  /** Assemble the page for a request. `fullFacetIndex` = the same
    * filtered+matched set the results come from (facets reflect the
    * current search, reference __init__.py:200-223).
    */
  def assemble(spark: SparkSession, index: DataFrame, rules: Seq[IndexRule],
      req: Request, arts: Option[TextArtifacts] = None): Page = {

    val q = req.q.getOrElse("").trim
    val results = SearchEngine.search(spark, index, req, arts)

    // the facet base: same filters + match as the result set, pre-top-k
    val parsed = req.q.flatMap(FtsQuery.parseOrEscape(_, req.tokenize))
    val filtered = Seq(
      req.typeFilter.map(v => col("type") === v),
      req.category.map(v => col("category") === lit(v).cast("int")),
      req.isPublic.map(v => col("is_public") === lit(v).cast("int")),
      req.timestampDate.map(d => substring(col("timestamp"), 1, 10) === d)
    ).flatten.foldLeft(index)(_ filter _)
    val base = parsed match {
      case None => filtered
      case Some(node) =>
        val a = arts.getOrElse {
          val toks = graft.index.TextIndex.docTokens(index, req.tokenize)
          TextArtifacts(toks, graft.index.TextIndex.postings(toks))
        }
        filtered.join(SearchEngine.matchSet(a, node), Seq("type", "key"))
    }

    // ONE job: count + all four facets via grouping sets
    base.createOrReplaceTempView("__facet_base")
    val gs = spark.sql(
      """SELECT type, category, is_public, substring(timestamp, 1, 10) AS ts_date,
        |       grouping(type) AS g_t, grouping(category) AS g_c,
        |       grouping(is_public) AS g_p, grouping(substring(timestamp, 1, 10)) AS g_d,
        |       count(1) AS n
        |FROM __facet_base
        |GROUP BY GROUPING SETS ((type), (category), (is_public),
        |                        (substring(timestamp, 1, 10)), ())""".stripMargin)
      .collect()

    val total = gs.find(r => r.getAs[Byte]("g_t") == 1 && r.getAs[Byte]("g_c") == 1 &&
      r.getAs[Byte]("g_p") == 1 && r.getAs[Byte]("g_d") == 1)
      .map(_.getAs[Long]("n")).getOrElse(0L)

    val categoryNames = Schema.categorySeed.toMap

    def facetOf(name: String, param: String, valueOf: org.apache.spark.sql.Row => Option[String],
        label: String => String, selectedVal: Option[String]): Facet = {
      val vals = gs.flatMap { r =>
        valueOf(r).map { v =>
          FacetValue(v, label(v), r.getAs[Long]("n"),
            toggleUrl(param, v, q), selectedVal.contains(v))
        }
      }.sortBy(fv => (-fv.count, fv.value)).toSeq
      Facet(name, vals)
    }

    def grouped(r: org.apache.spark.sql.Row, own: String): Boolean =
      r.getAs[Byte](s"g_$own") == 0

    val facets = Seq(
      facetOf("type", "type",
        r => if (grouped(r, "t")) Option(r.getAs[String]("type")) else None,
        identity, req.typeFilter),
      facetOf("category", "category",
        r => if (grouped(r, "c")) Option(r.getAs[Integer]("category")).map(_.toString) else None,
        v => categoryNames.get(v.toInt).getOrElse(v), req.category),
      facetOf("is_public", "is_public",
        r => if (grouped(r, "p")) Option(r.getAs[Integer]("is_public")).map(_.toString) else None,
        identity, req.isPublic),
      facetOf("timestamp", "timestamp__date",
        r => if (grouped(r, "d")) Option(r.getAs[String]("ts_date")) else None,
        identity, req.timestampDate)
    )

    // batched enrichment: one join per type present in the page
    val resultRows = results.collect()
    val presentTypes = resultRows.map(_.getAs[String]("type")).distinct
    val enrichedByType: Map[String, Map[String, Map[String, String]]] =
      rules.filter(r => presentTypes.contains(r.typeTag) && r.displaySql.isDefined)
        .map { rule =>
          val e = Enrich.enrichType(spark, rule, results, q)
          rule.typeTag -> e.collect().map { row =>
            val displayCols = e.columns.filter(_.startsWith("display_"))
            row.getAs[String]("key") ->
              displayCols.map(c => c -> Option(row.getAs[Any](c)).map(_.toString).orNull).toMap
          }.toMap
        }.toMap

    val resultMaps = resultRows.map { r =>
      val baseCols = results.columns.map(c =>
        c -> Option(r.getAs[Any](c)).map(_.toString).orNull).toMap
      val display = enrichedByType.get(r.getAs[String]("type"))
        .flatMap(_.get(r.getAs[String]("key"))).getOrElse(Map.empty)
      // default rendering when the rule has no display template
      val withDefault =
        if (display.nonEmpty) display
        else Map("display_json" -> rowJson(baseCols))
      baseCols ++ withDefault
    }.toSeq

    Page(q, total, resultMaps, facets)
  }
}
