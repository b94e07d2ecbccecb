package graft.serve

import graft.core.{IndexRule, Schema}
import graft.query.{Enrich, SearchEngine}
import graft.query.SearchEngine.{Request, TextArtifacts}
import graft.text.FtsQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.net.URLEncoder

/** The full `/-/beta` page assembled in-engine: results + total count +
  * the four facets (with Datasette-contract toggle URLs and labels) +
  * batched display enrichment + rendered display templates + sort-link
  * and hidden-field state — the whole reference request lifecycle
  * (reference dogsheep_beta/__init__.py:55-108 / SURVEY §3.2) as one
  * result object. HTML layout (beta.html, Leaflet maps) stays out of
  * engine scope; the page is data.
  *
  * Where the reference makes one SQL round-trip per facet, an
  * in-process HTTP call for counts, and a point query per result row,
  * this assembly runs: one top-k job, one GROUPING SETS job for
  * count + all four facets (capped per facet INSIDE the job — the
  * driver never collects an unbounded value list), and one enrichment
  * join per result type.
  */
object SearchPage {

  final case class FacetValue(value: String, label: String, count: Long,
      toggleUrl: String, selected: Boolean)
  final case class Facet(name: String, values: Seq[FacetValue])
  /** A sort link (reference `other_sort_orders`, __init__.py:68-80). */
  final case class SortLink(label: String, url: String)
  /** A hidden form field (reference `hiddens`, __init__.py:89-93). */
  final case class Hidden(name: String, value: String)
  final case class Page(q: String, count: Long, results: Seq[Map[String, String]],
      facets: Seq[Facet], sortedBy: String, otherSortOrders: Seq[SortLink],
      hiddens: Seq[Hidden])

  /** Datasette's default facet value cap (`facet_size`). */
  val DefaultFacetSize = 30

  /** `intcomma` number formatting for "Got 1,234 results"
    * (reference __init__.py:266-268).
    */
  def intcomma(n: Long): String = "%,d".formatLocal(java.util.Locale.US, n)

  /** The result row as JSON with sorted keys — the data part of the
    * reference's default `<pre>` rendering (__init__.py:186-189).
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

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")

  /** The request's active filter params in canonical order — the state
    * every page URL must preserve.
    */
  private def activeFilters(req: Request): Seq[(String, String)] = Seq(
    req.typeFilter.map("type" -> _),
    req.category.map("category" -> _),
    req.isPublic.map("is_public" -> _),
    req.timestampDate.map("timestamp__date" -> _)
  ).flatten

  /** Datasette facet-value toggle URL: all ACTIVE filters preserved,
    * the toggled param added — or REMOVED when already selected (the
    * deselect contract) — `_`-prefixed params dropped, `q` re-injected
    * (reference __init__.py:248-257; expected URLs
    * tests/test_plugin.py:45-108).
    */
  private[graft] def toggleUrl(req: Request, q: String, param: String,
      value: String, selected: Boolean): String = {
    val actives = activeFilters(req).filterNot(_ == (param -> value))
    val toggled = if (selected) actives else actives :+ (param -> value)
    // q is ALWAYS re-injected, even when empty — the reference sets
    // qs_bits["q"] = q unconditionally (__init__.py:256), so timeline
    // toggle URLs end in `&q=` (ADVICE r3)
    val pairs = toggled :+ ("q" -> q)
    "?" + pairs.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
  }

  /** A page URL carrying q + active filters (+ an optional sort) — the
    * engine form of datasette's path_with_replaced/removed_args.
    */
  private def pageUrl(req: Request, q: String, sort: Option[String]): String = {
    val pairs = (if (q.nonEmpty) Seq("q" -> q) else Seq.empty) ++
      activeFilters(req) ++ sort.map("sort" -> _).toSeq
    if (pairs.isEmpty) "?"
    else "?" + pairs.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
  }

  /** Resolved sort + the other-sort links (reference __init__.py:64-80):
    * default is relevance with a query, newest without; `relevance`
    * never appears as a link on timeline pages; the relevance link
    * REMOVES the sort param, the others replace it.
    */
  private[graft] def sortState(req: Request, q: String): (String, Seq[SortLink]) = {
    val default = if (q.nonEmpty) "relevance" else "newest"
    val sortedBy = req.sort.filter(Set("newest", "oldest")).getOrElse(default)
    val others = Seq("relevance", "newest", "oldest")
      .filterNot(s => s == "relevance" && q.isEmpty)
      .filterNot(_ == sortedBy)
      .map { s =>
        SortLink(s, pageUrl(req, q, if (s == "relevance") None else Some(s)))
      }
    (sortedBy, others)
  }

  /** Assemble the page for a request. `arts` = prebuilt text artifacts;
    * facets reflect the same filtered+matched set the results come from
    * (reference __init__.py:200-223).
    */
  def assemble(spark: SparkSession, index: DataFrame, rules: Seq[IndexRule],
      req: Request, arts: Option[TextArtifacts] = None,
      facetSize: Int = DefaultFacetSize, templateDebug: Boolean = false): Page = {

    val q = req.q.getOrElse("").trim
    val results = SearchEngine.search(spark, index, req, arts)

    // the facet base: same filters + match as the result set, pre-top-k
    val parsed =
      req.q.flatMap(FtsQuery.parseRequest(_, req.tokenize, req.rawMode))
    val filtered = Seq(
      req.typeFilter.map(v => col("type") === v),
      // try_cast, like SearchEngine.search: a malformed querystring
      // value must filter to empty, not raise (the reference binds
      // filters as SQLite parameters, which never error)
      req.category.map(v => col("category") === lit(v).try_cast("int")),
      req.isPublic.map(v => col("is_public") === lit(v).try_cast("int")),
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

    // ONE job: count + all four facets via grouping sets, each facet
    // capped to `facetSize` values (count desc, value asc) INSIDE the
    // job — the driver collects ≤ 4·facetSize+1 rows, never one row per
    // distinct date (Datasette's facet_size contract).
    base.createOrReplaceTempView("__facet_base")
    val gsAll = spark.sql(
      """SELECT type, category, is_public, substring(timestamp, 1, 10) AS ts_date,
        |       grouping(type) AS g_t, grouping(category) AS g_c,
        |       grouping(is_public) AS g_p, grouping(substring(timestamp, 1, 10)) AS g_d,
        |       count(1) AS n
        |FROM __facet_base
        |GROUP BY GROUPING SETS ((type), (category), (is_public),
        |                        (substring(timestamp, 1, 10)), ())""".stripMargin)
    val facetVal = coalesce(col("type"), col("category").cast("string"),
      col("is_public").cast("string"), col("ts_date"))
    val gs = gsAll
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("g_t"), col("g_c"), col("g_p"), col("g_d"))
          .orderBy(col("n").desc, facetVal.asc_nulls_first)))
      .filter(col("__rk") <= facetSize)
      .collect()

    val total = gs.find(r => r.getAs[Byte]("g_t") == 1 && r.getAs[Byte]("g_c") == 1 &&
      r.getAs[Byte]("g_p") == 1 && r.getAs[Byte]("g_d") == 1)
      .map(_.getAs[Long]("n")).getOrElse(0L)

    val categoryNames = Schema.categorySeed.toMap

    def facetOf(name: String, param: String, valueOf: org.apache.spark.sql.Row => Option[String],
        label: String => String, selectedVal: Option[String]): Facet = {
      val vals = gs.flatMap { r =>
        valueOf(r).map { v =>
          val selected = selectedVal.contains(v)
          FacetValue(v, label(v), r.getAs[Long]("n"),
            toggleUrl(req, q, param, v, selected), selected)
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

    val rulesByType = rules.map(r => r.typeTag -> r).toMap

    val resultMaps = resultRows.map { r =>
      val typeTag = r.getAs[String]("type")
      val baseCols = results.columns.map(c =>
        c -> Option(r.getAs[Any](c)).map(_.toString).orNull).toMap
      val display = enrichedByType.get(typeTag)
        .flatMap(_.get(r.getAs[String]("key"))).getOrElse(Map.empty[String, String])
      // rendered output per row (reference __init__.py:169-189): the
      // rule's display template over {row, display.*}, else the default
      // escaped-JSON block
      val displayDict: Map[String, Any] =
        display.map { case (k, v) => k.stripPrefix("display_") -> (v: Any) }
      val output = rulesByType.get(typeTag).flatMap(_.display) match {
        case Some(tpl) =>
          DisplayTemplate.render(typeTag, tpl,
            baseCols ++ Map("display" -> displayDict), templateDebug)
        case None => DisplayTemplate.renderDefault(baseCols)
      }
      baseCols ++ display + ("output" -> output)
    }.toSeq

    val (sortedBy, otherSorts) = sortState(req, q)
    val hiddens = Seq(
      req.typeFilter.map(Hidden("type", _)),
      req.category.map(Hidden("category", _)),
      req.isPublic.map(Hidden("is_public", _))
    ).flatten

    Page(q, total, resultMaps, facets, sortedBy, otherSorts, hiddens)
  }
}
