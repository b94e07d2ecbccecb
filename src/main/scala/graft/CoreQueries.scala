package graft

import graft.core.Schema
import graft.index.IndexJob
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.1–§2.5 core operators as declared, oracle-checked queries.
  *
  * Naming convention: the prefix is the SURVEY §2 operator id
  * (s* = scans/sources/sinks, p* = predicates, j* = joins,
  * a* = aggregations, o* = sorts/top-k, f* = scalar functions,
  * w* = windows, q* = the arbitrary-user-SQL surface).
  */
object CoreQueries {

  private def withSources(spark: SparkSession, sfDir: String)(f: => DataFrame): DataFrame = {
    Corpus.registerSources(spark, sfDir)
    f
  }

  /** Shared filtered view used by facet/count queries — mirrors the
    * reference's "same WHERE for results + facets" contract
    * (reference __init__.py:193-258): is_public = 1.
    */
  private def publicIndex(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.searchIndex(spark, sfDir).filter(col("is_public") === 1)

  private val publicOracleWhere = "WHERE is_public = 1"

  val defs: Seq[QueryDef] = Seq(

    // S3: arbitrary user extraction SQL (join + CASE + || surface).
    QueryDef(
      "s3_user_sql_join",
      (spark, sfDir) => withSources(spark, sfDir) {
        Schema.conform(
            spark.sql(Corpus.rules.find(_.db == "tpch.db").get.sql)
              .withColumn("type", lit("tpch.db/orders")))
          .orderBy("key")
      },
      Some(Corpus.oracleWithIndex(
        """SELECT * FROM search_index WHERE "type" = 'tpch.db/orders' ORDER BY "key""""))
    ),

    // S2+S4: multi-source scan + type-tag injection over the full build.
    QueryDef(
      "s4_type_tag",
      (spark, sfDir) =>
        Corpus.searchIndex(spark, sfDir)
          .groupBy("type").agg(count(lit(1)).as("n_docs"))
          .orderBy("type"),
      Some(Corpus.oracleWithIndex(
        """SELECT "type", count(*) AS n_docs FROM search_index GROUP BY "type" ORDER BY "type""""))
    ),

    // S2: -d database allowlist — index only a subset of the configured
    // sources (reference cli.py:27-32).
    QueryDef(
      "s2_multidb_allowlist",
      (spark, sfDir) => withSources(spark, sfDir) {
        IndexJob.buildIndex(spark, Corpus.rules,
            databases = Some(Set("docs.db", "events.db")))
          .groupBy("type").agg(count(lit(1)).as("n_docs"))
          .orderBy("type")
      },
      Some(
        """SELECT 'docs.db/documents' AS "type", count(*) AS n_docs FROM documents
          |UNION ALL
          |SELECT 'events.db/events', count(*) FROM events
          |ORDER BY "type"""".stripMargin)
    ),

    // S3+J2: extraction SQL may use window functions — index each
    // customer's LATEST order only (the user-SQL surface is full Spark
    // SQL; reference README.md:30-48).
    QueryDef(
      "s3_user_sql_window",
      (spark, sfDir) => withSources(spark, sfDir) {
        Schema.conform(spark.sql(
          """select cast(o_custkey as string) as key,
            |       concat('Customer ', cast(o_custkey as string),
            |              ' latest order ', cast(o_orderkey as string)) as title,
            |       date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') as timestamp,
            |       cast(1 as int) as category
            |from (
            |  select *, row_number() over (
            |    partition by o_custkey
            |    order by o_orderdate desc, o_orderkey desc) as rn
            |  from orders
            |) where rn = 1""".stripMargin)
          .withColumn("type", lit("tpch.db/customer_latest")))
          .orderBy("key")
      },
      Some(
        """SELECT 'tpch.db/customer_latest' AS "type",
          |       CAST(o_custkey AS VARCHAR) AS "key",
          |       'Customer ' || CAST(o_custkey AS VARCHAR) ||
          |         ' latest order ' || CAST(o_orderkey AS VARCHAR) AS title,
          |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS "timestamp",
          |       CAST(1 AS INTEGER) AS category, 0 AS is_public,
          |       CAST(NULL AS VARCHAR) AS search_1,
          |       CAST(NULL AS VARCHAR) AS search_2,
          |       CAST(NULL AS VARCHAR) AS search_3
          |FROM (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY o_custkey
          |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          |  FROM orders
          |) t WHERE rn = 1
          |ORDER BY "key"""".stripMargin)
    ),

    // S6: REPLACE-upsert merge — batch 2 overwrites batch 1 on (type,key),
    // unmatched batch-1 rows survive (reference utils.py:50-54).
    QueryDef(
      "s6_upsert_merge",
      (spark, sfDir) => withSources(spark, sfDir) {
        val v1 = Schema.conform(spark.sql(
          """select cast(doc_id as string) as key, concat('v1 ', source) as title,
            |       lang as search_1 from documents""".stripMargin)
          .withColumn("type", lit("docs.db/documents")))
        val v2 = Schema.conform(spark.sql(
          """select cast(doc_id as string) as key, concat('v2 ', source) as title,
            |       lang as search_1 from documents where doc_id % 5 = 0""".stripMargin)
          .withColumn("type", lit("docs.db/documents")))
        IndexJob.merge(v1, v2).select("type", "key", "title", "search_1")
          .orderBy("key")
      },
      Some(
        """WITH v1 AS (
          |  SELECT 'docs.db/documents' AS "type", CAST(doc_id AS VARCHAR) AS "key",
          |         'v1 ' || source AS title, lang AS search_1 FROM documents
          |), v2 AS (
          |  SELECT 'docs.db/documents' AS "type", CAST(doc_id AS VARCHAR) AS "key",
          |         'v2 ' || source AS title, lang AS search_1 FROM documents WHERE doc_id % 5 = 0
          |)
          |SELECT * FROM v2
          |UNION ALL
          |SELECT v1.* FROM v1 WHERE NOT EXISTS
          |  (SELECT 1 FROM v2 WHERE v2."key" = v1."key")
          |ORDER BY "key"""".stripMargin)
    ),

    // S7: dimension seed (reference utils.py:23-27).
    QueryDef(
      "s7_categories",
      (spark, _) => Schema.categories(spark).orderBy("id"),
      Some("SELECT * FROM (VALUES (1, 'created'), (2, 'saved'), (3, 'received')) AS t(id, name) ORDER BY id")
    ),

    // S5+S8: schema probe + conform — a rule projecting a partial column
    // set gets NULL padding and the is_public NOT NULL default
    // (reference utils.py:68-70, 18-21).
    QueryDef(
      "s8_schema_conform",
      (spark, sfDir) => withSources(spark, sfDir) {
        Schema.conform(
            spark.sql("select cast(n_nationkey as string) as key, n_name as title from nation")
              .withColumn("type", lit("tpch.db/nations")))
          .orderBy("key")
      },
      Some(
        """SELECT 'tpch.db/nations' AS "type", CAST(n_nationkey AS VARCHAR) AS "key",
          |       n_name AS title, CAST(NULL AS VARCHAR) AS "timestamp",
          |       CAST(NULL AS INTEGER) AS category, 0 AS is_public,
          |       CAST(NULL AS VARCHAR) AS search_1, CAST(NULL AS VARCHAR) AS search_2,
          |       CAST(NULL AS VARCHAR) AS search_3
          |FROM nation ORDER BY "key"""".stripMargin)
    ),

    // O2: timeline top-k (reference TIMELINE_SQL, __init__.py:8-24) —
    // ORDER BY timestamp DESC LIMIT 40, deterministic tie-break (type,key).
    QueryDef(
      "o2_timeline",
      (spark, sfDir) =>
        Corpus.searchIndex(spark, sfDir)
          .select("type", "key", "title", "timestamp", "category", "is_public")
          .orderBy(col("timestamp").desc, col("type"), col("key"))
          .limit(40),
      Some(Corpus.oracleWithIndex(
        """SELECT "type", "key", title, "timestamp", category, is_public
          |FROM search_index
          |ORDER BY "timestamp" DESC, "type", "key" LIMIT 40""".stripMargin))
    ),

    // O3: explicit sort override `?sort=oldest` (reference __init__.py:45-48).
    QueryDef(
      "o3_sort_oldest",
      (spark, sfDir) =>
        Corpus.searchIndex(spark, sfDir)
          .select("type", "key", "title", "timestamp")
          .orderBy(col("timestamp").asc, col("type"), col("key"))
          .limit(40),
      Some(Corpus.oracleWithIndex(
        """SELECT "type", "key", title, "timestamp"
          |FROM search_index
          |ORDER BY "timestamp" ASC, "type", "key" LIMIT 40""".stripMargin))
    ),

    // P2: equality filters from query-string args — string-typed values
    // cast to the column type (reference __init__.py:44,132-135;
    // loose-typing note SURVEY §7.4).
    QueryDef(
      "p2_filter_eq",
      (spark, sfDir) =>
        Corpus.searchIndex(spark, sfDir)
          .filter(col("type") === "tpch.db/orders")
          .filter(col("category") === lit("1").cast("int"))
          .filter(col("is_public") === lit("1").cast("int"))
          .select("type", "key", "title", "timestamp", "category", "is_public")
          .orderBy(col("timestamp").desc, col("key"))
          .limit(40),
      Some(Corpus.oracleWithIndex(
        """SELECT "type", "key", title, "timestamp", category, is_public
          |FROM search_index
          |WHERE "type" = 'tpch.db/orders' AND category = 1 AND is_public = 1
          |ORDER BY "timestamp" DESC, "key" LIMIT 40""".stripMargin))
    ),

    // P3: date-extraction filter `?timestamp__date=` — sargable prefix
    // match on the ISO text (reference __init__.py:125-127).
    QueryDef(
      "p3_date_filter",
      (spark, sfDir) =>
        Corpus.searchIndex(spark, sfDir)
          .filter(substring(col("timestamp"), 1, 10) === "2024-01-15")
          .select("type", "key", "title", "timestamp")
          .orderBy(col("timestamp").desc, col("type"), col("key")),
      Some(Corpus.oracleWithIndex(
        """SELECT "type", "key", title, "timestamp"
          |FROM search_index
          |WHERE substr("timestamp", 1, 10) = '2024-01-15'
          |ORDER BY "timestamp" DESC, "type", "key"""".stripMargin))
    ),

    // A1: filtered total count (reference `_extra=count`, __init__.py:202-206).
    QueryDef(
      "a1_count",
      (spark, sfDir) =>
        publicIndex(spark, sfDir).agg(count(lit(1)).as("n")),
      Some(Corpus.oracleWithIndex(
        s"SELECT count(*) AS n FROM search_index $publicOracleWhere"))
    ),

    // A2: column facets — count per value, ordered count desc then value
    // (Datasette facet contract; expected JSON tests/test_plugin.py:45-108).
    QueryDef(
      "a2_facet_type",
      (spark, sfDir) =>
        publicIndex(spark, sfDir)
          .groupBy("type").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("type")),
      Some(Corpus.oracleWithIndex(
        s"""SELECT "type", count(*) AS n FROM search_index $publicOracleWhere
           |GROUP BY "type" ORDER BY n DESC, "type"""".stripMargin))
    ),
    QueryDef(
      "a2_facet_category",
      (spark, sfDir) =>
        publicIndex(spark, sfDir)
          .groupBy("category").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("category")),
      Some(Corpus.oracleWithIndex(
        s"""SELECT category, count(*) AS n FROM search_index $publicOracleWhere
           |GROUP BY category ORDER BY n DESC, category""".stripMargin))
    ),
    QueryDef(
      "a2_facet_is_public",
      (spark, sfDir) =>
        Corpus.searchIndex(spark, sfDir)
          .groupBy("is_public").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("is_public")),
      Some(Corpus.oracleWithIndex(
        """SELECT is_public, count(*) AS n FROM search_index
          |GROUP BY is_public ORDER BY n DESC, is_public""".stripMargin))
    ),

    // A3: date facet — histogram over date(timestamp)
    // (reference `_facet_date`, __init__.py:204).
    QueryDef(
      "a3_facet_date",
      (spark, sfDir) =>
        publicIndex(spark, sfDir)
          .groupBy(substring(col("timestamp"), 1, 10).as("ts_date"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("ts_date")),
      Some(Corpus.oracleWithIndex(
        s"""SELECT substr("timestamp", 1, 10) AS ts_date, count(*) AS n
           |FROM search_index $publicOracleWhere
           |GROUP BY 1 ORDER BY n DESC, ts_date""".stripMargin))
    ),

    // A3 with Datasette's facet_size cap applied INSIDE the job (top-30
    // values by count desc, value asc) — the bounded-facet plan the
    // page assembly uses, as an oracle-checked query: the driver
    // receives 30 rows, never one per distinct date.
    QueryDef(
      "a3_facet_date_capped",
      (spark, sfDir) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("ts_date"))
        publicIndex(spark, sfDir)
          .groupBy(substring(col("timestamp"), 1, 10).as("ts_date"))
          .agg(count(lit(1)).as("n"))
          .withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= 30).drop("__rk")
          .orderBy(col("n").desc, col("ts_date"))
      },
      Some(Corpus.oracleWithIndex(
        s"""SELECT ts_date, n FROM (
           |  SELECT substr("timestamp", 1, 10) AS ts_date, count(*) AS n,
           |         row_number() OVER (ORDER BY count(*) DESC, substr("timestamp", 1, 10)) AS rk
           |  FROM search_index $publicOracleWhere
           |  GROUP BY 1
           |) t WHERE rk <= 30
           |ORDER BY n DESC, ts_date""".stripMargin))
    ),

    // A1+A2+A3 in ONE pass: grouping sets — the Spark-native collapse of
    // the reference's four separate facet queries (SURVEY §2.4). One
    // scan + one shuffle instead of 4 jobs.
    QueryDef(
      "a5_grouping_sets",
      (spark, sfDir) => {
        Corpus.searchIndex(spark, sfDir).createOrReplaceTempView("search_index_v")
        spark.sql(
          """SELECT type, category, is_public, substring(timestamp, 1, 10) AS ts_date,
            |       count(1) AS n
            |FROM search_index_v
            |GROUP BY GROUPING SETS ((type), (category), (is_public),
            |                        (substring(timestamp, 1, 10)), ())
            |ORDER BY type NULLS FIRST, category NULLS FIRST,
            |         is_public NULLS FIRST, ts_date NULLS FIRST""".stripMargin)
      },
      Some(Corpus.oracleWithIndex(
        """SELECT "type", category, is_public, substr("timestamp", 1, 10) AS ts_date,
          |       count(*) AS n
          |FROM search_index
          |GROUP BY GROUPING SETS (("type"), (category), (is_public),
          |                        (substr("timestamp", 1, 10)), ())
          |ORDER BY "type" NULLS FIRST, category NULLS FIRST,
          |         is_public NULLS FIRST, ts_date NULLS FIRST""".stripMargin))
    ),

    // J3: enrichment — batched display_sql lookup as ONE broadcast join
    // instead of the reference's N+1 point queries
    // (reference __init__.py:161-168; anti-pattern note SURVEY §4).
    QueryDef(
      "j3_enrich_batch",
      (spark, sfDir) => withSources(spark, sfDir) {
        val top = Corpus.searchIndex(spark, sfDir)
          .filter(col("type") === "tpch.db/orders")
          .orderBy(col("timestamp").desc, col("key"))
          .limit(40)
        val detail = spark.sql(
          """select cast(o_orderkey as string) as key, o_totalprice, c_name, c_mktsegment
            |from orders join customer on o_custkey = c_custkey""".stripMargin)
        top.join(detail, Seq("key"), "left")
          .select("type", "key", "title", "timestamp", "o_totalprice", "c_name", "c_mktsegment")
          .orderBy(col("timestamp").desc, col("key"))
      },
      Some(Corpus.oracleWithIndex(
        """SELECT t."type", t."key", t.title, t."timestamp",
          |       d.o_totalprice, d.c_name, d.c_mktsegment
          |FROM (SELECT * FROM search_index WHERE "type" = 'tpch.db/orders'
          |      ORDER BY "timestamp" DESC, "key" LIMIT 40) t
          |LEFT JOIN (SELECT CAST(o_orderkey AS VARCHAR) AS "key", o_totalprice, c_name, c_mktsegment
          |           FROM orders JOIN customer ON o_custkey = c_custkey) d
          |  ON t."key" = d."key"
          |ORDER BY t."timestamp" DESC, t."key"""".stripMargin))
    ),

    // J3 via the Enrich operator itself: the display_sql rewrite +
    // broadcast-page-keys semi-join + first-row window + display_
    // prefixing, oracle-checked end to end (reference __init__.py:161-168).
    QueryDef(
      "j3_enrich_display",
      (spark, sfDir) => withSources(spark, sfDir) {
        val page = Corpus.searchIndex(spark, sfDir)
          .filter(col("type") === "tpch.db/orders")
          .orderBy(col("timestamp").desc, col("key"))
          .limit(40)
        val rule = Corpus.rules.find(_.db == "tpch.db").get
        graft.query.Enrich.enrichType(spark, rule, page, "urgent")
          .select("type", "key", "title", "timestamp",
            "display_o_totalprice", "display_c_name", "display_c_mktsegment")
          .orderBy(col("key"))
      },
      Some(Corpus.oracleWithIndex(
        """SELECT t."type", t."key", t.title, t."timestamp",
          |       d.o_totalprice AS display_o_totalprice,
          |       d.c_name AS display_c_name,
          |       d.c_mktsegment AS display_c_mktsegment
          |FROM (SELECT * FROM search_index WHERE "type" = 'tpch.db/orders'
          |      ORDER BY "timestamp" DESC, "key" LIMIT 40) t
          |LEFT JOIN (SELECT CAST(o_orderkey AS VARCHAR) AS "key", o_totalprice, c_name, c_mktsegment
          |           FROM orders JOIN customer ON o_custkey = c_custkey) d
          |  ON t."key" = d."key"
          |ORDER BY t."key"""".stripMargin))
    ),

    // J4: facet values joined to the (broadcast) category dimension for
    // display labels (reference utils.py:17,93-97).
    QueryDef(
      "j4_category_label",
      (spark, sfDir) => {
        val facet = Corpus.searchIndex(spark, sfDir)
          .groupBy("category").agg(count(lit(1)).as("n"))
        facet.join(broadcast(Schema.categories(spark)),
            facet("category") === col("id"), "left")
          .select(col("category"), col("name"), col("n"))
          .orderBy(col("n").desc, col("category"))
      },
      Some(Corpus.oracleWithIndex(
        """SELECT f.category, c.name, f.n
          |FROM (SELECT category, count(*) AS n FROM search_index GROUP BY category) f
          |LEFT JOIN (VALUES (1, 'created'), (2, 'saved'), (3, 'received')) AS c(id, name)
          |  ON f.category = c.id
          |ORDER BY f.n DESC, f.category""".stripMargin))
    ),

    // W2: analytic window with an explicit frame — per-customer running
    // order total (decimal-summed: window accumulation order differs
    // between engines, doubles would drift; DECIMAL is exact).
    QueryDef(
      "w2_running_total",
      (spark, sfDir) => withSources(spark, sfDir) {
        spark.sql(
          """SELECT o_custkey, o_orderkey,
            |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            |         PARTITION BY o_custkey
            |         ORDER BY o_orderdate, o_orderkey
            |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            |         AS running_total,
            |       row_number() OVER (
            |         PARTITION BY o_custkey
            |         ORDER BY o_orderdate, o_orderkey) AS order_seq
            |FROM orders
            |WHERE o_custkey < 50
            |ORDER BY o_custkey, order_seq""".stripMargin)
      },
      Some(
        """SELECT o_custkey, o_orderkey,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
          |         PARTITION BY o_custkey
          |         ORDER BY o_orderdate, o_orderkey
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          |         AS running_total,
          |       row_number() OVER (
          |         PARTITION BY o_custkey
          |         ORDER BY o_orderdate, o_orderkey) AS order_seq
          |FROM orders
          |WHERE o_custkey < 50
          |ORDER BY o_custkey, order_seq""".stripMargin)
    ),

    // A6: sketch aggregation — HyperLogLog++ approximate distinct.
    // Engine-specific sketch values → rows-only check; the exact
    // distinct count is oracle-covered by q16_parts_rollup.
    QueryDef(
      "a6_approx_distinct",
      (spark, sfDir) => withSources(spark, sfDir) {
        spark.sql(
          """SELECT l_returnflag,
            |       approx_count_distinct(l_partkey) AS approx_parts,
            |       count(DISTINCT l_partkey) AS exact_parts
            |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      None
    ),

    // W1: window-function dedup — latest event per (user_id, event_type);
    // the same row_number pattern that implements REPLACE semantics
    // internally (SURVEY §1.4).
    QueryDef(
      "w1_window_dedup",
      (spark, sfDir) => withSources(spark, sfDir) {
        spark.sql(
          """SELECT user_id, event_type, event_id, date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS ts_s
            |FROM (
            |  SELECT *, row_number() OVER
            |    (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
            |  FROM events
            |) WHERE rn = 1
            |ORDER BY user_id, event_type""".stripMargin)
      },
      Some(
        """SELECT user_id, event_type, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
          |FROM (
          |  SELECT *, row_number() OVER
          |    (PARTITION BY user_id, event_type
          |     ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
          |  FROM events
          |) t WHERE rn = 1
          |ORDER BY user_id, event_type""".stripMargin)
    )
  )
}
