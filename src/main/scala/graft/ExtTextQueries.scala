package graft

import graft.core.Schema
import graft.ext.{Dedup, Events, Graph, Pipeline, Quality, Similarity, TextAnalysis}
import graft.index.IndexJob
import org.apache.spark.sql.functions._
/** Text-analysis family: langid (x2), quality, token counts, fingerprints, winnowing (+native kernel), source overlap, normalization, URL hosts/dedup, TF-IDF, more-like-this, curation-adjacent text screens.
  * Oracle-checked via CORRECTNESS_r* (see SURVEY §7.5).
  */
private[graft] object ExtTextQueries {
  import ExtShared._

  val defs: Seq[QueryDef] = Seq(

    QueryDef("x_text_langid",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.languageId(spark.table("documents"), "text")
          .selectExpr("doc_id", "lang", "predicted_lang",
            "cast(hits_de as long) hits_de", "cast(hits_en as long) hits_en",
            "cast(hits_es as long) hits_es", "cast(hits_fr as long) hits_fr",
            "cast(hits_zh as long) hits_zh")
          .orderBy("doc_id")
      },
      Some {
        val langs = TextAnalysis.stopwords.keys.toSeq.sorted
        val hitCols = langs.map { l =>
          val cond = TextAnalysis.stopwords(l).map(w => s"t = '$w'").mkString(" OR ")
          s"len(list_filter(ts, t -> $cond)) AS hits_$l"
        }.mkString(",\n       ")
        val g = s"greatest(${langs.map(l => s"hits_$l").mkString(", ")})"
        val caseArms = langs.map(l => s"WHEN hits_$l = $g THEN '$l'").mkString(" ")
        s"""WITH toks AS (SELECT doc_id, lang, ${ducktokens("text")} AS ts FROM documents),
           |hits AS (
           |  SELECT doc_id, lang,
           |       ${hitCols}
           |  FROM toks
           |)
           |SELECT doc_id, lang,
           |       CASE WHEN $g = 0 THEN 'und' $caseArms END AS predicted_lang,
           |       hits_de, hits_en, hits_es, hits_fr, hits_zh
           |FROM hits ORDER BY doc_id""".stripMargin
      }),

    // Language confusion matrix: declared `lang` vs predicted — the QA
    // table that decides whether to trust the metadata or the detector
    // (and which languages need a better model). Tiny group agg over
    // the langid map — langs² rows at any corpus size.
    QueryDef("x_text_lang_mismatch",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.languageId(spark.table("documents"), "text")
          .groupBy("lang", "predicted_lang")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("is_mismatch",
            (col("lang") =!= col("predicted_lang")).cast("boolean"))
          .select("lang", "predicted_lang", "n_docs", "is_mismatch")
          .orderBy("lang", "predicted_lang")
      },
      Some {
        val langs = TextAnalysis.stopwords.keys.toSeq.sorted
        val hitCols = langs.map { l =>
          val cond = TextAnalysis.stopwords(l).map(w => s"t = '$w'").mkString(" OR ")
          s"len(list_filter(ts, t -> $cond)) AS hits_$l"
        }.mkString(",\n       ")
        val g = s"greatest(${langs.map(l => s"hits_$l").mkString(", ")})"
        val caseArms = langs.map(l => s"WHEN hits_$l = $g THEN '$l'").mkString(" ")
        s"""WITH toks AS (SELECT doc_id, lang, ${ducktokens("text")} AS ts FROM documents),
           |hits AS (
           |  SELECT doc_id, lang,
           |       ${hitCols}
           |  FROM toks
           |),
           |pred AS (
           |  SELECT doc_id, lang,
           |         CASE WHEN $g = 0 THEN 'und' $caseArms END AS predicted_lang
           |  FROM hits
           |)
           |SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs,
           |       lang <> predicted_lang AS is_mismatch
           |FROM pred GROUP BY lang, predicted_lang
           |ORDER BY lang, predicted_lang""".stripMargin
      }),

    QueryDef("x_text_quality",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.qualityScore(spark.table("documents"), "text")
          .select("doc_id", "n_chars", "n_tokens", "alpha_ratio",
            "stopword_ratio", "mean_token_len", "distinct_ratio", "quality_score")
          .orderBy("doc_id")
      },
      Some {
        val en = TextAnalysis.stopwords("en").map(w => s"t = '$w'").mkString(" OR ")
        s"""WITH base AS (
           |  SELECT doc_id, ${ducktokens("text")} AS ts,
           |         CAST(len(text) AS DOUBLE) AS n_chars,
           |         CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha
           |  FROM documents
           |),
           |m AS (
           |  SELECT doc_id, n_chars,
           |         CAST(len(ts) AS DOUBLE) AS n_tokens,
           |         n_alpha / greatest(n_chars, 1.0) AS alpha_ratio,
           |         CAST(len(list_filter(ts, t -> $en)) AS DOUBLE)
           |               / greatest(CAST(len(ts) AS DOUBLE), 1.0) AS stopword_ratio,
           |         CAST(list_sum(list_transform(ts, t -> len(t))) AS DOUBLE)
           |               / greatest(CAST(len(ts) AS DOUBLE), 1.0) AS mean_token_len,
           |         CAST(len(list_distinct(ts)) AS DOUBLE)
           |               / greatest(CAST(len(ts) AS DOUBLE), 1.0) AS distinct_ratio
           |  FROM base
           |)
           |SELECT doc_id, n_chars, n_tokens, alpha_ratio, stopword_ratio,
           |       mean_token_len, distinct_ratio,
           |       least(n_tokens / 100.0, 1.0) * 0.25
           |             + alpha_ratio * 0.25
           |             + least(stopword_ratio * 5.0, 1.0) * 0.25
           |             + distinct_ratio * 0.25 AS quality_score
           |FROM m ORDER BY doc_id""".stripMargin
      }),

    QueryDef("x_text_langid_ngram",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.charTrigramLangId(spark.table("documents"), "text", "lang")
          .orderBy("doc_id")
      },
      Some(
        s"""WITH tri AS (
          |  SELECT DISTINCT doc_id, lang,
          |         CAST(ascii(tg) AS BIGINT) * 4398046511104 +
          |         CAST(ascii(substr(tg, 2, 1)) AS BIGINT) * 2097152 +
          |         CAST(ascii(substr(tg, 3, 1)) AS BIGINT) AS h
          |  FROM (
          |    SELECT doc_id, lang,
          |           unnest(CASE WHEN len(lower(text)) >= 3
          |             THEN list_transform(range(1, len(lower(text)) - 1),
          |                                 i -> substr(lower(text), i, 3))
          |             ELSE [] END) AS tg
          |    FROM documents
          |  ) u
          |),
          |profile AS (
          |  SELECT lang AS p_lang, h FROM (
          |    SELECT lang, h, row_number() OVER (
          |      PARTITION BY lang ORDER BY count(*) DESC, h) AS rn
          |    FROM tri GROUP BY lang, h
          |  ) r WHERE rn <= 40
          |),
          |hits AS (
          |  SELECT t.doc_id, p.p_lang, count(*) AS n_hits
          |  FROM (SELECT DISTINCT doc_id, h FROM tri) t
          |  JOIN profile p ON p.h = t.h
          |  GROUP BY t.doc_id, p.p_lang
          |),
          |best AS (
          |  SELECT doc_id, p_lang, n_hits FROM (
          |    SELECT *, row_number() OVER (
          |      PARTITION BY doc_id ORDER BY n_hits DESC, p_lang) AS rn
          |    FROM hits
          |  ) r WHERE rn = 1
          |)
          |SELECT d.doc_id, d.lang,
          |       coalesce(b.p_lang, 'und') AS predicted_lang,
          |       coalesce(b.n_hits, 0) AS n_hits
          |FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id
          |ORDER BY d.doc_id""".stripMargin)),

    QueryDef("x_text_tokens",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.tokenCounts(spark.table("documents"), "text")
          .selectExpr("doc_id", "cast(n_ws_tokens as long) n_ws_tokens",
            "cast(n_re_tokens as long) n_re_tokens", "cast(n_chars_col as long) n_chars_col")
          .orderBy("doc_id")
      },
      Some(
        """SELECT doc_id,
          |       len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_ws_tokens,
          |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_re_tokens,
          |       len(text) AS n_chars_col
          |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("x_text_fingerprint",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.fingerprint(spark.table("documents"), "text")
          .groupBy("fingerprint")
          .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
          .orderBy("fingerprint")
      },
      Some(
        s"""SELECT md5(array_to_string(list_sort(list_distinct(${ducktokens("text")})), ' ')) AS fingerprint,
           |       count(*) AS n_docs, min(doc_id) AS keep_id
           |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin)),

    // Winnowing (rolling-hash) fingerprints — substring-level copy
    // detection: shared substrings of length >= k+window-1 share a
    // selected k-gram hash (Schleimer et al., SIGMOD 2003).
    QueryDef("x_text_winnow",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.winnowFingerprints(spark.table("documents"), "text",
            "doc_id", k = 8, window = 4)
          .orderBy("doc_id", "fp")
      },
      Some(
        s"""WITH base AS (SELECT doc_id, lower(text) AS s FROM documents),
           |hashed AS (
           |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           |         ${duckHash("substr(s, CAST(pos AS INTEGER), 8)")} % $P AS h
           |  FROM (SELECT doc_id, s, unnest(range(1, len(s) - 6)) AS pos FROM base) q
           |),
           |sel AS (
           |  SELECT doc_id, pos,
           |         min(h * 2147483648 + (2147483648 - pos)) OVER (
           |           PARTITION BY doc_id ORDER BY pos
           |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS selkey
           |  FROM hashed
           |)
           |SELECT DISTINCT doc_id, selkey >> 31 AS fp
           |FROM sel WHERE pos >= 4
           |ORDER BY doc_id, fp""".stripMargin),
      // contrast twin: the interpreted rolling-hash fold beside the
      // compiled x_text_winnow_native kernel (identical output — the
      // same oracle SQL); kept oracle-checked to document the
      // codegen win, excluded from the headline bench like the other
      // naive-vs-scale-path pairs (ngram_rep_relational precedent)
      contrast = true),

    // Source-overlap matrix: winnow fingerprints per source (compiled
    // kernel, group carried in-projection), DISTINCT (source, fp), then
    // an fp-keyed pair count whose fanout is bounded by sources² per
    // fingerprint — never by docs.
    QueryDef("x_text_source_overlap",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.sourceOverlap(spark.table("documents"), "text",
            "source", k = 8, window = 4)
          .orderBy("source_a", "source_b")
      },
      Some(
        s"""WITH base AS (SELECT doc_id, source, lower(text) AS s FROM documents),
           |hashed AS (
           |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           |         ${duckHash("substr(s, CAST(pos AS INTEGER), 8)")} % $P AS h
           |  FROM (SELECT doc_id, s, unnest(range(1, len(s) - 6)) AS pos FROM base) q
           |),
           |sel AS (
           |  SELECT doc_id, pos,
           |         min(h * 2147483648 + (2147483648 - pos)) OVER (
           |           PARTITION BY doc_id ORDER BY pos
           |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS selkey
           |  FROM hashed
           |),
           |fps AS (
           |  SELECT DISTINCT doc_id, selkey >> 31 AS fp
           |  FROM sel WHERE pos >= 4
           |),
           |gfp AS (
           |  SELECT DISTINCT b.source, f.fp
           |  FROM fps f JOIN base b USING (doc_id)
           |)
           |SELECT a.source AS source_a, b.source AS source_b,
           |       CAST(count(*) AS BIGINT) AS n_shared_fp
           |FROM gfp a JOIN gfp b ON a.fp = b.fp AND a.source < b.source
           |GROUP BY 1, 2
           |ORDER BY 1, 2""".stripMargin)),

    // The zero-shuffle winnowing path, compiled: the custom codegen'd
    // winnow_fps Expression (one static JVM call per row — no shuffle,
    // no interpreted HOF lambdas; the pure-relational in-row variant
    // stays in TextAnalysis as the reference implementation, value-
    // pinned to this one in ExtSpec, with the measured crossover in
    // PLANS_r4.md). Identical values, same oracle. Named _native for
    // what it runs (r4 verdict #3); the r4 bench row for this entry
    // was `x_text_winnow_inrow`.
    QueryDef("x_text_winnow_native",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.winnowFingerprintsNative(spark.table("documents"),
            "text", "doc_id", k = 8, window = 4)
          .orderBy("doc_id", "fp")
      },
      Some(
        s"""WITH base AS (SELECT doc_id, lower(text) AS s FROM documents),
           |hashed AS (
           |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           |         ${duckHash("substr(s, CAST(pos AS INTEGER), 8)")} % $P AS h
           |  FROM (SELECT doc_id, s, unnest(range(1, len(s) - 6)) AS pos FROM base) q
           |),
           |sel AS (
           |  SELECT doc_id, pos,
           |         min(h * 2147483648 + (2147483648 - pos)) OVER (
           |           PARTITION BY doc_id ORDER BY pos
           |           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS selkey
           |  FROM hashed
           |)
           |SELECT DISTINCT doc_id, selkey >> 31 AS fp
           |FROM sel WHERE pos >= 4
           |ORDER BY doc_id, fp""".stripMargin)),

    // PII screen over deterministically PII-augmented text (the corpus
    // is PII-free word soup, so every 7th doc gets a synthetic email +
    // IP + phone — the contamination-benchmark trick — making
    // extraction live signal). The augmented column is a setup-time
    // fixture (ExtShared.augDocs, VERDICT r7 item 6) so the timed
    // query measures the screen, not the scaffolding; the oracle keeps
    // the identical derivation as a CTE.
    QueryDef("x_text_pii",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_pii").as("text"))
        Quality.piiScreen(aug, "text").orderBy("doc_id")
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id, coalesce(text, '') ||
          |         CASE WHEN doc_id % 7 = 0
          |              THEN ' contact user' || doc_id || '@example.com 10.0.' ||
          |                   (doc_id % 200) || '.1 call 555-' ||
          |                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          |              ELSE '' END AS t
          |  FROM documents
          |)
          |SELECT doc_id,
          |       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
          |       CAST(len(regexp_extract_all(t, '\b\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phones,
          |       CAST(len(regexp_extract_all(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ips,
          |       (len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
          |        + len(regexp_extract_all(t, '\b\d{3}[-. ]\d{4}\b'))
          |        + len(regexp_extract_all(t, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) > 0) AS has_pii
          |FROM aug
          |ORDER BY doc_id""".stripMargin)),

    // PII REDACTION — the output half beside x_text_pii's detection:
    // every match replaced by its tag in the pinned declaration order
    // (email first — a numeric mail host would otherwise be eaten by
    // the IP pattern), then the redacted text fingerprinted. The tag
    // count is taken on the REDACTED text, so it reflects what was
    // actually masked, not the independent raw-text scans. Pure map.
    QueryDef("x_text_pii_redact",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_pii").as("text"))
        Quality.redactPii(aug, "text")
          .select(col("doc_id"),
            size(regexp_extract_all(col("text"),
              lit("<(EMAIL|PHONE|IP)>"), lit(0))).cast("long").as("n_redacted"),
            length(col("text")).cast("long").as("red_len"),
            md5(col("text").cast("binary")).as("red_md5"))
          .orderBy("doc_id")
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id, coalesce(text, '') ||
          |         CASE WHEN doc_id % 7 = 0
          |              THEN ' contact user' || doc_id || '@example.com 10.0.' ||
          |                   (doc_id % 200) || '.1 call 555-' ||
          |                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          |              ELSE '' END AS t
          |  FROM documents
          |),
          |red AS (
          |  SELECT doc_id,
          |         regexp_replace(regexp_replace(regexp_replace(t,
          |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |           '\b\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
          |           '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS r
          |  FROM aug
          |)
          |SELECT doc_id,
          |       CAST(len(regexp_extract_all(r, '<(EMAIL|PHONE|IP)>')) AS BIGINT) AS n_redacted,
          |       CAST(length(r) AS BIGINT) AS red_len,
          |       md5(r) AS red_md5
          |FROM red
          |ORDER BY doc_id""".stripMargin)),

    // URL-host profile over deterministically URL-augmented text (every
    // 3rd doc links two synthetic hosts): extract → host-keyed agg →
    // TakeOrderedAndProject top-k. 16 distinct hosts < k=20, so the
    // limit boundary is never tie-ambiguous.
    QueryDef("x_text_urlhosts",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_urls").as("text"))
        Quality.urlHostProfile(aug, "text", k = 20)
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id, coalesce(text, '') ||
          |         CASE WHEN doc_id % 3 = 0
          |              THEN ' see https://www.site' || (doc_id % 11) ||
          |                   '.example.com/page/' || doc_id ||
          |                   ' and http://cdn' || (doc_id % 5) || '.example.net/x'
          |              ELSE '' END AS t
          |  FROM documents
          |),
          |hosts AS (
          |  SELECT doc_id,
          |         unnest(list_transform(regexp_extract_all(t, 'https?://[^\s]+'),
          |                u -> regexp_extract(u, '^https?://([^/\s]+)', 1))) AS host
          |  FROM aug
          |)
          |SELECT host, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          |       CAST(count(*) AS BIGINT) AS n_urls
          |FROM hosts GROUP BY host
          |ORDER BY n_docs DESC, n_urls DESC, host
          |LIMIT 20""".stripMargin)),

    // Host-graph PageRank — the link-centrality source-quality signal
    // CommonCrawl-derived pipelines weight documents by. Graph = host
    // co-occurrence within a document (same synthetic URL augmentation
    // as x_text_urlhosts); 2 synchronous rounds in e9 fixed point —
    // truncating integer DIVs and associative BIGINT sums only, so the
    // ranking is bit-identical in any engine; the oracle unrolls the
    // same rounds as CTEs (the k-means precedent). Per round: one
    // edges⋈ranks join + one key agg — the standard distributed
    // PageRank shape; driver state is ONE scalar (node count).
    QueryDef("x_graph_pagerank",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_urls").as("text"))
        val t = coalesce(col("text"), lit(""))
        val urls = regexp_extract_all(t, lit("https?://[^\\s]+"), lit(0))
        val hosts = transform(urls,
          u => regexp_extract(u, "^https?://([^/\\s]+)", 1))
        val docHosts = aug.select(col("doc_id"), explode(hosts).as("host"))
        Graph.pageRank(
            Graph.cooccurrenceEdges(docHosts, "doc_id", "host"), iters = 2)
          .withColumnRenamed("node", "host")
          .withColumnRenamed("pr", "pr_e9")
          .orderBy(col("pr_e9").desc, col("host"))
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id, coalesce(text, '') ||
          |         CASE WHEN doc_id % 3 = 0
          |              THEN ' see https://www.site' || (doc_id % 11) ||
          |                   '.example.com/page/' || doc_id ||
          |                   ' and http://cdn' || (doc_id % 5) || '.example.net/x'
          |              ELSE '' END AS t
          |  FROM documents
          |),
          |hx AS (
          |  SELECT doc_id,
          |         unnest(list_transform(regexp_extract_all(t, 'https?://[^\s]+'),
          |                u -> regexp_extract(u, '^https?://([^/\s]+)', 1))) AS host
          |  FROM aug
          |),
          |dh AS (SELECT DISTINCT doc_id, host FROM hx),
          |edges AS (
          |  SELECT DISTINCT a.host AS src, b.host AS dst
          |  FROM dh a JOIN dh b ON a.doc_id = b.doc_id AND a.host <> b.host
          |),
          |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
          |nn AS (SELECT 1000000000 // count(*) AS base FROM nodes),
          |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
          |pr0 AS (SELECT node, (SELECT base FROM nn) AS pr FROM nodes),
          |c1 AS (
          |  SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
          |  FROM edges e
          |  JOIN pr0 p ON p.node = e.src
          |  JOIN deg d ON d.src = e.src
          |  GROUP BY e.dst
          |),
          |pr1 AS (
          |  SELECT n.node,
          |         CAST((15 * (SELECT base FROM nn) + 85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
          |  FROM nodes n LEFT JOIN c1 c ON c.node = n.node
          |),
          |c2 AS (
          |  SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
          |  FROM edges e
          |  JOIN pr1 p ON p.node = e.src
          |  JOIN deg d ON d.src = e.src
          |  GROUP BY e.dst
          |),
          |pr2 AS (
          |  SELECT n.node,
          |         CAST((15 * (SELECT base FROM nn) + 85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
          |  FROM nodes n LEFT JOIN c2 c ON c.node = n.node
          |)
          |SELECT node AS host, pr AS pr_e9 FROM pr2
          |ORDER BY pr_e9 DESC, host""".stripMargin)),

    // Label-propagation communities over the host co-occurrence graph
    // (Raghavan et al. 2007, deterministic min-label tie-break) —
    // domain clustering for source curation, beside pagerank's
    // centrality on the SAME graph. Three synchronous rounds; every
    // update is a (count desc, label asc) argmax, so the oracle
    // unrolls identical rounds.
    QueryDef("x_graph_lpa",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_urls").as("text"))
        val t = coalesce(col("text"), lit(""))
        val urls = regexp_extract_all(t, lit("https?://[^\\s]+"), lit(0))
        val hosts = transform(urls,
          u => regexp_extract(u, "^https?://([^/\\s]+)", 1))
        val docHosts = aug.select(col("doc_id"), explode(hosts).as("host"))
        Graph.labelPropagation(
            Graph.cooccurrenceEdges(docHosts, "doc_id", "host"), iters = 3)
          .withColumnRenamed("node", "host")
          .orderBy("host")
      },
      Some {
        val rounds = (1 to 3).map { r =>
          s""",
             |n$r AS (
             |  SELECT e.dst AS node, l.lab, count(*) AS c
             |  FROM edges e JOIN l${r - 1} l ON l.node = e.src
             |  GROUP BY 1, 2
             |),
             |l$r AS (
             |  SELECT node, lab FROM (
             |    SELECT node, lab,
             |           row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
             |    FROM n$r) q
             |  WHERE rn = 1
             |)""".stripMargin
        }.mkString
        s"""WITH aug AS (
           |  SELECT doc_id, coalesce(text, '') ||
           |         CASE WHEN doc_id % 3 = 0
           |              THEN ' see https://www.site' || (doc_id % 11) ||
           |                   '.example.com/page/' || doc_id ||
           |                   ' and http://cdn' || (doc_id % 5) || '.example.net/x'
           |              ELSE '' END AS t
           |  FROM documents
           |),
           |hx AS (
           |  SELECT doc_id,
           |         unnest(list_transform(regexp_extract_all(t, 'https?://[^\\s]+'),
           |                u -> regexp_extract(u, '^https?://([^/\\s]+)', 1))) AS host
           |  FROM aug
           |),
           |dh AS (SELECT DISTINCT doc_id, host FROM hx),
           |edges AS (
           |  SELECT DISTINCT a.host AS src, b.host AS dst
           |  FROM dh a JOIN dh b ON a.doc_id = b.doc_id AND a.host <> b.host
           |),
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |l0 AS (SELECT node, node AS lab FROM nodes)
           |$rounds
           |SELECT node AS host, lab AS community FROM l3
           |ORDER BY host""".stripMargin
      }),

    // Personalized PageRank from the trusted seed set (TrustRank):
    // teleport mass restarts only at the `www.` hosts, so the cdn
    // hosts score by random-walk proximity to the trusted set —
    // seed-based domain-quality propagation on the SAME host
    // co-occurrence graph pagerank ranks globally. Two rounds, e9
    // fixed point, every step integer — the oracle unrolls them.
    QueryDef("x_graph_ppr",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_urls").as("text"))
        val t = coalesce(col("text"), lit(""))
        val urls = regexp_extract_all(t, lit("https?://[^\\s]+"), lit(0))
        val hosts = transform(urls,
          u => regexp_extract(u, "^https?://([^/\\s]+)", 1))
        val docHosts = aug.select(col("doc_id"), explode(hosts).as("host"))
        // r14 OPTIMIZATION (guide §2.4): edges feed BOTH the walk and
        // the seed derivation — materialize the co-occurrence self-join
        // once instead of twice; released after construction (the
        // returned plan reads only the final round's checkpoint)
        val edges = Graph.cooccurrenceEdges(docHosts, "doc_id", "host")
          .localCheckpoint(true)
        val seeds = edges.select(col("src").as("node"))
          .unionByName(edges.select(col("dst").as("node")))
          .distinct().filter(col("node").startsWith("www."))
        val out = Graph.personalizedPageRank(edges, seeds, iters = 2)
        graft.ext.Dedup.releaseCheckpoint(edges)
        out
          .withColumnRenamed("node", "host")
          .withColumnRenamed("pr", "ppr_e9")
          .orderBy(col("ppr_e9").desc, col("host"))
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id, coalesce(text, '') ||
          |         CASE WHEN doc_id % 3 = 0
          |              THEN ' see https://www.site' || (doc_id % 11) ||
          |                   '.example.com/page/' || doc_id ||
          |                   ' and http://cdn' || (doc_id % 5) || '.example.net/x'
          |              ELSE '' END AS t
          |  FROM documents
          |),
          |hx AS (
          |  SELECT doc_id,
          |         unnest(list_transform(regexp_extract_all(t, 'https?://[^\s]+'),
          |                u -> regexp_extract(u, '^https?://([^/\s]+)', 1))) AS host
          |  FROM aug
          |),
          |dh AS (SELECT DISTINCT doc_id, host FROM hx),
          |edges AS (
          |  SELECT DISTINCT a.host AS src, b.host AS dst
          |  FROM dh a JOIN dh b ON a.doc_id = b.doc_id AND a.host <> b.host
          |),
          |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
          |sd AS (
          |  SELECT node,
          |         CASE WHEN node LIKE 'www.%' THEN 1 ELSE 0 END AS is_seed
          |  FROM nodes
          |),
          |kk AS (SELECT 1000000000 // greatest(sum(is_seed), 1) AS base FROM sd),
          |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
          |pr0 AS (SELECT node, is_seed * (SELECT base FROM kk) AS pr FROM sd),
          |c1 AS (
          |  SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
          |  FROM edges e
          |  JOIN pr0 p ON p.node = e.src
          |  JOIN deg d ON d.src = e.src
          |  GROUP BY e.dst
          |),
          |pr1 AS (
          |  SELECT n.node,
          |         CAST((15 * (SELECT base FROM kk) * n.is_seed
          |               + 85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
          |  FROM sd n LEFT JOIN c1 c ON c.node = n.node
          |),
          |c2 AS (
          |  SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
          |  FROM edges e
          |  JOIN pr1 p ON p.node = e.src
          |  JOIN deg d ON d.src = e.src
          |  GROUP BY e.dst
          |),
          |pr2 AS (
          |  SELECT n.node,
          |         CAST((15 * (SELECT base FROM kk) * n.is_seed
          |               + 85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
          |  FROM sd n LEFT JOIN c2 c ON c.node = n.node
          |)
          |SELECT node AS host, pr AS ppr_e9 FROM pr2
          |ORDER BY ppr_e9 DESC, host""".stripMargin)),

    // HITS hubs & authorities over the DIRECTED source→cited-host
    // graph (which corpus sources cite the most-cited hosts — the
    // companion centrality to PageRank's host co-citation). Two
    // synchronous rounds in e6 fixed point with integer L1
    // normalization per half-round: every step is a truncating
    // positive DIV + associative BIGINT sums, so the oracle unrolls
    // the identical rounds. Per half-round: one edges⋈scores join +
    // one key agg + a 1-row total broadcast back — no driver state.
    QueryDef("x_graph_hits",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("source"), col("text_urls").as("text"))
        val t = coalesce(col("text"), lit(""))
        val urls = regexp_extract_all(t, lit("https?://[^\\s]+"), lit(0))
        val hosts = transform(urls,
          u => regexp_extract(u, "^https?://([^/\\s]+)", 1))
        Graph.hits(aug.select(col("source").as("src"),
            explode(hosts).as("dst")), iters = 2)
          .orderBy(col("auth_e6").desc, col("hub_e6").desc, col("node"))
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id, source, coalesce(text, '') ||
          |         CASE WHEN doc_id % 3 = 0
          |              THEN ' see https://www.site' || (doc_id % 11) ||
          |                   '.example.com/page/' || doc_id ||
          |                   ' and http://cdn' || (doc_id % 5) || '.example.net/x'
          |              ELSE '' END AS t
          |  FROM documents
          |),
          |hx AS (
          |  SELECT source,
          |         unnest(list_transform(regexp_extract_all(t, 'https?://[^\s]+'),
          |                u -> regexp_extract(u, '^https?://([^/\s]+)', 1))) AS host
          |  FROM aug
          |),
          |edges AS (SELECT DISTINCT source AS src, host AS dst FROM hx),
          |srcs AS (SELECT DISTINCT src AS node FROM edges),
          |dsts AS (SELECT DISTINCT dst AS node FROM edges),
          |hub0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub FROM srcs),
          |ar1 AS (SELECT e.dst AS node, sum(h.hub) AS raw
          |        FROM edges e JOIN hub0 h ON h.node = e.src GROUP BY 1),
          |a1 AS (SELECT node, raw * 1000000 // (SELECT sum(raw) FROM ar1) AS auth FROM ar1),
          |hr1 AS (SELECT e.src AS node, sum(a.auth) AS raw
          |        FROM edges e JOIN a1 a ON a.node = e.dst GROUP BY 1),
          |h1 AS (SELECT node, raw * 1000000 // (SELECT sum(raw) FROM hr1) AS hub FROM hr1),
          |ar2 AS (SELECT e.dst AS node, sum(h.hub) AS raw
          |        FROM edges e JOIN h1 h ON h.node = e.src GROUP BY 1),
          |a2 AS (SELECT node, raw * 1000000 // (SELECT sum(raw) FROM ar2) AS auth FROM ar2),
          |hr2 AS (SELECT e.src AS node, sum(a.auth) AS raw
          |        FROM edges e JOIN a2 a ON a.node = e.dst GROUP BY 1),
          |h2 AS (SELECT node, raw * 1000000 // (SELECT sum(raw) FROM hr2) AS hub FROM hr2),
          |nodes AS (SELECT node FROM srcs UNION SELECT node FROM dsts)
          |SELECT n.node, CAST(coalesce(h.hub, 0) AS BIGINT) AS hub_e6,
          |       CAST(coalesce(a.auth, 0) AS BIGINT) AS auth_e6
          |FROM nodes n
          |LEFT JOIN h2 h ON h.node = n.node
          |LEFT JOIN a2 a ON a.node = n.node
          |ORDER BY auth_e6 DESC, hub_e6 DESC, n.node""".stripMargin)),

    // Per-part triangle count + local clustering coefficient over the
    // part co-purchase graph (parts sharing an order — overlapping
    // k-cliques, the market-basket structure the host graph lacks).
    // Degree-oriented MR triangle enumeration (Suri & Vassilvitskii
    // 2011): orientation caps every node's out-degree at O(√m), so
    // hot parts generate no more wedges than cold ones; the wedge
    // comparator MUST be the same (deg, node) order as the edge
    // orientation (raw-id ordering silently drops the 207k/413k
    // triangles whose closing edge points the other way — measured).
    // cc_e6 is exact integer fixed point: 2·tri·1e6 DIV deg(deg−1).
    QueryDef("x_graph_triangles",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Graph.triangleStatsFrom(copurchaseTriangleClosure(spark, sfDir))
          .withColumnRenamed("node", "part")
          .orderBy("part")
      },
      Some(
        s"""WITH $copurchaseCte,
           |deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
           |oe AS (
           |  SELECT e.src AS u, e.dst AS v, db.d AS dv
           |  FROM edges e
           |  JOIN deg da ON da.node = e.src
           |  JOIN deg db ON db.node = e.dst
           |  WHERE (da.d < db.d) OR (da.d = db.d AND e.src < e.dst)
           |),
           |tri AS (
           |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
           |  FROM oe e1
           |  JOIN oe e2 ON e1.u = e2.u
           |    AND ((e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v))
           |  JOIN oe e3 ON e3.u = e1.v AND e3.v = e2.v
           |),
           |corners AS (
           |  SELECT a AS node FROM tri
           |  UNION ALL SELECT b FROM tri
           |  UNION ALL SELECT c FROM tri
           |),
           |tp AS (SELECT node, count(*) AS t FROM corners GROUP BY node)
           |SELECT d.node AS part, CAST(d.d AS BIGINT) AS deg,
           |       CAST(coalesce(tp.t, 0) AS BIGINT) AS tri,
           |       CAST(CASE WHEN d.d >= 2
           |            THEN coalesce(tp.t, 0) * 2000000 // (d.d * (d.d - 1))
           |            ELSE 0 END AS BIGINT) AS cc_e6
           |FROM deg d LEFT JOIN tp ON tp.node = d.node
           |ORDER BY part""".stripMargin)),

    // k-core of the same co-purchase graph (Seidman 1983): 6
    // synchronous peel rounds at k=80 — the measured fixpoint depth on
    // this graph (2000→1903→1878→1865→1858→1857→1857): a genuine
    // cascade, not a trivial keep-all or collapse (k=90 peels to
    // empty by round 5; k=100 by round 3 — random-graph cores
    // collapse sharply). Survivors + residual degree; no tie-breaks
    // anywhere, so the oracle (which unrolls full-recompute rounds)
    // matches the delta-peel: per round, only the FRONTIER's edges
    // join and aggregate (frontier side broadcasts via AQE), the
    // surviving residual degrees carry as state, and convergence
    // reads an observe() metric fused into the state materialization
    // — no per-round count() job (VERDICT r10 item 3).
    QueryDef("x_graph_kcore",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Graph.kcore(copurchaseEdges(spark, sfDir), k = 80, rounds = 6,
          edgesDistinct = true)
          .withColumnRenamed("node", "part")
          .orderBy("part")
      },
      Some {
        val rounds = (1 to 6).map { r =>
          s""",
             |a$r AS (
             |  SELECT e.src AS node FROM edges e
             |  JOIN a${r - 1} s ON s.node = e.src
             |  JOIN a${r - 1} t ON t.node = e.dst
             |  GROUP BY e.src HAVING count(*) >= 80
             |)""".stripMargin
        }.mkString
        s"""WITH $copurchaseCte,
           |a0 AS (SELECT DISTINCT src AS node FROM edges)
           |$rounds
           |SELECT e.src AS part, CAST(count(*) AS BIGINT) AS core_deg
           |FROM edges e
           |JOIN a6 s ON s.node = e.src
           |JOIN a6 t ON t.node = e.dst
           |GROUP BY e.src
           |ORDER BY part""".stripMargin
      }),

    // Bounded-radius multi-source BFS: hop distance to the nearest
    // high-degree hub (deg ≥ 170 ≈ the co-purchase graph's 99th pct;
    // 25 hubs at sf0.01, layers 25/1764/211 — a real 3-layer cascade,
    // not a 1-hop collapse), hub tie = smallest id among nearest.
    // Delta-frontier rounds with observe-fused convergence (the r11
    // kcore recipe); the oracle unrolls the same bounded walk as a
    // recursive CTE and picks (min dist, then min hub) at the end —
    // equal to the engine's per-round min-semiring propagation by
    // induction on BFS layers.
    QueryDef("x_graph_bfs",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Graph.bfsFromHubs(copurchaseEdges(spark, sfDir),
            minHubDegree = 170, rounds = 4, edgesDistinct = true)
          .withColumnRenamed("node", "part")
          .orderBy("part")
      },
      Some(
        s"""WITH RECURSIVE $copurchaseCte,
           |deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY 1),
           |hubs AS (SELECT node FROM deg WHERE d >= 170),
           |walk(node, dist, hub) AS (
           |  SELECT node, 0, node FROM hubs
           |  UNION
           |  SELECT e.dst, w.dist + 1, w.hub
           |  FROM walk w JOIN edges e ON e.src = w.node
           |  WHERE w.dist < 4
           |),
           |best AS (SELECT node, min(dist) AS dist FROM walk GROUP BY 1),
           |pick AS (
           |  SELECT w.node, w.dist, min(w.hub) AS hub
           |  FROM walk w JOIN best b ON b.node = w.node AND b.dist = w.dist
           |  GROUP BY 1, 2
           |)
           |SELECT node AS part, CAST(dist AS BIGINT) AS dist,
           |       CAST(hub AS BIGINT) AS hub
           |FROM pick ORDER BY part""".stripMargin)),

    // Edge-wise structural similarity (Satuluri–Parthasarathy local
    // sparsification): per undirected edge, the Jaccard of its
    // endpoints' neighborhoods — tri·1e6 DIV (du+dv−tri) where tri =
    // triangles through the edge. Reuses the degree-oriented triangle
    // enumeration verbatim (each found triangle explodes to its three
    // edges — output-bounded); top-500 by (jaccard desc, u, v), a
    // total order. The curation use: thin a co-occurrence/near-dup
    // graph to its intra-community edges before clustering.
    QueryDef("x_graph_edgesim",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Graph.edgeStructuralSimFrom(
          copurchaseTriangleClosure(spark, sfDir), k = 500)
      },
      Some(
        s"""WITH $copurchaseCte,
           |deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY 1),
           |ue AS (SELECT src AS u, dst AS v FROM edges WHERE src < dst),
           |tric AS (
           |  SELECT ue.u, ue.v, count(*) AS tri
           |  FROM ue
           |  JOIN edges a ON a.src = ue.u
           |  JOIN edges b ON b.src = ue.v AND b.dst = a.dst
           |  GROUP BY 1, 2
           |)
           |SELECT ue.u, ue.v,
           |       CAST(du.d AS BIGINT) AS du, CAST(dv.d AS BIGINT) AS dv,
           |       CAST(coalesce(t.tri, 0) AS BIGINT) AS tri,
           |       CAST(coalesce(t.tri, 0) * 1000000
           |            // (du.d + dv.d - coalesce(t.tri, 0)) AS BIGINT) AS jaccard_e6
           |FROM ue
           |LEFT JOIN tric t ON t.u = ue.u AND t.v = ue.v
           |JOIN deg du ON du.node = ue.u
           |JOIN deg dv ON dv.node = ue.v
           |ORDER BY jaccard_e6 DESC, ue.u, ue.v
           |LIMIT 500""".stripMargin)),

    // Moving-average type–token ratio (MATTR): the length-independent
    // lexical-diversity screen — window 25, stride 1, exact BIGINT
    // mean kept as (Σ distinct)·1000 DIV (windows·len); short docs
    // score their plain TTR. Pure in-row kernel, zero Exchange before
    // the ORDER BY.
    QueryDef("x_text_mattr",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        // long-document augmentation (VERDICT r11 item 4): the fixture
        // is Zipf-BOUNDED (few docs longer than the window), so every
        // 13th doc also appears 8×-repeated — n_tokens ≫ window — and
        // the sliding-window term is exercised by the ORACLE, not just
        // the unit fixture. Offset 1e10: scale_gen.py replicates ids
        // at +1e6·i, so a 1e6 offset would COLLIDE with replica-1's
        // real ids at sf ≥ 2 (duplicate doc_id rows); 1e10 clears the
        // replica id space to sf ~10000.
        val docs = spark.table("documents").select("doc_id", "text")
        val longDocs = docs.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 10000000000L).as("doc_id"),
            concat_ws(" ", array_repeat(col("text"), 8)).as("text"))
        TextAnalysis.mattr(docs.unionByName(longDocs), "text", window = 25)
          .orderBy("doc_id")
      },
      Some(
        s"""WITH docs2 AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 10000000000 AS doc_id,
           |         repeat(coalesce(text, '') || ' ', 8) AS text
           |  FROM documents WHERE doc_id % 13 = 0
           |),
           |toks AS (SELECT doc_id, ${ducktokens("text")} AS ts FROM docs2),
           |base AS (SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) > 0),
           |w AS (
           |  SELECT doc_id, ts, n, LEAST(25, n) AS wl,
           |         n - LEAST(25, n) + 1 AS nw
           |  FROM base
           |),
           |sums AS (
           |  SELECT w.doc_id, w.n, w.wl, w.nw, w.ts,
           |         sum(len(list_distinct(w.ts[t.i : t.i + w.wl - 1]))) AS dsum
           |  FROM w CROSS JOIN LATERAL unnest(range(1, w.nw + 1)) AS t(i)
           |  GROUP BY 1, 2, 3, 4, 5
           |)
           |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           |       CAST(nw AS BIGINT) AS n_windows,
           |       CAST(dsum * 1000 // (nw * wl) AS BIGINT) AS mattr_permille,
           |       CAST(len(list_distinct(ts)) * 1000 // n AS BIGINT) AS ttr_permille
           |FROM sums
           |ORDER BY doc_id""".stripMargin)),

    // Bigram collocation mining: top-50 adjacent token pairs (count
    // >= 5) ranked by PMI lift (exp of PMI — no transcendental; one
    // pinned IEEE multiply/divide chain over exact integer counts
    // hashes identically cross-engine). Bigrams built in-row
    // (zip_with), minCount filter shrinks the pair side BEFORE the
    // broadcast unigram joins, top-k is TakeOrderedAndProject.
    QueryDef("x_text_collocations",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.collocations(spark.table("documents"), "text",
          minCount = 5, topK = 50)
      },
      Some(
        s"""WITH toks AS (SELECT ${ducktokens("text")} AS ts FROM documents),
           |uni AS (
           |  SELECT t AS token, CAST(count(*) AS BIGINT) AS n_uni
           |  FROM (SELECT unnest(ts) AS t FROM toks) q GROUP BY 1
           |),
           |tot_uni AS (SELECT CAST(sum(n_uni) AS BIGINT) AS total_uni FROM uni),
           |bi AS (
           |  SELECT ts[i] AS l, ts[i+1] AS r
           |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM toks
           |        WHERE len(ts) >= 2) q
           |),
           |bic AS (SELECT l, r, CAST(count(*) AS BIGINT) AS n_pair FROM bi GROUP BY 1, 2),
           |tot_bi AS (SELECT CAST(sum(n_pair) AS BIGINT) AS total_bi FROM bic),
           |freq AS (SELECT * FROM bic WHERE n_pair >= 5)
           |SELECT f.l || ' ' || f.r AS bigram, f.n_pair,
           |       ul.n_uni AS n_left, ur.n_uni AS n_right,
           |       CAST(f.n_pair AS DOUBLE) * tu.total_uni * tu.total_uni
           |         / (CAST(ul.n_uni AS DOUBLE) * ur.n_uni * tb.total_bi) AS lift
           |FROM freq f
           |JOIN uni ul ON ul.token = f.l
           |JOIN uni ur ON ur.token = f.r
           |CROSS JOIN tot_uni tu
           |CROSS JOIN tot_bi tb
           |ORDER BY lift DESC, bigram
           |LIMIT 50""".stripMargin)),

    // TextRank keywords (Mihalcea & Tarau 2004): candidate tokens
    // (length >= 4, the syntactic-filter stand-in) vote through
    // window-2 adjacency edges; PageRank's e9 fixed point ranks them.
    // Reuses Graph.pageRank on a vocab-bounded graph — the oracle
    // unrolls the same two rounds as the x_graph_pagerank CTEs.
    QueryDef("x_text_textrank",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.textRankKeywords(spark.table("documents"), "text",
          minLen = 4, iters = 2, topK = 50)
      },
      Some(
        s"""WITH toks AS (
           |  SELECT list_filter(${ducktokens("text")}, x -> len(x) >= 4) AS ts
           |  FROM documents
           |),
           |adjp AS (
           |  SELECT ts[i] AS l, ts[i+1] AS r
           |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM toks
           |        WHERE len(ts) >= 2) q
           |  WHERE ts[i] <> ts[i+1]
           |),
           |edges AS (SELECT l AS src, r AS dst FROM adjp
           |          UNION SELECT r, l FROM adjp),
           |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
           |nn AS (SELECT 1000000000 // count(*) AS base FROM nodes),
           |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
           |pr0 AS (SELECT node, (SELECT base FROM nn) AS pr FROM nodes),
           |c1 AS (
           |  SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
           |  FROM edges e
           |  JOIN pr0 p ON p.node = e.src
           |  JOIN deg d ON d.src = e.src
           |  GROUP BY e.dst
           |),
           |pr1 AS (
           |  SELECT n.node,
           |         CAST((15 * (SELECT base FROM nn) + 85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
           |  FROM nodes n LEFT JOIN c1 c ON c.node = n.node
           |),
           |c2 AS (
           |  SELECT e.dst AS node, CAST(sum(p.pr // d.deg) AS BIGINT) AS s
           |  FROM edges e
           |  JOIN pr1 p ON p.node = e.src
           |  JOIN deg d ON d.src = e.src
           |  GROUP BY e.dst
           |),
           |pr2 AS (
           |  SELECT n.node,
           |         CAST((15 * (SELECT base FROM nn) + 85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
           |  FROM nodes n LEFT JOIN c2 c ON c.node = n.node
           |)
           |SELECT node AS keyword, pr AS pr_e9 FROM pr2
           |ORDER BY pr_e9 DESC, keyword LIMIT 50""".stripMargin)),

    // Per-doc top-5 characteristic terms by linearized tf-idf (N/df,
    // not log — monotone-identical ranking, and the score stays one
    // exact-integer division so it hashes identically cross-engine).
    QueryDef("x_text_tfidf",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.tfidfTopTerms(spark.table("documents"), "text", k = 5)
          .orderBy("doc_id", "term_rank")
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id,
          |         unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '')) AS token
          |  FROM documents
          |),
          |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
          |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
          |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          |scored AS (
          |  SELECT t.doc_id, t.token, t.tf, d.df,
          |         CAST(t.tf * n.n_docs AS DOUBLE) / d.df AS tfidf
          |  FROM tf t JOIN df d USING (token) CROSS JOIN n
          |),
          |r AS (SELECT *, row_number() OVER (
          |        PARTITION BY doc_id ORDER BY tfidf DESC, token) AS term_rank
          |      FROM scored)
          |SELECT doc_id, token, tf, df, tfidf, CAST(term_rank AS BIGINT) AS term_rank
          |FROM r WHERE term_rank <= 5
          |ORDER BY doc_id, term_rank""".stripMargin)),

    // The window-free twin: per-doc top-5 selected by the TopKDesc
    // bounded-heap AGGREGATE (TypedImperativeAggregate) instead of
    // row_number() OVER — map-side partial heaps cut each
    // (doc, partition) to ≤ k rows BEFORE the exchange and the reducer
    // merges heaps instead of sorting the group. Identical ordering
    // contract (tfidf DESC, token ASC), so the oracle is x_text_tfidf's
    // SQL verbatim.
    QueryDef("x_text_tfidf_topk",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.tfidfTopTermsHeap(spark.table("documents"), "text", k = 5)
          .orderBy("doc_id", "term_rank")
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id,
          |         unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '')) AS token
          |  FROM documents
          |),
          |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
          |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
          |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          |scored AS (
          |  SELECT t.doc_id, t.token, t.tf, d.df,
          |         CAST(t.tf * n.n_docs AS DOUBLE) / d.df AS tfidf
          |  FROM tf t JOIN df d USING (token) CROSS JOIN n
          |),
          |r AS (SELECT *, row_number() OVER (
          |        PARTITION BY doc_id ORDER BY tfidf DESC, token) AS term_rank
          |      FROM scored)
          |SELECT doc_id, token, tf, df, tfidf, CAST(term_rank AS BIGINT) AS term_rank
          |FROM r WHERE term_rank <= 5
          |ORDER BY doc_id, term_rank""".stripMargin)),

    // More-like-this: top-k similar docs for one query doc via a
    // tf-idf-weighted dot product over shared terms — a broadcast
    // posting-list probe + doc-keyed agg + TakeOrderedAndProject, the
    // inverted-index "similar documents" query. The integer idf weight
    // 1e8 DIV max(1, df·1e6 DIV N) depends only on the df/N ratio —
    // bounded ≤ 1e8 at ANY corpus size (fixed-point rule; the old
    // N-proportional weight overflowed BIGINT at N ~ 1e9, r5 advice).
    QueryDef("x_text_mlt",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.moreLikeThis(spark.table("documents"), "text",
            queryId = 1L, k = 10, maxDfPermille = 800)
          .orderBy(col("score").desc, col("doc_id"))
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id,
          |         unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '')) AS token
          |  FROM documents
          |),
          |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
          |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
          |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          |q AS (
          |  SELECT t.token, t.tf AS q_tf,
          |         CAST(100000000 // greatest(1, d.df * 1000000 // n.n_docs) AS BIGINT) AS w
          |  FROM tf t JOIN df d USING (token) CROSS JOIN n
          |  WHERE t.doc_id = 1 AND d.df * 1000 <= n.n_docs * 800
          |)
          |SELECT t.doc_id, CAST(sum(t.tf * q.q_tf * q.w) AS BIGINT) AS score
          |FROM tf t JOIN q USING (token)
          |WHERE t.doc_id <> 1
          |GROUP BY t.doc_id
          |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // Text normalization screen over deterministically dirtied text:
    // every 4th doc gains a decomposed-accent word (NFC recomposes), a
    // bell control char, and tab/space runs — both engines dirty and
    // clean identically; NFC via the codegen'd nfc_e vs DuckDB's
    // nfc_normalize.
    QueryDef("x_text_normalize",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_dirty").as("text"))
        Quality.normalizeText(aug, "text").orderBy("doc_id")
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id, coalesce(text, '') ||
          |         CASE WHEN doc_id % 4 = 0
          |              THEN '  cafe' || chr(769) || ' ' || chr(7) || 'drink' ||
          |                   chr(9) || chr(9) || ' x '
          |              ELSE '' END AS t
          |  FROM documents
          |)
          |SELECT doc_id,
          |       trim(regexp_replace(
          |         regexp_replace(nfc_normalize(t),
          |           '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
          |         '[ \t]+', ' ', 'g')) AS norm_text,
          |       trim(regexp_replace(
          |         regexp_replace(nfc_normalize(t),
          |           '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
          |         '[ \t]+', ' ', 'g')) <> t AS changed
          |FROM aug
          |ORDER BY doc_id""".stripMargin)),

    // URL canonicalization dedup: every 3rd doc links the SAME page
    // under four spellings (https+WWW+trailing slash, http+query,
    // https+fragment, uppercase host) — all four collapse to one
    // canonical key with n_urls=4, proving the canonicalizer; the only
    // shuffle is the canonical-keyed agg.
    QueryDef("x_text_url_dedup",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_url4").as("text"))
        Quality.urlDedup(aug, "text").orderBy("canonical_url")
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id, coalesce(text, '') ||
          |         CASE WHEN doc_id % 3 = 0 THEN
          |           ' https://WWW.site' || (doc_id % 7) || '.example.com/p/' || doc_id || '/' ||
          |           ' http://site' || (doc_id % 7) || '.example.com/p/' || doc_id || '?utm_source=feed' ||
          |           ' https://site' || (doc_id % 7) || '.example.com/p/' || doc_id || '#sec' ||
          |           ' https://SITE' || (doc_id % 7) || '.EXAMPLE.com/p/' || doc_id
          |         ELSE '' END AS t
          |  FROM documents
          |),
          |u AS (
          |  SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[^\s]+')) AS url
          |  FROM aug
          |),
          |c AS (
          |  SELECT doc_id,
          |         regexp_replace(lower(regexp_extract(url, '^https?://([^/?#\s]+)', 1)), '^www\.', '') ||
          |         rtrim(regexp_extract(url, '^https?://[^/?#\s]+([^?#\s]*)', 1), '/') AS canonical_url
          |  FROM u
          |)
          |SELECT canonical_url,
          |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          |       CAST(count(*) AS BIGINT) AS n_urls,
          |       CAST(min(doc_id) AS BIGINT) AS first_doc
          |FROM c GROUP BY canonical_url
          |ORDER BY canonical_url""".stripMargin)),

    // Flesch readability profile — reading ease + FK grade from three
    // exact in-row integer counts (words / clamped sentences / vowel-
    // group syllables); the score is one fixed IEEE op tree quantized
    // to milli-points, so the BIGINTs match bit-for-bit cross-engine.
    QueryDef("x_text_readability",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.readability(spark.table("documents"), "text")
          .orderBy("doc_id")
      },
      Some(
        """WITH base AS (
          |  SELECT doc_id, coalesce(text, '') AS t,
          |         list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '') AS ts
          |  FROM documents
          |),
          |m AS (
          |  SELECT doc_id,
          |         CAST(len(ts) AS BIGINT) AS n_words,
          |         CAST(greatest(len(regexp_extract_all(t, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
          |         CAST(coalesce(list_sum(list_transform(ts,
          |              w -> greatest(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1))), 0) AS BIGINT) AS n_syllables
          |  FROM base
          |)
          |SELECT doc_id, n_words, n_sentences, n_syllables,
          |       CAST(CASE WHEN n_words > 0 THEN floor(
          |         (206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
          |                  - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)))
          |         * 1000.0 + 0.5) ELSE 0 END AS BIGINT) AS flesch_ease_milli,
          |       CAST(CASE WHEN n_words > 0 THEN floor(
          |         (0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
          |          + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) - 15.59)
          |         * 1000.0 + 0.5) ELSE 0 END AS BIGINT) AS fk_grade_milli
          |FROM m
          |ORDER BY doc_id""".stripMargin)),

    // HTML markup removal — the raw-crawl text-extraction step every
    // other screen assumes already happened: strip tags, decode the
    // common entities (named first, &amp; LAST — the double-decode
    // pitfall), collapse whitespace, pull the <title>. Fixture: every
    // 2nd doc wrapped in markup at setup time (augDocs); odd docs stay
    // raw, so the op must be a byte-exact no-op on clean text. All
    // in-row codegen'd string kernels — zero Exchange at any scale.
    QueryDef("x_text_html",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_html").as("text"))
        TextAnalysis.htmlStrip(aug, "text")
          .select(col("doc_id"), col("title"), col("n_tags"),
            length(col("clean")).cast("long").as("clean_len"),
            md5(col("clean").cast("binary")).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id,
          |         CASE WHEN doc_id % 2 = 0
          |              THEN '<html><head><title>Doc ' || doc_id ||
          |                   '</title></head><body><p>' || coalesce(text, '') ||
          |                   '</p><div class="nav">menu &amp; links &lt;here&gt;</div>' ||
          |                   '<br>&nbsp;&quot;end&quot;</body></html>'
          |              ELSE coalesce(text, '') END AS t
          |  FROM documents
          |),
          |s1 AS (SELECT doc_id, t, regexp_replace(t, '<[^>]*>', ' ', 'g') AS s FROM aug),
          |s2 AS (SELECT doc_id, t,
          |       replace(replace(replace(replace(replace(replace(s,
          |         '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
          |         '&nbsp;', ' '), '&amp;', '&') AS s FROM s1),
          |s3 AS (SELECT doc_id, t, trim(regexp_replace(s, '\s+', ' ', 'g')) AS c FROM s2)
          |SELECT doc_id,
          |       regexp_extract(t, '<title>([^<]*)</title>', 1) AS title,
          |       CAST(len(regexp_extract_all(t, '<[^>]*>')) AS BIGINT) AS n_tags,
          |       CAST(length(c) AS BIGINT) AS clean_len,
          |       md5(c) AS clean_md5
          |FROM s3
          |ORDER BY doc_id""".stripMargin)),

    // Per-doc novelty: fraction of the doc's distinct shingles with
    // corpus df = 1 — the protect-the-long-tail curation signal (and
    // the diffuse-boilerplate detector pairwise dedup can't see).
    // Consumes the shared 8-byte shingle artifact; two key-shaped
    // partial-aggregating exchanges, no text joins, integer permille.
    QueryDef("x_text_novelty",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        TextAnalysis.shingleNovelty(docShingles(spark, sfDir))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH ${shinglesCte(3)},
           |dfs AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
           |SELECT s.doc_id,
           |       CAST(count(*) AS BIGINT) AS n_sh,
           |       CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           |       CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1000
           |            // greatest(count(*), 1) AS BIGINT) AS novelty_permille
           |FROM sh s JOIN dfs d ON d.shingle = s.shingle
           |GROUP BY s.doc_id
           |ORDER BY s.doc_id""".stripMargin))
  )
}
