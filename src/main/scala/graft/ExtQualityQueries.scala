package graft

import graft.core.Schema
import graft.ext.{Dedup, Events, Pipeline, Quality, Similarity, TextAnalysis}
import graft.index.IndexJob
import org.apache.spark.sql.functions._
/** Corpus-quality family: Gopher screens, paragraph self-dup, n-gram repetition (+native kernel), commonness, boilerplate, corpus stats and exact length quantiles.
  * Oracle-checked via CORRECTNESS_r* (see SURVEY §7.5).
  */
private[graft] object ExtQualityQueries {
  import ExtShared._

  val defs: Seq[QueryDef] = Seq(

    // Per-source χ² domain-drift audit: each source's unigram
    // distribution vs the corpus, Pearson χ² in e6 fixed point —
    // rational (no transcendental to pin), so every step is integer
    // DIV and engine-exact. ONE corpus pass; the grid completion and
    // the divergence run on the Zipf-bounded sources × vocab relation.
    QueryDef("x_quality_chisq_drift",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.chiSquareDrift(spark.table("documents"), "text", "source")
          .orderBy("source")
      },
      Some(
        s"""WITH toks AS (
           |  SELECT source AS src, unnest(${ducktokens("text")}) AS token
           |  FROM documents
           |),
           |st AS (SELECT src, token, count(*) AS cnt FROM toks GROUP BY 1, 2),
           |src_totals AS (SELECT src, sum(cnt) AS n_src FROM st GROUP BY 1),
           |vocab AS (SELECT token, sum(cnt) AS cnt_t FROM st GROUP BY 1),
           |tot AS (SELECT sum(cnt_t) AS n_total FROM vocab),
           |grid AS (
           |  SELECT s.src, s.n_src,
           |         coalesce(x.cnt, 0) * 1000000 // s.n_src AS p_e6,
           |         v.cnt_t * 1000000 // t.n_total AS q_e6
           |  FROM src_totals s
           |  CROSS JOIN vocab v
           |  CROSS JOIN tot t
           |  LEFT JOIN st x ON x.src = s.src AND x.token = v.token
           |)
           |SELECT src AS source,
           |       CAST(max(n_src) AS BIGINT) AS n_tokens,
           |       CAST(sum((p_e6 - q_e6) * (p_e6 - q_e6)
           |                // greatest(q_e6, 1)) AS BIGINT) AS chisq_e6
           |FROM grid GROUP BY src
           |ORDER BY source""".stripMargin)),

    // Per-document token Shannon entropy — the information-density
    // screen (low entropy = keyword stuffing / template spam that the
    // distinct/total ratio under-reports on skewed mixes). Entirely
    // in-row: sort + ONE run-length fold, zero Exchange; per-term
    // nano-nat quantization then integer sums (the KL recipe), so the
    // relational DuckDB oracle lands on identical integers.
    QueryDef("x_quality_entropy",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.tokenEntropy(spark.table("documents"), "text")
          .orderBy("doc_id")
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id,
          |         unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '')) AS w
          |  FROM documents
          |),
          |c AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
          |n AS (SELECT doc_id, sum(c) AS n, count(*) AS nd FROM c GROUP BY 1),
          |t AS (
          |  SELECT c.doc_id,
          |         CAST(floor(CAST(c.c AS DOUBLE) / n.n
          |              * ln(CAST(n.n AS DOUBLE) / c.c) * 1e9 + 0.5) AS BIGINT) AS term_e9
          |  FROM c JOIN n USING (doc_id)
          |),
          |agg AS (SELECT doc_id, sum(term_e9) AS ent FROM t GROUP BY 1)
          |SELECT d.doc_id,
          |       CAST(coalesce(n.n, 0) AS BIGINT) AS n_tokens,
          |       CAST(coalesce(n.nd, 0) AS BIGINT) AS n_distinct,
          |       CAST(coalesce(agg.ent, 0) AS BIGINT) AS entropy_e9,
          |       CASE WHEN coalesce(n.nd, 0) > 1
          |            THEN CAST(floor(ln(CAST(n.nd AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
          |            ELSE CAST(0 AS BIGINT) END AS max_entropy_e9
          |FROM documents d
          |LEFT JOIN n ON n.doc_id = d.doc_id
          |LEFT JOIN agg ON agg.doc_id = d.doc_id
          |ORDER BY d.doc_id""".stripMargin)),

    // Gopher-style repetition/boilerplate profile: entirely in-row
    // (scan → project, zero shuffle). Line metrics are degenerate on
    // this single-line corpus (n_lines=1, dup/bullet/ellipsis 0) but
    // the token metrics and the pass flag are live signal.
    QueryDef("x_quality_gopher",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.gopherProfile(spark.table("documents"), "text")
          .orderBy("doc_id")
      },
      Some(
        """WITH base AS (
          |  SELECT doc_id, coalesce(text, '') AS t,
          |         list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '') AS ts,
          |         list_filter(list_transform(string_split(coalesce(text, ''), chr(10)), x -> trim(x)), x -> x <> '') AS ls
          |  FROM documents
          |),
          |m AS (
          |  SELECT doc_id, t, ls,
          |         CAST(len(ts) AS BIGINT) AS n_tokens,
          |         CAST(len(ls) AS BIGINT) AS n_lines,
          |         CAST(len(list_distinct(ts)) AS BIGINT) AS n_distinct,
          |         list_filter(ls, x -> len(list_filter(ls, y -> y = x)) > 1) AS dls
          |  FROM base
          |),
          |m2 AS (
          |  SELECT doc_id, n_tokens, n_lines, n_distinct,
          |         CAST(len(dls) AS BIGINT) AS n_dup_lines,
          |         CAST(coalesce(list_sum(list_transform(ls, x -> len(x))), 0) AS BIGINT) AS line_chars,
          |         CAST(coalesce(list_sum(list_transform(dls, x -> len(x))), 0) AS BIGINT) AS dup_line_chars,
          |         CAST(len(list_filter(ls, x -> starts_with(x, '-') OR starts_with(x, '*') OR starts_with(x, '•'))) AS BIGINT) AS n_bullet,
          |         CAST(len(list_filter(ls, x -> ends_with(x, '...'))) AS BIGINT) AS n_ellipsis,
          |         CAST(len(t) - len(replace(t, '#', '')) AS BIGINT) AS n_hash,
          |         CAST((len(t) - len(replace(t, '...', ''))) // 3 AS BIGINT) AS n_dots
          |  FROM m
          |)
          |SELECT doc_id, n_tokens, n_lines,
          |       1.0 - CAST(n_distinct AS DOUBLE) / greatest(n_tokens, 1) AS dup_token_frac,
          |       CAST(n_dup_lines AS DOUBLE) / greatest(n_lines, 1) AS dup_line_frac,
          |       CAST(dup_line_chars AS DOUBLE) / greatest(line_chars, 1) AS dup_line_char_frac,
          |       CAST(n_bullet AS DOUBLE) / greatest(n_lines, 1) AS bullet_line_frac,
          |       CAST(n_ellipsis AS DOUBLE) / greatest(n_lines, 1) AS ellipsis_line_frac,
          |       CAST(n_hash + n_dots AS DOUBLE) / greatest(n_tokens, 1) AS symbol_token_ratio,
          |       (n_tokens >= 50 AND n_tokens <= 100000
          |        AND 1.0 - CAST(n_distinct AS DOUBLE) / greatest(n_tokens, 1) <= 0.6
          |        AND CAST(n_hash + n_dots AS DOUBLE) / greatest(n_tokens, 1) <= 0.1
          |        AND CAST(n_bullet AS DOUBLE) / greatest(n_lines, 1) <= 0.9
          |        AND CAST(n_ellipsis AS DOUBLE) / greatest(n_lines, 1) <= 0.3
          |        AND CAST(dup_line_chars AS DOUBLE) / greatest(line_chars, 1) <= 0.2) AS gopher_pass
          |FROM m2
          |ORDER BY doc_id""".stripMargin)),

    // Paragraph self-duplication (C4/RefinedWeb dedup_para signal at doc
    // granularity): blank-line-delimited blocks, distinct vs total —
    // pure in-row map, integer permille. The corpus is single-line, so
    // the query augments deterministically on BOTH engines: appends a
    // shared footer and, for doc_id % 3 = 0, repeats the body paragraph.
    QueryDef("x_quality_para_dup",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_para").as("text"))
        Quality.paragraphDupStats(aug, "text").orderBy("doc_id")
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id,
          |         coalesce(text, '') || chr(10) || chr(10) ||
          |         'shared footer ' || (doc_id % 5) || chr(10) || chr(10) ||
          |         CASE WHEN doc_id % 3 = 0 THEN coalesce(text, '')
          |              ELSE 'unique tail ' || doc_id END AS t
          |  FROM documents
          |),
          |p AS (
          |  SELECT doc_id,
          |         list_filter(list_transform(string_split_regex(t, '\n{2,}'),
          |             x -> trim(x)), x -> x <> '') AS ps
          |  FROM aug
          |)
          |SELECT doc_id,
          |       CAST(len(ps) AS BIGINT) AS n_paras,
          |       CAST(len(list_distinct(ps)) AS BIGINT) AS n_distinct_paras,
          |       CAST(CASE WHEN len(ps) > 0
          |                 THEN (len(ps) - len(list_distinct(ps))) * 1000 // len(ps)
          |                 ELSE 0 END AS BIGINT) AS dup_para_permille
          |FROM p
          |ORDER BY doc_id""".stripMargin)),

    // CORPUS-level boilerplate paragraph mining (CCNet's paragraph-
    // frequency signal): paragraphs whose digest spans ≥ 10 distinct
    // docs are template chrome — here the 5 shared footers, each in
    // ~N/5 docs. Paragraphs reduce to (md5, doc_id) in-row before the
    // one digest-keyed agg; corpus text never shuffles.
    QueryDef("x_quality_boilerplate_mine",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_para").as("text"))
        Quality.boilerplateParagraphs(aug, "text", minDocs = 10)
          .orderBy(col("n_docs").desc, col("para_md5"))
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id,
          |         coalesce(text, '') || chr(10) || chr(10) ||
          |         'shared footer ' || (doc_id % 5) || chr(10) || chr(10) ||
          |         CASE WHEN doc_id % 3 = 0 THEN coalesce(text, '')
          |              ELSE 'unique tail ' || doc_id END AS t
          |  FROM documents
          |),
          |paras AS (
          |  SELECT doc_id, md5(p) AS para_md5
          |  FROM (SELECT doc_id,
          |               unnest(list_filter(list_transform(string_split_regex(t, '\n{2,}'),
          |                      x -> trim(x)), x -> x <> '')) AS p
          |        FROM aug) q
          |)
          |SELECT para_md5, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          |       CAST(count(*) AS BIGINT) AS n_occurrences
          |FROM paras GROUP BY 1 HAVING count(DISTINCT doc_id) >= 10
          |ORDER BY n_docs DESC, para_md5""".stripMargin)),

    // N-gram repetition stats (Gopher top-bigram coverage + repeated-
    // trigram coverage). DEFAULT = the compiled in-row kernel
    // (ngram_rep_e): zero Exchange, ~10× the relational form at sf1 —
    // promoted r7 after two rounds of side-by-side measurement.
    QueryDef("x_quality_ngram_rep",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.ngramRepetitionNative(spark.table("documents"), "text")
          .orderBy("doc_id")
      },
      Some(NgramRepOracle)),

    // The keyed-agg relational reference formulation, kept as the
    // deliberate kernel-vs-relational contrast pair (PLANS r5 §17):
    // same oracle, (doc, gram) shuffle tree instead of one map.
    QueryDef("x_quality_ngram_rep_relational",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.ngramRepetition(spark.table("documents"), "text")
          .orderBy("doc_id")
      },
      Some(NgramRepOracle),
      contrast = true),

    // Exact per-source token-length quantiles via the cumulative
    // histogram: corpus-sized work is one (source, len) count agg; the
    // running-sum window covers DISTINCT lengths only (domain-bounded).
    QueryDef("x_stats_length_quantiles",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.lengthQuantiles(spark.table("documents"), "text")
          .orderBy("source")
      },
      Some(
        """WITH h AS (
          |  SELECT source,
          |         CAST(len(list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '')) AS BIGINT) AS len
          |  FROM documents
          |),
          |hist AS (SELECT source, len, count(*) AS cnt FROM h GROUP BY 1, 2),
          |c AS (
          |  SELECT source, len,
          |         sum(cnt) OVER (PARTITION BY source ORDER BY len
          |                        ROWS UNBOUNDED PRECEDING) AS cum,
          |         sum(cnt) OVER (PARTITION BY source) AS total
          |  FROM hist
          |)
          |SELECT source,
          |       CAST(min(CASE WHEN cum >= ceil(0.25 * total) THEN len END) AS BIGINT) AS p25,
          |       CAST(min(CASE WHEN cum >= ceil(0.5 * total) THEN len END) AS BIGINT) AS p50,
          |       CAST(min(CASE WHEN cum >= ceil(0.75 * total) THEN len END) AS BIGINT) AS p75,
          |       CAST(min(CASE WHEN cum >= ceil(0.9 * total) THEN len END) AS BIGINT) AS p90,
          |       CAST(min(CASE WHEN cum >= ceil(0.99 * total) THEN len END) AS BIGINT) AS p99
          |FROM c GROUP BY source
          |ORDER BY source""".stripMargin)),

    // Per-source corpus report card: one group-keyed agg; text reduced
    // to a digest before the exchange (hashes on the wire, not docs).
    QueryDef("x_stats_corpus",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.corpusStats(spark.table("documents"), "text")
          .orderBy("source")
      },
      Some(
        """SELECT source,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(len(list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens,
          |       CAST(sum(len(coalesce(text, ''))) AS BIGINT) AS n_chars,
          |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
          |       CAST(count(DISTINCT md5(coalesce(text, ''))) AS BIGINT) AS n_distinct_texts,
          |       CAST(count(*) - count(DISTINCT md5(coalesce(text, ''))) AS BIGINT) AS n_exact_dups
          |FROM documents GROUP BY source
          |ORDER BY source""".stripMargin)),

    // Unigram commonness: log-free perplexity surrogate — mean corpus
    // token frequency in ppb; BIGINT end-to-end with ONE integer
    // division, so the value hashes identically cross-engine.
    QueryDef("x_quality_commonness",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.unigramCommonness(spark.table("documents"), "text")
          .orderBy("doc_id")
      },
      Some(
        """WITH e AS (
          |  SELECT doc_id,
          |         unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'), x -> x <> '')) AS token
          |  FROM documents
          |),
          |cnts AS (SELECT token, count(*) AS cnt FROM e GROUP BY token),
          |tot AS (SELECT sum(cnt) AS total FROM cnts),
          |d AS (
          |  SELECT e.doc_id, count(*) AS n_tokens, sum(cnt) AS sum_cnt
          |  FROM e JOIN cnts USING (token) GROUP BY e.doc_id
          |)
          |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
          |       CAST(sum_cnt AS BIGINT) AS sum_cnt,
          |       CAST(1000000000 * sum_cnt // (n_tokens * total) AS BIGINT) AS commonness_e9
          |FROM d CROSS JOIN tot
          |ORDER BY doc_id""".stripMargin)),

    // C4-style boilerplate removal over deterministically line-augmented
    // text (the corpus is single-line): every doc gains a unique
    // 'uid N' line (never hot), even docs a copyright footer, %3 docs a
    // generated-footer line — both cross the minDocs=100 threshold at
    // sf0.01 and are stripped; the unique lines and original text stay.
    QueryDef("x_quality_boilerplate",
      (spark, sfDir) => {
        val aug = augDocs(spark, sfDir)
          .select(col("doc_id"), col("text_lines").as("text"))
        Quality.removeBoilerplate(aug, "text", minDocs = 100)
          .orderBy("doc_id")
      },
      Some(
        """WITH aug AS (
          |  SELECT doc_id, coalesce(text, '') || chr(10) || 'uid ' || doc_id ||
          |         CASE WHEN doc_id % 2 = 0
          |              THEN chr(10) || '(c) example corp all rights reserved'
          |              ELSE '' END ||
          |         CASE WHEN doc_id % 3 = 0
          |              THEN chr(10) || 'generated page footer'
          |              ELSE '' END AS t
          |  FROM documents
          |),
          |dl AS (
          |  SELECT doc_id, unnest(list_distinct(list_filter(
          |           list_transform(string_split(t, chr(10)), x -> trim(x)),
          |           x -> x <> ''))) AS line
          |  FROM aug
          |),
          |hot AS (
          |  SELECT line FROM (
          |    SELECT line, count(*) AS n FROM dl GROUP BY line
          |  ) WHERE n >= 100 ORDER BY n DESC, line LIMIT 10000
          |),
          |h AS (SELECT coalesce(list(line), []) AS hotset FROM hot)
          |SELECT a.doc_id,
          |       CAST(len(string_split(a.t, chr(10))) AS BIGINT) AS n_lines,
          |       CAST(len(string_split(a.t, chr(10))) -
          |            len(list_filter(string_split(a.t, chr(10)),
          |                x -> NOT list_contains(h.hotset, trim(x)))) AS BIGINT) AS n_removed,
          |       array_to_string(list_filter(string_split(a.t, chr(10)),
          |           x -> NOT list_contains(h.hotset, trim(x))), chr(10)) AS clean_text
          |FROM aug a CROSS JOIN h
          |ORDER BY a.doc_id""".stripMargin)),

    // Bigram-LM quality score (the CCNet/RedPajama perplexity filter,
    // trained relationally in-engine): unigram+bigram count tables are
    // vocab-bounded broadcast relations; each distinct bigram's
    // -ln P(w2|w1) (add-one smoothed) quantizes ONCE to integer
    // micro-nats, per-doc totals are integer sums — order-free exact.
    QueryDef("x_quality_lm_score",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.bigramLmScore(spark.table("documents"), "text")
          .orderBy("doc_id")
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id,
          |         list_filter(string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '') AS ts
          |  FROM documents
          |),
          |uni AS (SELECT t AS w1, count(*) AS c1
          |        FROM (SELECT unnest(ts) AS t FROM tok) GROUP BY 1),
          |vv AS (SELECT count(*) AS v_size FROM uni),
          |bg AS (
          |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
          |  FROM tok, unnest(range(1, len(ts))) r(i)
          |),
          |bc AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
          |model AS (
          |  SELECT b.w1, b.w2,
          |         CAST(floor(ln(CAST(u.c1 + vv.v_size AS DOUBLE)
          |                       / CAST(b.c2 + 1 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS nll_e6
          |  FROM bc b JOIN uni u USING (w1) CROSS JOIN vv
          |),
          |sc AS (
          |  SELECT g.doc_id, count(*) AS nb, sum(m.nll_e6) AS se
          |  FROM bg g JOIN model m USING (w1, w2) GROUP BY 1
          |)
          |SELECT d.doc_id,
          |       CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
          |       CAST(coalesce(se, 0) AS BIGINT) AS nll_sum_e6,
          |       CAST(CASE WHEN coalesce(nb, 0) > 0 THEN se // nb ELSE 0 END AS BIGINT) AS avg_nll_e6
          |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
          |ORDER BY d.doc_id""".stripMargin)),

    // Weak-label Naive Bayes classifier (the fastText-style quality/
    // domain classifier of LLaMA/CCNet pipelines): trained relationally
    // on the lang='en' weak label, scored over the whole corpus via a
    // broadcast LLR model — integer micro-nat sums, any-engine exact.
    QueryDef("x_quality_nb_score",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.nbScore(spark.table("documents"), "text",
            col("lang") === "en")
          .orderBy("doc_id")
      },
      Some(
        """WITH tk AS (
          |  SELECT doc_id, lang = 'en' AS y,
          |         unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '')) AS w
          |  FROM documents
          |),
          |cls AS (
          |  SELECT w, sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
          |         sum(CASE WHEN y THEN 0 ELSE 1 END) AS nn
          |  FROM tk GROUP BY 1
          |),
          |tot AS (SELECT sum(np) AS tp, sum(nn) AS tn, count(*) AS v FROM cls),
          |model AS (
          |  SELECT w,
          |         CAST(floor((ln(CAST(np + 1 AS DOUBLE) / CAST(tp + v AS DOUBLE))
          |                   - ln(CAST(nn + 1 AS DOUBLE) / CAST(tn + v AS DOUBLE)))
          |                    * 1e6 + 0.5) AS BIGINT) AS llr_e6
          |  FROM cls CROSS JOIN tot
          |),
          |pr AS (
          |  SELECT CAST(floor(ln(
          |           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1 AS DOUBLE)
          |         / CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) + 1 AS DOUBLE))
          |         * 1e6 + 0.5) AS BIGINT) AS prior_e6
          |  FROM documents
          |),
          |sc AS (
          |  SELECT t.doc_id, count(*) AS nt, sum(m.llr_e6) AS s
          |  FROM tk t JOIN model m USING (w) GROUP BY 1
          |)
          |SELECT d.doc_id,
          |       CAST(coalesce(nt, 0) AS BIGINT) AS n_tokens,
          |       CAST(coalesce(s, 0) AS BIGINT) AS llr_sum_e6,
          |       CAST(coalesce(s, 0) + pr.prior_e6 AS BIGINT) AS total_llr_e6,
          |       (coalesce(s, 0) + pr.prior_e6) > 0 AS pred_pos
          |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
          |CROSS JOIN pr
          |ORDER BY d.doc_id""".stripMargin)),

    // Per-source unigram KL divergence from the corpus distribution —
    // the mixture-drift monitor (which source reads off-corpus).
    // Counts exact; each (source,word) term quantized once to integer
    // nano-nats, per-source totals integer sums.
    QueryDef("x_stats_source_kl",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.sourceUnigramKl(spark.table("documents"), "text")
          .orderBy("source")
      },
      Some(
        """WITH tok AS (
          |  SELECT source AS src,
          |         unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '')) AS w
          |  FROM documents
          |),
          |sw AS (SELECT src, w, count(*) AS csw FROM tok GROUP BY 1, 2),
          |st AS (SELECT src, sum(csw) AS src_total, count(*) AS n_distinct_tokens
          |       FROM sw GROUP BY 1),
          |gw AS (SELECT w, sum(csw) AS cw FROM sw GROUP BY 1),
          |tot AS (SELECT sum(cw) AS corpus_total FROM gw),
          |terms AS (
          |  SELECT s.src,
          |         CAST(floor(CAST(s.csw AS DOUBLE) / t.src_total
          |               * ln(CAST(s.csw * x.corpus_total AS DOUBLE)
          |                    / CAST(g.cw * t.src_total AS DOUBLE))
          |               * 1e9 + 0.5) AS BIGINT) AS term_e9,
          |         t.src_total, t.n_distinct_tokens
          |  FROM sw s
          |  JOIN st t USING (src)
          |  JOIN gw g USING (w)
          |  CROSS JOIN tot x
          |)
          |SELECT src AS source,
          |       CAST(max(src_total) AS BIGINT) AS n_tokens,
          |       CAST(max(n_distinct_tokens) AS BIGINT) AS n_distinct_tokens,
          |       CAST(sum(term_e9) AS BIGINT) AS kl_e9
          |FROM terms GROUP BY src
          |ORDER BY source""".stripMargin)),

    // Per-source Zipf rank–frequency slope — the corpus-health fit
    // (natural text: ln f ≈ a + s·ln r with s ≈ −1; machine-generated
    // and template text bends the curve). One (source,word) agg; rank
    // window + moment sums on the vocab-bounded relation; ln(rank)/
    // ln(count) quantize once to milli-nats, the slope is the same
    // double expression of exact integer sums on both engines.
    QueryDef("x_quality_zipf",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.zipfFit(spark.table("documents"), "text", "source")
          .orderBy("source")
      },
      Some(
        """WITH tok AS (
          |  SELECT source AS src,
          |         unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '')) AS w
          |  FROM documents
          |),
          |sw AS (SELECT src, w, count(*) AS c FROM tok GROUP BY 1, 2),
          |rk AS (
          |  SELECT src, c,
          |         row_number() OVER (PARTITION BY src ORDER BY c DESC, w ASC) AS r
          |  FROM sw
          |),
          |q AS (
          |  SELECT src, c,
          |         CAST(floor(ln(CAST(r AS DOUBLE)) * 1e3 + 0.5) AS BIGINT) AS lx,
          |         CAST(floor(ln(CAST(c AS DOUBLE)) * 1e3 + 0.5) AS BIGINT) AS ly
          |  FROM rk
          |),
          |s AS (
          |  SELECT src, count(*) AS n_types, sum(c) AS n_tokens,
          |         sum(lx) AS sx, sum(ly) AS sy,
          |         sum(lx * ly) AS sxy, sum(lx * lx) AS sxx
          |  FROM q GROUP BY 1
          |)
          |SELECT src AS source,
          |       CAST(n_types AS BIGINT) AS n_types,
          |       CAST(n_tokens AS BIGINT) AS n_tokens,
          |       CASE WHEN CAST(n_types AS DOUBLE) * sxx
          |                 - CAST(sx AS DOUBLE) * sx <> 0.0
          |            THEN (CAST(n_types AS DOUBLE) * sxy
          |                  - CAST(sx AS DOUBLE) * sy)
          |               / (CAST(n_types AS DOUBLE) * sxx
          |                  - CAST(sx AS DOUBLE) * sx)
          |            ELSE 0.0 END AS zipf_slope
          |FROM s
          |ORDER BY source""".stripMargin)),

    // Corpus concentration Gini per dimension (who owns the corpus):
    // exact e6 fixed point over doc counts; per dimension ONE count
    // agg, then rank + closing sum on the group-bounded relation.
    QueryDef("x_stats_gini",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.concentrationGini(spark.table("documents"),
            Seq("source", "lang"))
          .orderBy("dim")
      },
      Some(
        """WITH src AS (
          |  SELECT CAST(source AS VARCHAR) AS grp, count(*) AS x
          |  FROM documents GROUP BY 1
          |),
          |srcr AS (SELECT x, row_number() OVER (ORDER BY x ASC, grp ASC) AS i FROM src),
          |s1 AS (
          |  SELECT 'source' AS dim, count(*) AS n_groups, sum(x) AS n_docs,
          |         sum(i * x) AS s1
          |  FROM srcr
          |),
          |lng AS (
          |  SELECT CAST(lang AS VARCHAR) AS grp, count(*) AS x
          |  FROM documents GROUP BY 1
          |),
          |lngr AS (SELECT x, row_number() OVER (ORDER BY x ASC, grp ASC) AS i FROM lng),
          |s2 AS (
          |  SELECT 'lang' AS dim, count(*) AS n_groups, sum(x) AS n_docs,
          |         sum(i * x) AS s1
          |  FROM lngr
          |),
          |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
          |SELECT dim,
          |       CAST(n_groups AS BIGINT) AS n_groups,
          |       CAST(n_docs AS BIGINT) AS n_docs,
          |       CAST((2 * s1 - (n_groups + 1) * n_docs) * 1000000
          |            // greatest(n_groups * n_docs, 1) AS BIGINT) AS gini_e6
          |FROM u
          |ORDER BY dim""".stripMargin)),

    // Per-source Kolmogorov–Smirnov drift on the doc token-length
    // distribution (source vs REST) — the SHAPE monitor beside the two
    // vocabulary monitors (KL, χ²): truncated pages / concatenated
    // dumps move the length ECDF before the unigram mix shifts. Exact
    // integers end-to-end: D's numerator is max |cum_s·n_rest −
    // cum_rest·n_s| over the completed grid; everything after the one
    // corpus histogram runs on the |sources| × |distinct lengths|
    // relation.
    QueryDef("x_stats_ks_drift",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.ksLengthDrift(spark.table("documents"), "text")
          .orderBy("source")
      },
      Some(
        """WITH l AS (
          |  SELECT source AS src,
          |         CAST(len(list_filter(string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '')) AS BIGINT) AS len
          |  FROM documents
          |),
          |sl AS (SELECT src, len, count(*) AS c_sl FROM l GROUP BY 1, 2),
          |st AS (SELECT src, sum(c_sl) AS n_src FROM sl GROUP BY 1),
          |lt AS (SELECT len, sum(c_sl) AS c_len FROM sl GROUP BY 1),
          |tot AS (SELECT sum(c_len) AS n_all FROM lt),
          |grid AS (
          |  SELECT s.src, v.len, s.n_src, t.n_all - s.n_src AS n_rest,
          |         coalesce(x.c_sl, 0) AS c_sl, v.c_len
          |  FROM st s CROSS JOIN lt v CROSS JOIN tot t
          |  LEFT JOIN sl x ON x.src = s.src AND x.len = v.len
          |),
          |cum AS (
          |  SELECT src, len, n_src, n_rest,
          |         sum(c_sl) OVER w AS cum_s,
          |         sum(c_len) OVER w AS cum_all
          |  FROM grid
          |  WINDOW w AS (PARTITION BY src ORDER BY len
          |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |),
          |d AS (
          |  SELECT src, len, n_src, n_rest,
          |         abs(cum_s * n_rest - (cum_all - cum_s) * n_src) AS d_num,
          |         row_number() OVER (
          |           PARTITION BY src
          |           ORDER BY abs(cum_s * n_rest - (cum_all - cum_s) * n_src) DESC,
          |                    len ASC) AS rn
          |  FROM cum
          |)
          |SELECT src AS source,
          |       CAST(n_src AS BIGINT) AS n_docs,
          |       CAST(d_num * 1000000 // greatest(n_src * n_rest, 1) AS BIGINT) AS ks_e6,
          |       CAST(len AS BIGINT) AS at_len
          |FROM d WHERE rn = 1
          |ORDER BY source""".stripMargin)),

    // CCNet perplexity bucketing: head/middle/tail terciles of the
    // bigram-LM average NLL, cutoffs EXACT via the cumulative-histogram
    // trick on the e6-quantized score (distinct values bounded by the
    // fixed-point range, not corpus size). Head = most LM-like; CCNet
    // trains mostly on head+middle.
    QueryDef("x_quality_ppl_buckets",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.pplBuckets(spark.table("documents"), "text")
          .orderBy("doc_id")
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id,
          |         list_filter(string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '') AS ts
          |  FROM documents
          |),
          |uni AS (SELECT t AS w1, count(*) AS c1
          |        FROM (SELECT unnest(ts) AS t FROM tok) GROUP BY 1),
          |vv AS (SELECT count(*) AS v_size FROM uni),
          |bg AS (
          |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
          |  FROM tok, unnest(range(1, len(ts))) r(i)
          |),
          |bc AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
          |model AS (
          |  SELECT b.w1, b.w2,
          |         CAST(floor(ln(CAST(u.c1 + vv.v_size AS DOUBLE)
          |                       / CAST(b.c2 + 1 AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS nll_e6
          |  FROM bc b JOIN uni u USING (w1) CROSS JOIN vv
          |),
          |sc AS (
          |  SELECT g.doc_id, count(*) AS nb, sum(m.nll_e6) AS se
          |  FROM bg g JOIN model m USING (w1, w2) GROUP BY 1
          |),
          |scored AS (
          |  SELECT d.doc_id,
          |         CAST(CASE WHEN coalesce(nb, 0) > 0 THEN se // nb ELSE 0 END AS BIGINT) AS avg_nll_e6
          |  FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
          |),
          |h AS (SELECT avg_nll_e6, count(*) AS cnt FROM scored GROUP BY 1),
          |c AS (SELECT avg_nll_e6,
          |             sum(cnt) OVER (ORDER BY avg_nll_e6) AS cum,
          |             sum(cnt) OVER () AS total
          |      FROM h),
          |cuts AS (
          |  SELECT min(CASE WHEN cum >= ceil(total / 3.0) THEN avg_nll_e6 END) AS p33,
          |         min(CASE WHEN cum >= ceil(total * 2.0 / 3.0) THEN avg_nll_e6 END) AS p67
          |  FROM c
          |)
          |SELECT s.doc_id, s.avg_nll_e6,
          |       CASE WHEN s.avg_nll_e6 <= cuts.p33 THEN 'head'
          |            WHEN s.avg_nll_e6 <= cuts.p67 THEN 'middle'
          |            ELSE 'tail' END AS bucket
          |FROM scored s CROSS JOIN cuts
          |ORDER BY s.doc_id""".stripMargin)),

    // DSIR importance weights (Xie et al. 2023): hashed-bigram
    // log-ratio of target (lang='en') vs raw (whole corpus)
    // distributions over a FIXED 512-bucket feature space — the model
    // is 2·512 counters at any corpus size, so it broadcasts and the
    // whole operator is two key-bounded shuffles. Integer micro-nat
    // sums per doc (the fixed-point recipe) — any-engine exact.
    QueryDef("x_quality_dsir",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.dsirWeights(spark.table("documents"), "text",
            col("lang") === "en")
          .orderBy("doc_id")
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id, lang = 'en' AS y,
          |         list_filter(string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '') AS ts
          |  FROM documents
          |),
          |bg AS (
          |  SELECT doc_id, y,
          |         CAST('0x' || substr(md5(ts[i] || ' ' || ts[i + 1]), 1, 15) AS BIGINT) % 512 AS b
          |  FROM tok, unnest(range(1, len(ts))) r(i)
          |),
          |cnt AS (SELECT b, sum(CASE WHEN y THEN 1 ELSE 0 END) AS ct,
          |               count(*) AS cr
          |        FROM bg GROUP BY 1),
          |tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM cnt),
          |model AS (
          |  SELECT b,
          |         CAST(floor((ln(CAST(ct + 1 AS DOUBLE) / CAST(tt + 512 AS DOUBLE))
          |                   - ln(CAST(cr + 1 AS DOUBLE) / CAST(tr + 512 AS DOUBLE)))
          |                    * 1e6 + 0.5) AS BIGINT) AS llr_e6
          |  FROM cnt CROSS JOIN tot
          |),
          |sc AS (
          |  SELECT g.doc_id, count(*) AS nf, sum(m.llr_e6) AS s
          |  FROM bg g JOIN model m USING (b) GROUP BY 1
          |)
          |SELECT d.doc_id,
          |       CAST(coalesce(nf, 0) AS BIGINT) AS n_feats,
          |       CAST(coalesce(s, 0) AS BIGINT) AS llr_sum_e6,
          |       coalesce(s, 0) > 0 AS target_like
          |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
          |ORDER BY d.doc_id""".stripMargin)),

    // Dataset-card rollup: source / source×lang / corpus-total doc,
    // token, and char counts in ONE grouping-sets pass — the release
    // summary table every corpus ships, and the a5_grouping_sets
    // Fixed-bin histogram quantiles per language over document length
    // — the deterministic, oracle-checkable cousin of approx_percentile
    // (GK-sketch internals aren't engine-portable; width-64 bins are).
    // ONE map-side-combined groupBy collapses the corpus to
    // (langs × bins) cells before any exchange; the cumsum window and
    // final agg run over that tiny cell relation. BIGINT end to end
    // (cum·1000 ≥ q·total — no division), so parity is exact.
    QueryDef("x_stats_hist_quantiles",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Pipeline.histQuantiles(spark.table("documents"), "lang", "n_chars",
            binWidth = 64)
          .orderBy("lang")
      },
      Some(
        """WITH bins AS (
          |  SELECT lang, n_chars // 64 AS bin, count(*) AS n
          |  FROM documents GROUP BY 1, 2
          |),
          |cum AS (
          |  SELECT lang, bin, n,
          |         sum(n) OVER (PARTITION BY lang ORDER BY bin) AS cum,
          |         sum(n) OVER (PARTITION BY lang) AS total
          |  FROM bins
          |)
          |SELECT lang, CAST(max(total) AS BIGINT) AS n_rows,
          |       CAST(min(CASE WHEN cum * 1000 >= total * 500
          |                     THEN (bin + 1) * 64 - 1 END) AS BIGINT) AS p500_le,
          |       CAST(min(CASE WHEN cum * 1000 >= total * 900
          |                     THEN (bin + 1) * 64 - 1 END) AS BIGINT) AS p900_le,
          |       CAST(min(CASE WHEN cum * 1000 >= total * 990
          |                     THEN (bin + 1) * 64 - 1 END) AS BIGINT) AS p990_le
          |FROM cum GROUP BY lang
          |ORDER BY lang""".stripMargin)),

    // Robust (median/MAD) length-outlier audit — two composed passes
    // of the histogram sketch: binned median per language, binned MAD
    // of deviations, count beyond 3·MAD. The screen a mean+stddev
    // fence can't be (one huge doc moves a z-fence arbitrarily; the
    // median holds to 50% contamination). Each pass collapses the
    // corpus to (langs × bins) cells before any exchange; 1-row-per-
    // group relations broadcast between passes. BIGINT end to end.
    QueryDef("x_stats_robust_outliers",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Pipeline.robustOutliers(spark.table("documents"), "lang", "n_chars",
            binWidth = 64)
          .orderBy("lang")
      },
      Some(
        """WITH b1 AS (
          |  SELECT lang, n_chars // 64 AS bin, count(*) AS n
          |  FROM documents GROUP BY 1, 2
          |),
          |c1 AS (
          |  SELECT lang, bin, n,
          |         sum(n) OVER (PARTITION BY lang ORDER BY bin) AS cum,
          |         sum(n) OVER (PARTITION BY lang) AS total
          |  FROM b1
          |),
          |med AS (
          |  SELECT lang, CAST(max(total) AS BIGINT) AS n_rows,
          |         CAST(min(CASE WHEN cum * 1000 >= total * 500
          |                       THEN (bin + 1) * 64 - 1 END) AS BIGINT) AS med_le
          |  FROM c1 GROUP BY lang
          |),
          |dev AS (
          |  SELECT d.lang, m.n_rows, m.med_le,
          |         abs(d.n_chars - m.med_le) AS dv
          |  FROM documents d JOIN med m ON m.lang = d.lang
          |),
          |b2 AS (SELECT lang, dv // 64 AS bin, count(*) AS n FROM dev GROUP BY 1, 2),
          |c2 AS (
          |  SELECT lang, bin, n,
          |         sum(n) OVER (PARTITION BY lang ORDER BY bin) AS cum,
          |         sum(n) OVER (PARTITION BY lang) AS total
          |  FROM b2
          |),
          |mad AS (
          |  SELECT lang, CAST(min(CASE WHEN cum * 1000 >= total * 500
          |                            THEN (bin + 1) * 64 - 1 END) AS BIGINT) AS mad_le
          |  FROM c2 GROUP BY lang
          |)
          |SELECT d.lang, CAST(max(d.n_rows) AS BIGINT) AS n_rows,
          |       CAST(max(d.med_le) AS BIGINT) AS med_le,
          |       CAST(max(a.mad_le) AS BIGINT) AS mad_le,
          |       CAST(sum(CASE WHEN d.dv > 3 * a.mad_le THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_outliers
          |FROM dev d JOIN mad a ON a.lang = d.lang
          |GROUP BY d.lang
          |ORDER BY d.lang""".stripMargin)),

    // one-exchange collapse applied to curation stats.
    // KMV distinct-count sketch per source over 3-shingle hashes —
    // the oracle-CHECKABLE approximate distinct beside the rows-only
    // HLL entry (a6): the k smallest PORTABLE hashes are the same in
    // any engine, so the estimator ⌊(k−1)·2^60 / h_k⌋ (two exactly-
    // representable double factors, one correctly-rounded divide +
    // floor) hash-matches. Per-partition k-sized TreeSet state via
    // mapPartitions (the heavyHitters discipline), then one ranking
    // over ≤ k·partitions candidates per source; the exact n_true is
    // the audit column the oracle checks the estimate against.
    QueryDef("x_stats_kmv_distinct",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        val items = docShingles(spark, sfDir)
          .join(spark.table("documents").select("doc_id", "source"), "doc_id")
        Pipeline.kmvDistinct(items, "source", "shingle", k = 64)
          .withColumnRenamed("g", "source")
          .orderBy("source")
      },
      Some(
        s"""WITH ${shinglesCte(3)},
           |ss AS (
           |  SELECT DISTINCT d.source AS g, s.shingle AS h
           |  FROM sh s JOIN documents d ON d.doc_id = s.doc_id
           |),
           |stats AS (SELECT g, count(*) AS n_true FROM ss GROUP BY 1),
           |rk AS (
           |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
           |  FROM ss
           |),
           |kth AS (SELECT g, h AS h_k FROM rk WHERE rn = 64),
           |est AS (
           |  SELECT s.g, s.n_true, coalesce(k.h_k, 0) AS kth_min,
           |         CASE WHEN k.h_k IS NULL THEN CAST(s.n_true AS BIGINT)
           |              ELSE CAST(floor(63.0 * 1152921504606846976.0 / k.h_k) AS BIGINT)
           |         END AS est_distinct
           |  FROM stats s LEFT JOIN kth k ON k.g = s.g
           |)
           |SELECT g AS source, CAST(n_true AS BIGINT) AS n_true,
           |       CAST(kth_min AS BIGINT) AS kth_min, est_distinct,
           |       CAST(abs(est_distinct - n_true) * 1000 // n_true AS BIGINT) AS err_permille
           |FROM est
           |ORDER BY source""".stripMargin)),

    QueryDef("x_stats_dataset_card",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.datasetCard(spark.table("documents"), "text")
          .orderBy("source", "lang")
      },
      Some(
        """WITH base AS (
          |  SELECT source, lang,
          |         CAST(len(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
          |                   t -> t <> '')) AS BIGINT) AS nt,
          |         CAST(len(coalesce(text, '')) AS BIGINT) AS nc
          |  FROM documents
          |)
          |SELECT coalesce(source, '<all>') AS source,
          |       coalesce(lang, '<all>') AS lang,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(nt) AS BIGINT) AS n_tokens,
          |       CAST(sum(nc) AS BIGINT) AS n_chars,
          |       CAST(sum(nt) * 1000 // count(*) AS BIGINT) AS avg_tokens_milli
          |FROM base
          |GROUP BY ROLLUP (source, lang)
          |ORDER BY source, lang""".stripMargin)),

    // Kneser-Ney smoothed bigram LM (KenLM's smoothing — the CCNet
    // perplexity-filter signal, beside the add-one x_quality_lm_score):
    // continuation-count backoff with fixed D=0.75, all sufficient
    // stats exact integers over the vocab²-bounded bigram type
    // relation, per-bigram −ln P quantized once to micro-nats.
    QueryDef("x_quality_kn_lm",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.knBigramScore(spark.table("documents"), "text")
          .orderBy("doc_id")
      },
      Some(
        """WITH tok AS (
          |  SELECT doc_id,
          |         list_filter(string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '') AS ts
          |  FROM documents
          |),
          |bg AS (
          |  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
          |  FROM tok, unnest(range(1, len(ts))) r(i)
          |),
          |bc AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
          |lft AS (SELECT w1, sum(c2) AS c1, count(*) AS n1p FROM bc GROUP BY 1),
          |cont AS (SELECT w2, count(*) AS ncont FROM bc GROUP BY 1),
          |tt AS (SELECT count(*) AS tt FROM bc),
          |model AS (
          |  SELECT b.w1, b.w2,
          |         CAST(floor(-ln(
          |           greatest(CAST(b.c2 AS DOUBLE) - 0.75, 0.0) / CAST(l.c1 AS DOUBLE)
          |           + ((0.75 * CAST(l.n1p AS DOUBLE)) / CAST(l.c1 AS DOUBLE))
          |             * (CAST(c.ncont AS DOUBLE) / CAST(t.tt AS DOUBLE))
          |         ) * 1e6 + 0.5) AS BIGINT) AS nll_e6
          |  FROM bc b JOIN lft l USING (w1) JOIN cont c USING (w2) CROSS JOIN tt t
          |),
          |sc AS (
          |  SELECT g.doc_id, count(*) AS nb, sum(m.nll_e6) AS se
          |  FROM bg g JOIN model m USING (w1, w2) GROUP BY 1
          |)
          |SELECT d.doc_id,
          |       CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
          |       CAST(coalesce(se, 0) AS BIGINT) AS kn_nll_sum_e6,
          |       CAST(CASE WHEN coalesce(nb, 0) > 0 THEN se // nb ELSE 0 END AS BIGINT) AS kn_avg_nll_e6
          |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
          |ORDER BY d.doc_id""".stripMargin)),

    // Corpus-relative quality percentiles WITHOUT a global sort: the
    // "keep the top X%" selection rule via fixed-bin histograms — one
    // (signals × 64)-cell aggregation + broadcast lookup replaces
    // three percent_rank() windows (each a full-corpus sort). Exact
    // integer contract: pct = 1000·|strictly lower bins| DIV total.
    QueryDef("x_quality_pctl_ensemble",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.percentileEnsemble(spark.table("documents"), "text")
          .orderBy("doc_id")
      },
      Some(
        s"""WITH base AS (
           |  SELECT doc_id,
           |         CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars,
           |         CAST(len(${ducktokens("text")}) AS BIGINT) AS n_tokens,
           |         CAST(len(list_distinct(${ducktokens("text")})) AS BIGINT) AS n_distinct
           |  FROM documents
           |),
           |sig AS (
           |  SELECT doc_id, n_chars, n_tokens,
           |         n_distinct * 1000 // greatest(n_tokens, 1) AS distinct_permille,
           |         least(n_chars // 16, 63) AS b_chars,
           |         least(n_tokens // 4, 63) AS b_tokens,
           |         least((n_distinct * 1000 // greatest(n_tokens, 1)) // 16, 63) AS b_distinct
           |  FROM base
           |),
           |hc AS (SELECT b_chars AS bin, count(*) AS cnt FROM sig GROUP BY 1),
           |ht AS (SELECT b_tokens AS bin, count(*) AS cnt FROM sig GROUP BY 1),
           |hd AS (SELECT b_distinct AS bin, count(*) AS cnt FROM sig GROUP BY 1),
           |pc AS (SELECT bin, coalesce(sum(cnt) OVER (ORDER BY bin
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 1000
           |         // sum(cnt) OVER () AS pct FROM hc),
           |pt AS (SELECT bin, coalesce(sum(cnt) OVER (ORDER BY bin
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 1000
           |         // sum(cnt) OVER () AS pct FROM ht),
           |pd AS (SELECT bin, coalesce(sum(cnt) OVER (ORDER BY bin
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 1000
           |         // sum(cnt) OVER () AS pct FROM hd)
           |SELECT s.doc_id, s.n_chars, s.n_tokens, s.distinct_permille,
           |       CAST(pc.pct AS BIGINT) AS pct_chars,
           |       CAST(pt.pct AS BIGINT) AS pct_tokens,
           |       CAST(pd.pct AS BIGINT) AS pct_distinct,
           |       CAST((pc.pct + pt.pct + pd.pct) // 3 AS BIGINT) AS pct_ensemble
           |FROM sig s
           |JOIN pc ON pc.bin = s.b_chars
           |JOIN pt ON pt.bin = s.b_tokens
           |JOIN pd ON pd.bin = s.b_distinct
           |ORDER BY s.doc_id""".stripMargin)),

    // Poisson-bootstrap replicate means of doc token length — the
    // at-scale error bar on a corpus statistic: 32 resamples in ONE
    // scan (per-(row, replicate) Poisson(1) multiplicity from the
    // portable-hash uniform through an exact 2^40 fixed-point CDF
    // ladder; both engines draw the SAME resamples), map-side combine
    // collapses the B-fold expansion before the one exchange.
    QueryDef("x_stats_bootstrap",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        Quality.poissonBootstrap(spark.table("documents"), "text", b = 32)
          .orderBy("rep")
      },
      Some(
        """WITH lens AS (
          |  SELECT doc_id,
          |         CAST(len(list_filter(string_split_regex(coalesce(text, ''), '\s+'), t -> t <> '')) AS BIGINT) AS len
          |  FROM documents
          |),
          |reps AS (SELECT unnest(range(32)) AS rep),
          |u AS (
          |  SELECT r.rep, l.len,
          |         CAST('0x' || substr(md5(CAST(r.rep AS VARCHAR) || ':' || CAST(l.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
          |           % 1099511627776 AS u
          |  FROM lens l CROSS JOIN reps r
          |),
          |w AS (
          |  SELECT rep, len,
          |         CASE WHEN u < 404487723187 THEN 0
          |              WHEN u < 808975446375 THEN 1
          |              WHEN u < 1011219307969 THEN 2
          |              WHEN u < 1078633928500 THEN 3
          |              WHEN u < 1095487583633 THEN 4
          |              WHEN u < 1098858314660 THEN 5
          |              WHEN u < 1099420103164 THEN 6
          |              ELSE 7 END AS w
          |  FROM u
          |)
          |SELECT CAST(rep AS BIGINT) AS rep,
          |       CAST(sum(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_eff,
          |       CAST(sum(w) AS BIGINT) AS sum_w,
          |       CAST(sum(w * len) * 1000000 // GREATEST(sum(w), 1) AS BIGINT) AS mean_e6
          |FROM w
          |GROUP BY rep
          |ORDER BY rep""".stripMargin))
  )
}
