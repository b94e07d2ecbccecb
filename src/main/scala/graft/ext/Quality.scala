package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-quality filters in the Gopher/C4 tradition (repetition
  * profiles, symbol ratios, boilerplate-line detection) plus the
  * compliance screens every training-data pipeline runs before a crawl
  * shard ships: PII detection/redaction and URL-host profiling.
  *
  * Scale contract (same as [[Pipeline]]): the per-document profiles are
  * pure maps — zero shuffle at any corpus size; the n-gram repetition
  * stats shuffle only on (doc, n-gram) keys; the host profile is a
  * host-keyed aggregation with a TakeOrderedAndProject top-k. Nothing
  * global, nothing driver-side.
  *
  * Parity note (repo-wide rule): every emitted ratio is ONE IEEE
  * division of exact per-row integers — deterministic and bit-identical
  * across engines, never rounded.
  */
object Quality {

  private def wsTokens(c: Column): Column =
    filter(split(coalesce(c, lit("")), "\\s+"), t => t =!= "")

  /** Per-document Gopher-style repetition/boilerplate profile, entirely
    * in-row (scan → project; no Exchange):
    *
    *  - `dup_token_frac`  — 1 − distinct/total whitespace tokens (the
    *    token-level repetition signal);
    *  - `dup_line_frac` / `dup_line_char_frac` — fraction of non-empty
    *    trimmed lines (and of their characters) whose line value occurs
    *    more than once in the document;
    *  - `bullet_line_frac` / `ellipsis_line_frac` — boilerplate-shaped
    *    lines (bullet-led, ellipsis-terminated);
    *  - `symbol_token_ratio` — '#' and '…'-as-"..." occurrences per
    *    token;
    *  - `gopher_pass` — the fixed-threshold conjunction (50 ≤ tokens ≤
    *    100000, dup_token_frac ≤ 0.6, symbol ratio ≤ 0.1, bullet ≤ 0.9,
    *    ellipsis ≤ 0.3, dup-line chars ≤ 0.2).
    *
    * The line scans are O(L²) per document in the number of LINES (not
    * characters) — bounded and in-row, the shape that beats a corpus-
    * wide line explode+join at every scale.
    */
  def gopherProfile(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val toks = wsTokens(col(textCol))
    val lines = filter(transform(split(t, "\n"), x => trim(x)), x => x =!= "")
    val nToks = size(toks).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val nLines = size(lines).cast("long")
    val dupLines = filter(lines,
      x => size(filter(lines, y => y === x)) > 1)
    val nDupLines = size(dupLines).cast("long")
    val lineChars = aggregate(lines, lit(0L), (acc, x) => acc + length(x))
    val dupLineChars = aggregate(dupLines, lit(0L), (acc, x) => acc + length(x))
    val nBullet = size(filter(lines, x =>
      startswith(x, lit("-")) || startswith(x, lit("*")) ||
        startswith(x, lit("•")))).cast("long")
    val nEllipsis = size(filter(lines, x => endswith(x, lit("...")))).cast("long")
    val nHash = (length(t) - length(replace(t, lit("#"), lit("")))).cast("long")
    val nDots = ((length(t) - length(replace(t, lit("..."), lit("")))) / 3)
      .cast("long") // (len diff) is a multiple of 3 — exact
    val d = (c: Column) => c.cast("double")
    docs.select(
        col(idCol),
        nToks.as("n_tokens"),
        nLines.as("n_lines"),
        (lit(1.0) - d(nDistinct) / d(greatest(nToks, lit(1L)))).as("dup_token_frac"),
        (d(nDupLines) / d(greatest(nLines, lit(1L)))).as("dup_line_frac"),
        (d(dupLineChars) / d(greatest(lineChars, lit(1L)))).as("dup_line_char_frac"),
        (d(nBullet) / d(greatest(nLines, lit(1L)))).as("bullet_line_frac"),
        (d(nEllipsis) / d(greatest(nLines, lit(1L)))).as("ellipsis_line_frac"),
        (d(nHash + nDots) / d(greatest(nToks, lit(1L)))).as("symbol_token_ratio"))
      .withColumn("gopher_pass",
        col("n_tokens") >= 50 && col("n_tokens") <= 100000 &&
          col("dup_token_frac") <= 0.6 &&
          col("symbol_token_ratio") <= 0.1 &&
          col("bullet_line_frac") <= 0.9 &&
          col("ellipsis_line_frac") <= 0.3 &&
          col("dup_line_char_frac") <= 0.2)
  }

  /** N-gram arrays over the whitespace tokens: positions i..i+n-1 for
    * i in [0, len-n], space-joined. Empty when the document has fewer
    * than n tokens (guarded — Spark's sequence() would count DOWN on a
    * negative stop and explode garbage n-grams).
    */
  private def ngramsCol(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o + 1)): _*))
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Per-document n-gram repetition statistics — the relational half of
    * the Gopher repetition profile (the half that genuinely needs a
    * shuffle, keyed on (doc, n-gram) so it scales with the corpus):
    *
    *  - `top_bigram_frac` — occurrences of the most frequent token
    *    2-gram over all 2-gram occurrences (count ties broken on the
    *    greatest gram string — deterministic across engines);
    *  - `rep_trigram_frac` — fraction of 3-gram occurrences whose gram
    *    occurs more than once.
    *
    * One explode per n; aggregation tree is (doc, gram) → doc, both
    * hash-partitioned. Docs shorter than n tokens are absent from that
    * n's stats (LEFT join from the bigram side; such docs get NULL
    * rep_trigram_frac).
    */
  def ngramRepetition(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val toks = wsTokens(col(textCol))
    def gramCounts(n: Int): DataFrame =
      docs.select(col(idCol), explode(ngramsCol(toks, n)).as("gram"))
        .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
    val bi = gramCounts(2)
      .groupBy(col(idCol))
      .agg(sum("cnt").as("n_bigrams"),
        max(struct(col("cnt"), col("gram"))).as("__top"))
      .select(col(idCol), col("n_bigrams"),
        col("__top.cnt").as("top_bigram_count"),
        (col("__top.cnt").cast("double") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"))
    val tri = gramCounts(3)
      .groupBy(col(idCol))
      .agg(sum("cnt").as("n_trigrams"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("rep"))
      .select(col(idCol), col("n_trigrams"),
        (col("rep").cast("double") / col("n_trigrams").cast("double"))
          .as("rep_trigram_frac"))
    bi.join(tri, Seq(idCol), "left")
      .select(col(idCol), col("n_bigrams"), col("top_bigram_count"),
        col("top_bigram_frac"), col("n_trigrams"), col("rep_trigram_frac"))
  }

  /** [[ngramRepetition]] as one compiled pass — identical output, zero
    * Exchange. The relational shape above shuffles every bigram AND
    * trigram on corpus-wide (doc, gram) string keys; both metrics are
    * per-document, so the kernel
    * ([[graft.functions.NgramRepExpression]]) computes all four
    * counters in-row and the operator collapses to Scan → Project.
    * Same oracle as the relational entry; same null contract (docs
    * with < 2 tokens dropped, trigram columns NULL when < 3 tokens).
    */
  def ngramRepetitionNative(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    graft.functions.NgramRepFunctions.register(docs.sparkSession)
    val s = graft.functions.NgramRepFunctions.ngram_rep_e(
      coalesce(col(textCol), lit("")))
    docs.select(col(idCol), s.as("__s"))
      .filter(col("__s.n_bigrams") > 0)
      .select(col(idCol),
        col("__s.n_bigrams").as("n_bigrams"),
        col("__s.top_bigram_count").as("top_bigram_count"),
        (col("__s.top_bigram_count").cast("double") /
          col("__s.n_bigrams").cast("double")).as("top_bigram_frac"),
        when(col("__s.n_trigrams") > 0, col("__s.n_trigrams"))
          .as("n_trigrams"),
        when(col("__s.n_trigrams") > 0,
          col("__s.rep_trigrams").cast("double") /
            col("__s.n_trigrams").cast("double"))
          .as("rep_trigram_frac"))
  }

  /** The three PII shapes screened, as (pattern, replacement-tag)
    * pairs. Patterns are deliberately RE2-compatible (no backrefs, no
    * lookaround) so the same pattern string runs in Spark's Java regex
    * AND DuckDB's RE2 — the cross-engine-parity constraint.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{3}[-. ]\\d{4}\\b", "<PHONE>"),
    ("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"))

  /** Per-document PII screen: counts of email-, phone-, and IPv4-shaped
    * matches plus a `has_pii` flag. Pure map (regexp_extract_all in
    * codegen) — zero shuffle at any corpus size.
    */
  def piiScreen(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    // IP before phone: "10.0.31.1" contains a phone-shaped suffix, so
    // counts are taken on the raw text per pattern (independent scans,
    // no masking between categories)
    val Seq(email, phone, ip) = piiPatterns.map { case (p, _) =>
      size(regexp_extract_all(t, lit(p), lit(0))).cast("long")
    }
    docs.select(col(idCol),
      email.as("n_emails"), phone.as("n_phones"), ip.as("n_ips"),
      (email + phone + ip > 0).as("has_pii"))
  }

  /** Redacted text: every [[piiPatterns]] match replaced by its tag, in
    * declaration order. Email first (its host part would otherwise be
    * eaten by the IP pattern when numeric). Pure map.
    */
  def redactPii(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn(textCol,
      piiPatterns.foldLeft(col(textCol)) { case (c, (p, tag)) =>
        regexp_replace(c, p, tag)
      })

  /** URL-host profile: extract `http(s)://` URLs, key on the host part,
    * and return the top `k` hosts by (document reach, total URLs). The
    * extraction is in-row; the aggregation is host-keyed; the top-k is
    * orderBy+limit — TakeOrderedAndProject, never a global sort or a
    * single-partition window (the [[Pipeline.vocabulary]] lesson).
    */
  def urlHostProfile(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", k: Int = 20): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val urls = regexp_extract_all(t, lit("https?://[^\\s]+"), lit(0))
    val hosts = transform(urls,
      u => regexp_extract(u, "^https?://([^/\\s]+)", 1))
    docs.select(col(idCol).as("__doc"), explode(hosts).as("host"))
      .groupBy("host")
      .agg(count_distinct(col("__doc")).as("n_docs"),
        count(lit(1)).as("n_urls"))
      .orderBy(col("n_docs").desc, col("n_urls").desc, col("host"))
      .limit(k)
  }

  /** Exact per-group token-length quantiles via the cumulative
    * histogram — the scale-correct exact-quantile shape: the only
    * corpus-sized operation is the (group, length) count aggregation;
    * the running-sum window then runs over DISTINCT lengths within each
    * group (domain-bounded — thousands of rows, not billions), never
    * over the corpus. Quantile q = the smallest length whose running
    * count reaches ceil(q·N) — an integer rank selection with no
    * interpolation, so engines can't disagree.
    *
    * Contrast with the naive shapes: a global row_number sort is the
    * single-partition scale-killer; percentile_approx is fast but not
    * oracle-exact. This is both exact AND partition-parallel.
    */
  def lengthQuantiles(docs: DataFrame, textCol: String,
      byCol: String = "source",
      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame = {
    val n = size(wsTokens(col(textCol))).cast("long")
    val hist = docs.select(col(byCol), n.as("len"))
      .groupBy(col(byCol), col("len")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col(byCol)).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("total", sum("cnt").over(Window.partitionBy(col(byCol))))
    val aggs = qs.map { q =>
      min(when(col("cum") >= ceil(lit(q) * col("total")), col("len")))
        .as(s"p${(q * 100).round}")
    }
    cum.groupBy(col(byCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-document top-`k` characteristic terms by linearized tf-idf.
    * The idf factor is N/df (NOT log(N/df)): rank order per document is
    * identical (log is monotone) and the score stays ONE division of
    * exact integers — `log()`'s last-ULP behavior differs between libm
    * and the JVM, which would break cross-engine hashing; N/df cannot.
    *
    * Shape: one token explode; tf = (doc, token) agg; df = token agg of
    * the tf relation (already distinct per doc — count(*) IS document
    * frequency, no count_distinct shuffle); corpus size joins in as a
    * broadcast 1-row aggregate; top-k per doc is a doc-partitioned
    * window — every stage keyed, nothing global.
    */
  def tfidfTopTerms(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", k: Int = 5): DataFrame =
    tfidfScored(docs, textCol, idCol)
      .withColumn("term_rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("tfidf").desc, col("token"))))
      .filter(col("term_rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"),
        col("tfidf"), col("term_rank").cast("long").as("term_rank"))

  /** The window-free twin of [[tfidfTopTerms]] — identical output,
    * per-key selection done by the [[graft.functions.TopKDesc]]
    * bounded-heap aggregate instead of `row_number() OVER`: the window
    * form exchanges EVERY (doc, term) row and sorts each doc's whole
    * group to keep k; the aggregate's partial (map-side) heaps reduce
    * each (doc, partition) to ≤ k rows BEFORE the exchange and the
    * reducer merges heaps — same exchange count, a fraction of the
    * shuffled bytes, no sort. Ordering (tfidf DESC, token ASC) matches
    * the window twin exactly, so both share one oracle.
    */
  def tfidfTopTermsHeap(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", k: Int = 5): DataFrame = {
    graft.functions.TopKFunctions.register(docs.sparkSession)
    tfidfScored(docs, textCol, idCol)
      .groupBy(col(idCol))
      .agg(graft.functions.TopKFunctions.topk_desc(col("tfidf"), col("token"),
        struct(col("token"), col("tf"), col("df"), col("tfidf")), k).as("__top"))
      .select(col(idCol), posexplode(col("__top")).as(Seq("__r", "__s")))
      .select(col(idCol), col("__s.token").as("token"),
        col("__s.tf").as("tf"), col("__s.df").as("df"),
        col("__s.tfidf").as("tfidf"),
        (col("__r") + 1).cast("long").as("term_rank"))
  }

  private def tfidfScored(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val toks = wsTokens(col(textCol))
    val tf = docs.select(col(idCol), explode(toks).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
  }

  /** More-like-this: the top-k documents most similar to `queryId`,
    * scored by a tf-idf-weighted dot product over SHARED terms — the
    * inverted-index query a search engine runs for "similar documents"
    * (Lucene's MoreLikeThis contract), expressed relationally.
    *
    * score(d) = Σ_{t ∈ d ∩ q} tf_d(t) · tf_q(t) · w(t), with the
    * integer idf weight w(t) = ⌊1e8 / max(1, ⌊df(t) · 1e6 / N⌋)⌋ — a
    * BIGINT in [100, 1e8] that depends only on the df/N RATIO (the
    * actual idf semantics), never on N itself, so the score is an
    * associative integer-product sum bounded at ANY corpus size: with
    * documents up to ~10⁵ tokens the per-candidate sum stays under
    * 10⁸ · 10¹⁰ = 10¹⁸ < 2⁶³ (the r5 advisor case — the previous
    * N·1e6/df weight overflowed at N ~ 1e9+, where Spark wraps
    * silently and DuckDB raises). No float fold-order or libm-log
    * dependence can diverge across engines (the repo-wide fixed-point
    * rule). `maxDfPermille` drops terms present in more than that
    * fraction of the corpus BEFORE the candidate join (Lucene
    * MoreLikeThis's maxDocFreqPct contract, in integer permille) — the
    * stopword prune that bounds the hottest posting lists, and
    * fraction-of-corpus so the same query means the same thing at
    * every scale factor.
    *
    * Scale shape: candidate generation is ONE broadcast-hash join of
    * the tiny query vector against the (doc, term, tf) relation — a
    * posting-list probe, not a corpus pair join — then a doc-keyed
    * partial agg and a TakeOrderedAndProject top-k. Honest cost note
    * (r5 advisor): unlike Lucene, which probes a PREBUILT index, this
    * convenience form derives tf and df from the corpus per call — two
    * corpus-sized aggregations. At scale, precompute the tf relation
    * once (e.g. persist it or reuse [[TextAnalysis]] artifacts) and
    * call [[moreLikeThisFromTf]], which shares one tf input across its
    * qvec and probe branches and adds only the df aggregation.
    */
  def moreLikeThis(docs: DataFrame, textCol: String, queryId: Long,
      idCol: String = "doc_id", k: Int = 10,
      maxDfPermille: Int = 1000): DataFrame = {
    val toks = wsTokens(col(textCol))
    val tf = docs.select(col(idCol).as("doc_id"), explode(toks).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    moreLikeThisFromTf(tf, queryId, k, maxDfPermille,
      nDocs = Some(docs.agg(count(lit(1)).as("n_docs"))))
  }

  /** [[moreLikeThis]] over a PRECOMPUTED (doc_id, token, tf) relation —
    * the production entry point: pass a persisted/bucketed tf table and
    * the per-query cost is the df agg + one broadcast probe, with the
    * corpus tokenization paid once, not per query.
    *
    * @param nDocs optional 1-row `(n_docs BIGINT)` relation giving the
    *              corpus size for the df ratio; defaults to the tf
    *              relation's distinct doc count (= total docs unless
    *              some documents tokenize to nothing)
    */
  def moreLikeThisFromTf(tf: DataFrame, queryId: Long, k: Int = 10,
      maxDfPermille: Int = 1000, nDocs: Option[DataFrame] = None): DataFrame = {
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = nDocs.getOrElse(
      tf.select("doc_id").distinct().agg(count(lit(1)).as("n_docs")))
    val qvec = tf.filter(col("doc_id") === queryId)
      .select(col("token"), col("tf").as("q_tf"))
      .join(df, "token")
      .crossJoin(broadcast(n))
      .filter(col("df") * 1000 <= col("n_docs") * maxDfPermille)
      .select(col("token"), col("q_tf"),
        expr("100000000 DIV greatest(1, df * 1000000 DIV n_docs)").as("w"))
    tf.filter(col("doc_id") =!= queryId)
      .join(broadcast(qvec), "token")
      .groupBy("doc_id")
      .agg(sum(col("tf") * col("q_tf") * col("w")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Cross-document boilerplate lines — trimmed non-empty lines
    * occurring in at least `minDocs` DISTINCT documents (nav bars,
    * cookie banners, copyright footers), capped at the `maxLines` most
    * frequent. The corpus-sized work is one explode of per-doc DISTINCT
    * lines + one line-keyed count agg; the cap compiles to
    * TakeOrderedAndProject (per-partition heap, never a global sort).
    * Result is ≤ maxLines rows by construction — THE broadcast/collect
    * side of the removal pass.
    */
  def boilerplateLines(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", minDocs: Int = 100,
      maxLines: Int = 10000): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val lines = array_distinct(
      filter(transform(split(t, "\n"), x => trim(x)), x => x =!= ""))
    docs.select(explode(lines).as("line"))
      .groupBy("line").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("line"))
      .limit(maxLines)
  }

  /** C4/RefinedWeb-style boilerplate removal: strip every line whose
    * trimmed value is in [[boilerplateLines]]' hot set; whitespace-only
    * lines and everything else pass through untouched, in original
    * order. Two jobs: the hot set (≤ maxLines rows — a bounded driver
    * collect, same contract as IVF's nprobe cell ids) is inlined as a
    * literal array, making the clean pass a PURE MAP — zero shuffle,
    * no join, whatever the corpus size. That is the shape that wins at
    * 100 TB: the alternative (explode lines → anti-join → re-assemble)
    * shuffles every byte of corpus text twice.
    */
  def removeBoilerplate(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", minDocs: Int = 100,
      maxLines: Int = 10000): DataFrame = {
    val hot = boilerplateLines(docs, textCol, idCol, minDocs, maxLines)
      .collect().map(_.getString(0)).sorted
    val hotLit = array(hot.map(lit).toSeq: _*)
    val t = coalesce(col(textCol), lit(""))
    val lines = split(t, "\n")
    val kept =
      if (hot.isEmpty) lines
      else filter(lines, l => !array_contains(hotLit, trim(l)))
    docs.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(kept)).cast("long").as("n_removed"),
      array_join(kept, "\n").as("clean_text"))
  }

  /** URL canonicalization + dedup profile: extract every URL, reduce it
    * to a canonical form — scheme dropped (http ≡ https), host
    * lowercased and `www.`-stripped, query string and fragment dropped,
    * trailing slashes trimmed — then one canonical-keyed aggregation:
    * distinct referencing docs, raw occurrence count, first (min) doc.
    * The extraction/canonicalization is a PURE MAP (RE2-compatible
    * patterns, so Spark and DuckDB run literally the same regexes); the
    * only shuffle is the final canonical-URL agg. This is the
    * crawl-frontier dedup every web-scale pipeline runs: the same page
    * crawled as http/https/www/?utm=… collapses to one key.
    */
  def urlDedup(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val urls = regexp_extract_all(t, lit("https?://[^\\s]+"), lit(0))
    val u = col("url")
    val host = lower(regexp_extract(u, "^https?://([^/?#\\s]+)", 1))
    val path = regexp_extract(u, "^https?://[^/?#\\s]+([^?#\\s]*)", 1)
    val canonical = concat(
      regexp_replace(host, "^www\\.", ""), rtrim(path, "/"))
    docs.select(col(idCol), explode(urls).as("url"))
      .select(col(idCol), canonical.as("canonical_url"))
      .groupBy("canonical_url")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_urls"),
        min(col(idCol)).as("first_doc"))
  }

  /** Per-document unigram commonness score — the log-free perplexity
    * surrogate: mean corpus frequency of the document's tokens, in
    * parts per billion. score_e9 = ⌊1e9 · Σ cnt(tok) / (n_tokens ·
    * total_tokens)⌋ — monotone in mean token probability (gibberish /
    * OCR noise scores low, boilerplate scores high), and every step is
    * BIGINT arithmetic ending in ONE integer division, so two engines
    * cannot disagree (a mean-log-prob formulation would hinge on libm
    * vs JVM `log` last-ULP behavior). At larger-than-local scale the
    * product `1e9·Σcnt` needs DECIMAL(38,0) headroom; the shape is
    * unchanged. Shape: one explode, a token-keyed count agg, a
    * token-keyed join back (AQE broadcasts the counts side when it
    * fits), a doc-keyed re-agg; the 1-row total broadcasts. Emits one
    * row per document with ≥ 1 token.
    */
  def unigramCommonness(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val toks = wsTokens(col(textCol))
    val exploded = docs.select(col(idCol), explode(toks).as("token"))
    val counts = exploded.groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    exploded
      .join(counts, "token")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("cnt")).as("sum_cnt"))
      .crossJoin(broadcast(total))
      .select(col(idCol), col("n_tokens"), col("sum_cnt"),
        expr("1000000000 * sum_cnt DIV (n_tokens * total)").as("commonness_e9"))
  }

  /** Per-source χ² domain-drift audit — "which source's token
    * distribution moved away from the corpus": for each `byCol` group,
    * Pearson's χ² divergence of its unigram distribution p from the
    * corpus distribution q, Σ_t (p_t − q_t)²/q_t — the drift/shift
    * screen run before a new crawl shard ships (a spiking source means
    * boilerplate injection, language drift, or a scraper bug).
    *
    * The rational, integer-exact companion to [[sourceUnigramKl]]:
    * KL needs a transcendental (pinned to quantized nano-nats there)
    * and, summing only over tokens the source HAS, misses the
    * missing-token mass; χ² covers the full sources × vocab grid —
    * the (0−q)²/q term charges a source for vocabulary it LACKS,
    * which is exactly what a topic-collapsed scraper looks like.
    * χ² is RATIONAL, so there is no transcendental to pin: with
    * shares quantized to e6 fixed point (p_e6 = cnt·1e6 DIV n_src,
    * q_e6 = cnt·1e6 DIV N) every step is integer and the result is
    * bit-identical in any engine. Per-token contribution
    * (p_e6−q_e6)² DIV max(q_e6, 1) sums in e6 (the max-1 guard keeps
    * source-exclusive ultra-rare tokens — q_e6 = 0 at the
    * quantization — finite and conservatively LARGE, the right
    * direction for a drift alarm). Tokens a source LACKS contribute
    * q_e6 (the (0−q)²/q term), so the grid is completed with a
    * sources × vocab left join before the final agg.
    *
    * Scale shape: ONE corpus pass (explode → (source, token) count agg
    * with map-side combine); everything after runs on the
    * Zipf-bounded (sources × distinct-token) relation — corpus text
    * never shuffles twice, and the grid completion is dimension-sized
    * (|sources| · |vocab|), never corpus-sized. Overflow headroom:
    * (p_e6−q_e6)² ≤ 1e12 per token, Σ over a 1e7-type vocab ≤ 1e19…
    * bounded by vocab·1e12 — sum in BIGINT holds to ~9·10^6 tokens of
    * maximal drift; real vocabularies at e6 quantization sit orders
    * below.
    */
  def chiSquareDrift(docs: DataFrame, textCol: String,
      byCol: String = "source"): DataFrame = {
    val toks = graft.text.Tokenizer.tokensCol(col(textCol))
    // one corpus pass: (source, token) counts — materialized once
    // (localCheckpoint, the containment-verify convention: eager, and
    // the Zipf-bounded relation is scanned by three consumers below
    // instead of re-running the corpus explode per consumer)
    val st = docs.select(col(byCol).as("src"), explode(toks).as("token"))
      .groupBy("src", "token").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val srcTotals = st.groupBy("src").agg(sum(col("cnt")).as("n_src"))
    val vocab = st.groupBy("token").agg(sum(col("cnt")).as("cnt_t"))
    val total = vocab.agg(sum(col("cnt_t")).as("n_total"))
    // complete the grid: every (source, token) cell, missing counts = 0
    // (srcTotals is |sources|-row — broadcast pinned so the grid is a
    // BroadcastNestedLoopJoin over the vocab relation, never a
    // CartesianProduct exchange)
    val grid = broadcast(srcTotals).crossJoin(vocab)
      .join(st, Seq("src", "token"), "left")
      .crossJoin(broadcast(total))
      .select(col("src"), col("n_src"),
        expr("coalesce(cnt, CAST(0 AS BIGINT)) * 1000000 DIV n_src").as("p_e6"),
        expr("cnt_t * 1000000 DIV n_total").as("q_e6"))
    grid
      .groupBy(col("src").as(byCol))
      .agg(max(col("n_src")).as("n_tokens"),
        sum(expr("(p_e6 - q_e6) * (p_e6 - q_e6) DIV greatest(q_e6, CAST(1 AS BIGINT))"))
          .as("chisq_e6"))
  }

  /** Text normalization screen — the canonical first pass of any crawl
    * pipeline: Unicode NFC (composed/decomposed spellings unify —
    * codegen'd [[graft.functions.NfcExpression]]; DuckDB's
    * `nfc_normalize` is the oracle twin), control characters stripped
    * (C0 minus \t \n \r, plus DEL), horizontal runs collapsed to one
    * space (newlines preserved — line structure feeds the boilerplate
    * screen), outer whitespace trimmed. Every step is a pure in-row
    * map with RE2-compatible patterns: zero shuffle at any corpus
    * size, identical regex semantics in both engines.
    */
  def normalizeText(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    graft.functions.NfcFunctions.register(docs.sparkSession)
    val t = coalesce(col(textCol), lit(""))
    val nfc = graft.functions.NfcFunctions.nfc_e(t)
    val stripped = regexp_replace(nfc,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val collapsed = trim(regexp_replace(stripped, "[ \\t]+", " "))
    docs.select(col(idCol), collapsed.as("norm_text"),
      (collapsed =!= t).as("changed"))
  }

  /** Per-document paragraph self-duplication stats — the C4/RefinedWeb
    * "dedup_para" signal at document granularity: how much of a doc is
    * its own paragraphs repeated (listings, scraped templates, chat
    * transcripts echo-quoting). Distinct from cross-doc span dedup
    * ([[Dedup.duplicateSpans]] needs ≥ minDf DOCS) and from
    * [[gopherProfile]]'s line-level fractions — paragraphs are
    * blank-line-delimited blocks, the unit C4 filters on. Entirely
    * in-row (scan → project, zero Exchange at any corpus size);
    * `dup_para_permille` is integer arithmetic, cross-engine exact.
    */
  def paragraphDupStats(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val paras = filter(
      transform(split(coalesce(col(textCol), lit("")), "\\n{2,}"),
        x => trim(x)),
      x => x =!= "")
    docs.select(col(idCol),
        size(paras).cast("long").as("n_paras"),
        size(array_distinct(paras)).cast("long").as("n_distinct_paras"))
      .withColumn("dup_para_permille",
        when(col("n_paras") > 0,
          expr("(n_paras - n_distinct_paras) * 1000 DIV n_paras"))
          .otherwise(lit(0L)))
  }

  /** Per-group corpus report card — the summary every shard ships with:
    * document/token/char counts, language spread, and the exact-dup
    * rate (docs minus distinct content digests). ONE group-keyed
    * aggregation pass; the two distincts share the same shuffle via
    * Spark's expand-based multi-distinct planning, and text itself is
    * reduced to a digest before it ever reaches the exchange (bytes on
    * the wire = 32-char hashes, not documents).
    */
  def corpusStats(docs: DataFrame, textCol: String,
      byCol: String = "source"): DataFrame = {
    val toks = wsTokens(col(textCol))
    docs
      .select(col(byCol), col("lang"),
        size(toks).cast("long").as("__n_toks"),
        length(coalesce(col(textCol), lit(""))).cast("long").as("__n_chars"),
        md5(coalesce(col(textCol), lit("")).cast("binary")).as("__digest"))
      .groupBy(col(byCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n_toks")).as("n_tokens"),
        sum(col("__n_chars")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("__digest")).as("n_distinct_texts"))
      .withColumn("n_exact_dups", col("n_docs") - col("n_distinct_texts"))
  }

  /** Bigram language-model quality score — the CCNet/RedPajama signal:
    * docs ranked by how surprising they read under a corpus-trained LM
    * (high score = repetitive gibberish or off-distribution text; the
    * classic perplexity filter, expressed relationally IN the engine
    * rather than against an external KenLM binary).
    *
    * Training IS aggregation: the unigram and bigram count tables are
    * vocabulary-bounded (the Zipf property — broadcast-sized at any
    * corpus size), so the "model" never leaves the cluster and scoring
    * is a broadcast join of each doc's bigrams against it, add-one
    * smoothed: P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V).
    *
    * Parity: each DISTINCT bigram's −ln P quantizes ONCE to integer
    * micro-nats (`floor(x·1e6+0.5)`, the repo's fixed-point recipe);
    * per-doc totals are then INTEGER sums — associative, fold-order
    * free, any-engine exact. −ln P ≥ 0 always (c(w1,w2) ≤ c(w1) and
    * V ≥ 1), so DIV truncation direction is moot for the average.
    */
  def bigramLmScore(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val toks = wsTokens(col(textCol))
    val uni = docs.select(explode(toks).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v_size"))
    val bg = docs
      .select(col(idCol), explode(zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val model = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .join(uni, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("nll_e6",
        floor(log((col("c1") + col("v_size")).cast("double") /
          (col("c2") + lit(1)).cast("double")) * lit(1e6) + lit(0.5))
          .cast("long"))
      .select("w1", "w2", "nll_e6")
    val scored = bg.join(broadcast(model), Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_e6")).as("nll_sum_e6"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_sum_e6"), lit(0L)).as("nll_sum_e6"))
      .withColumn("avg_nll_e6",
        when(col("n_bigrams") > 0, expr("nll_sum_e6 DIV n_bigrams"))
          .otherwise(lit(0L)))
  }

  /** Dataset-card rollup — the summary table a corpus release ships
    * (per source, per source×lang, and corpus-total doc/token/char
    * counts in ONE aggregation pass): `ROLLUP(by1, by2)` expands to
    * the three grouping sets inside a single exchange (the
    * a5_grouping_sets collapse, applied to corpus curation). Subtotal
    * rows surface as `<all>` so every output column stays scalar; the
    * milli-average is an integer DIV of exact sums.
    */
  def datasetCard(docs: DataFrame, textCol: String,
      by1: String = "source", by2: String = "lang"): DataFrame =
    docs.select(col(by1), col(by2),
        size(wsTokens(col(textCol))).cast("long").as("__nt"),
        length(coalesce(col(textCol), lit(""))).cast("long").as("__nc"))
      .rollup(col(by1), col(by2))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"),
        sum(col("__nc")).as("n_chars"),
        expr("sum(__nt) * 1000 DIV count(1)").as("avg_tokens_milli"))
      .select(coalesce(col(by1), lit("<all>")).as(by1),
        coalesce(col(by2), lit("<all>")).as(by2),
        col("n_docs"), col("n_tokens"), col("n_chars"),
        col("avg_tokens_milli"))

  /** Okapi BM25 ranked retrieval over the corpus for a literal term
    * set — the lexical side of hybrid search (the engine's F6 BM25
    * scores the FTS index's search corpus; this one ranks the raw
    * document table so it can fuse with the embedding side, which
    * lives in the same id space).
    *
    * Parity: every sufficient statistic is an exact integer (tf, dl,
    * df, N, Σdl); each (doc, term) contribution evaluates ONE fixed
    * IEEE op tree over them — Lucene's idf = ln(1 + (N−df+0.5)/
    * (df+0.5)), dl/avgdl written as (dl·N)/Σdl so it is a single
    * division — and quantizes once to e6; per-doc scores are then
    * integer sums (associative, fold-order free).
    *
    * Scale shape: tokens filter to the literal query terms BEFORE any
    * aggregation (the scan emits ≤ |terms| rows per doc), the
    * term-df and corpus-stats relations are broadcast (≤ |terms| rows
    * and 1 row), and the only exchanges are the tiny tf agg and the
    * top-k heap — the corpus text itself never shuffles.
    */
  def bm25TopK(docs: DataFrame, textCol: String, terms: Seq[String],
      k: Int = 50, idCol: String = "doc_id"): DataFrame = {
    val base = docs.select(col(idCol), wsTokens(col(textCol)).as("__ts"))
      .select(col(idCol), col("__ts"),
        size(col("__ts")).cast("long").as("dl"))
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col(idCol), col("dl"),
        explode(filter(col("__ts"),
          t => t.isin(terms.map(lit): _*))).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val d = (c: String) => col(c).cast("double")
    // k1 = 1.2, b = 0.75 — the canonical constants, written as the
    // same decimal literals on both engines (2.2 = k1+1, 0.25 = 1−b)
    val cE6 = floor(
      log(lit(1.0) + (d("n_docs") - d("df") + lit(0.5)) / (d("df") + lit(0.5))) *
        ((d("tf") * lit(2.2)) /
          (d("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
            ((col("dl") * col("n_docs")).cast("double") / d("sum_dl"))))) *
        lit(1e6) + lit(0.5)).cast("long")
    tf.join(broadcast(dfs), "term").crossJoin(broadcast(stats))
      .withColumn("__c_e6", cE6)
      .groupBy(col(idCol)).agg(sum(col("__c_e6")).as("bm25_e6"))
      .orderBy(col("bm25_e6").desc, col(idCol))
      .limit(k)
  }

  /** Kneser-Ney smoothed bigram LM score — the stronger sibling of
    * [[bigramLmScore]]'s add-one model (Kneser & Ney 1995; the
    * smoothing used by KenLM, whose perplexity is the CCNet filter
    * signal). Interpolated form with fixed discount D = 0.75 (exactly
    * representable in binary — the multiply stays a single correctly-
    * rounded IEEE op):
    *
    *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
    *            + (D·N1+(w1·)/c(w1·)) · (N1+(·w2)/T)
    *
    * where c(w1·) is w1's bigram-token count, N1+(w1·)/N1+(·w2) its
    * distinct right/left continuation counts, and T the total bigram
    * type count — the continuation-probability backoff that makes KN
    * beat raw frequency ("francisco" is frequent but only ever
    * follows "san").
    *
    * Same model/scoring split as [[bigramLmScore]]: all sufficient
    * statistics are exact integer aggs over the vocab²-bounded bigram
    * type relation (Zipf-broadcast-sized at any corpus scale); each
    * DISTINCT bigram's −ln P evaluates ONE fixed IEEE op tree over
    * those exact integers and quantizes once to micro-nats; per-doc
    * totals are integer sums — associative, fold-order free. P > 0
    * always for scored (= observed) bigrams since N1+(·w2) ≥ 1.
    */
  def knBigramScore(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val toks = wsTokens(col(textCol))
    val bg = docs
      .select(col(idCol), explode(zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val types = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val left = types.groupBy("w1")
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1p"))
    val cont = types.groupBy("w2").agg(count(lit(1)).as("ncont"))
    val tt = types.agg(count(lit(1)).as("tt"))
    val d = (c: String) => col(c).cast("double")
    val p = greatest(d("c2") - lit(0.75), lit(0.0)) / d("c1") +
      ((lit(0.75) * d("n1p")) / d("c1")) * (d("ncont") / d("tt"))
    val model = types.join(left, "w1").join(cont, "w2")
      .crossJoin(broadcast(tt))
      .withColumn("nll_e6",
        floor(-log(p) * lit(1e6) + lit(0.5)).cast("long"))
      .select("w1", "w2", "nll_e6")
    val scored = bg.join(broadcast(model), Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_e6")).as("nll_sum_e6"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_sum_e6"), lit(0L)).as("kn_nll_sum_e6"))
      .withColumn("kn_avg_nll_e6",
        when(col("n_bigrams") > 0, expr("kn_nll_sum_e6 DIV n_bigrams"))
          .otherwise(lit(0L)))
  }

  /** Weak-label Naive Bayes document classifier — the fastText-style
    * quality/domain classifier of the LLaMA/CCNet pipelines (train on
    * cheap weak labels, score the whole corpus), expressed as pure
    * relational algebra: "training" is one token-keyed agg producing
    * per-class token counts (vocab-bounded — the broadcast model), and
    * scoring is a broadcast join summing each token's log-likelihood
    * ratio, Laplace-smoothed, plus the class-prior ratio.
    *
    * Parity: per DISTINCT token the LLR quantizes ONCE to integer
    * micro-nats; per-doc totals and the prior are integer sums — the
    * [[bigramLmScore]] fixed-point recipe. `pred_pos` is a comparison
    * of exact integers.
    */
  def nbScore(docs: DataFrame, textCol: String, label: Column,
      idCol: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(idCol), label.cast("boolean").as("y"),
      explode(wsTokens(col(textCol))).as("w"))
    val cls = tok.groupBy("w").agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("np"),
      sum(when(col("y"), 0L).otherwise(1L)).as("nn"))
    val tot = cls.agg(sum(col("np")).as("tp"), sum(col("nn")).as("tn"),
      count(lit(1)).as("v"))
    val model = cls.crossJoin(broadcast(tot))
      .withColumn("llr_e6", floor(
        (log((col("np") + lit(1)).cast("double") /
            (col("tp") + col("v")).cast("double")) -
          log((col("nn") + lit(1)).cast("double") /
            (col("tn") + col("v")).cast("double"))) * lit(1e6) + lit(0.5))
        .cast("long"))
      .select("w", "llr_e6")
    val prior = docs.select(label.cast("boolean").as("y"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("dp"),
        sum(when(col("y"), 0L).otherwise(1L)).as("dn"))
      .select(floor(log((col("dp") + lit(1)).cast("double") /
        (col("dn") + lit(1)).cast("double")) * lit(1e6) + lit(0.5))
        .cast("long").as("prior_e6"))
    val scored = tok.join(broadcast(model), "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("llr_e6")).as("llr_sum_e6"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .crossJoin(broadcast(prior))
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("llr_sum_e6"), lit(0L)).as("llr_sum_e6"),
        (coalesce(col("llr_sum_e6"), lit(0L)) + col("prior_e6"))
          .as("total_llr_e6"))
      .withColumn("pred_pos", col("total_llr_e6") > 0)
  }

  /** Per-source unigram KL divergence from the corpus distribution —
    * the mixture-drift monitor: which sources read "off-corpus" (new
    * crawl gone wrong, a source switching language, dedup skew). KL(
    * P_source ‖ P_corpus) = Σ_w p_s(w)·ln(p_s(w)/p(w)); support(P_s) ⊆
    * support(P) by construction so no smoothing is needed.
    *
    * Shapes: (source,word) counts are one shuffle over the token
    * relation; everything after is vocabulary-bounded. Parity: counts
    * are exact integers; each (source,word) term quantizes once to
    * integer nano-nats and the per-source total is an integer sum
    * (same recipe as [[bigramLmScore]]); the ln argument is a ratio of
    * exact integer products (< 2⁵³ — double-exact).
    */
  def sourceUnigramKl(docs: DataFrame, textCol: String,
      byCol: String = "source"): DataFrame = {
    val tok = docs.select(col(byCol).as("src"),
      explode(wsTokens(col(textCol))).as("w"))
    val sw = tok.groupBy("src", "w").agg(count(lit(1)).as("csw"))
    val st = sw.groupBy("src").agg(sum(col("csw")).as("src_total"),
      count(lit(1)).as("n_distinct_tokens"))
    val gw = sw.groupBy("w").agg(sum(col("csw")).as("cw"))
    val tot = gw.agg(sum(col("cw")).as("corpus_total"))
    sw.join(st, "src")
      .join(broadcast(gw), "w")
      .crossJoin(broadcast(tot))
      .withColumn("term_e9",
        floor(col("csw").cast("double") / col("src_total") *
          log((col("csw") * col("corpus_total")).cast("double") /
            (col("cw") * col("src_total")).cast("double")) *
          lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("src").as(byCol))
      .agg(max(col("src_total")).as("n_tokens"),
        max(col("n_distinct_tokens")).as("n_distinct_tokens"),
        sum(col("term_e9")).as("kl_e9"))
  }

  /** CCNet perplexity bucketing: split the corpus into head / middle /
    * tail terciles of the [[bigramLmScore]] average NLL (head = lowest
    * perplexity = most language-model-like). CCNet ships each bucket
    * separately and trains mostly on head+middle — this is the
    * published quality gate, composed from the in-engine LM.
    *
    * The tercile cutoffs are EXACT, via the [[lengthQuantiles]]
    * cumulative-histogram trick on the e6-quantized score: the
    * distinct-value relation is bounded by the fixed-point RANGE (the
    * score is an integer average of bounded micro-nat values), not by
    * corpus size, so the single ordered window runs over a bounded
    * relation and the cutoffs broadcast back. p-th cutoff = smallest
    * score with cumulative count ≥ ⌈p·n⌉ (ties land in the lower
    * bucket — deterministic in any engine).
    */
  def pplBuckets(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val scored = bigramLmScore(docs, textCol, idCol)
      .select(col(idCol), col("avg_nll_e6"))
    val hist = scored.groupBy("avg_nll_e6").agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("avg_nll_e6"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("total", sum("cnt").over(Window.partitionBy(lit(1))))
    val cuts = cum.agg(
      min(when(col("cum") >= ceil(col("total") / 3.0), col("avg_nll_e6")))
        .as("p33"),
      min(when(col("cum") >= ceil(col("total") * 2.0 / 3.0), col("avg_nll_e6")))
        .as("p67"))
    scored.crossJoin(broadcast(cuts))
      .select(col(idCol), col("avg_nll_e6"),
        when(col("avg_nll_e6") <= col("p33"), "head")
          .when(col("avg_nll_e6") <= col("p67"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-like its HASHED n-gram features are,
    * log w(d) = Σ_f [ln p_target(f) − ln p_raw(f)], with bigram
    * features bucketed into a FIXED hash space. The fixed bucket count
    * is the scale property — the "model" is exactly 2·`buckets`
    * counters however large the corpus or its vocabulary, so training
    * is one bucket-keyed agg, the model broadcasts at any scale, and
    * scoring is a broadcast join + one doc-keyed agg (two shuffles
    * total, both key-bounded). This is the paper's own trick and the
    * reason DSIR runs on full CommonCrawl.
    *
    * `target` marks the target-distribution rows (the paper's
    * Wikipedia/books side); raw = the whole input. Laplace-smoothed on
    * the bucket space: p(b) = (c(b)+1)/(total+buckets).
    *
    * Parity: each bucket's log-ratio quantizes ONCE to integer
    * micro-nats (the [[bigramLmScore]] recipe); per-doc weights are
    * then integer sums — fold-order free, any-engine exact. No
    * average is emitted: log-weights are signed and integer DIV
    * truncates toward zero in Spark but floors in DuckDB, so a
    * quotient column would break parity for negative sums.
    */
  def dsirWeights(docs: DataFrame, textCol: String, target: Column,
      buckets: Int = 512, idCol: String = "doc_id"): DataFrame = {
    val toks = wsTokens(col(textCol))
    val feats = docs
      .select(col(idCol), target.cast("boolean").as("y"),
        explode(zip_with(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))).as("f"))
      .select(col(idCol), col("y"),
        (Dedup.portableHash(col("f")) % lit(buckets.toLong)).as("b"))
    // r14 OPTIMIZATION (guide §1.2-1/§2.3): `feats` used to be computed
    // TWICE — once under the model aggregation and once under the
    // scoring join — i.e. two full corpus scans + tokenize + bigram
    // explodes. Collapse the explode ONCE into per-(doc, bucket)
    // counts (map-side combined; ≤ min(n_feats, buckets) rows per doc)
    // and materialize THAT; both the model and the scoring derive from
    // it by exact integer sums, so every emitted number is unchanged.
    val dbf = feats.groupBy(col(idCol), col("y"), col("b"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val counts = dbf.groupBy("b").agg(
      sum(when(col("y"), col("__c")).otherwise(0L)).as("ct"),
      sum(col("__c")).as("cr"))
    val tot = counts.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val model = counts.crossJoin(broadcast(tot))
      .withColumn("llr_e6", floor(
        (log((col("ct") + lit(1)).cast("double") /
            (col("tt") + lit(buckets)).cast("double")) -
          log((col("cr") + lit(1)).cast("double") /
            (col("tr") + lit(buckets)).cast("double"))) * lit(1e6) + lit(0.5))
        .cast("long"))
      .select("b", "llr_e6")
    val scored = dbf.join(broadcast(model), "b")
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_feats"),
        sum(col("__c") * col("llr_e6")).as("llr_sum_e6"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("llr_sum_e6"), lit(0L)).as("llr_sum_e6"))
      .withColumn("target_like", col("llr_sum_e6") > 0)
  }

  /** CORPUS-level boilerplate paragraph mining — the cross-document
    * complement of [[paragraphDupStats]] (in-doc) and
    * [[boilerplateLines]] (in-doc line heuristics): a paragraph whose
    * digest appears in ≥ `minDocs` DISTINCT documents is template
    * chrome (nav, footers, license banners) — CCNet's
    * paragraph-frequency dedup signal, computed corpus-wide. Returns
    * one row per hot paragraph digest: distinct-doc count and total
    * occurrence count.
    *
    * Scale shape: paragraphs split in-row (the paragraphDupStats
    * split) and reduce to (md5, doc_id) 40-byte rows BEFORE the
    * exchange — the corpus text never shuffles; one digest-keyed agg
    * with map-side combine.
    */
  def boilerplateParagraphs(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", minDocs: Int = 10): DataFrame = {
    val paras = filter(
      transform(split(coalesce(col(textCol), lit("")), "\\n{2,}"),
        x => trim(x)),
      x => x =!= "")
    docs.select(col(idCol), explode(paras).as("__p"))
      .select(col(idCol), md5(col("__p").cast("binary")).as("para_md5"))
      .groupBy(col("para_md5"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Corpus-relative quality PERCENTILES via fixed-bin histograms —
    * the "keep the top X% by signal" selection rule, made scale-safe.
    * The naive form ranks every doc with percent_rank() — a global
    * sort of the corpus per signal. This form quantizes each signal
    * into data-independent fixed bins in-row, aggregates ONE tiny
    * (signals × bins) histogram — a single corpus pass for ALL
    * signals: each row contributes its three (signal, bin) pairs to
    * one map-side-combined count (ADVICE r10: the previous
    * per-signal groupBys scanned and re-tokenized the corpus once
    * per signal) — and assigns each doc the exact percentile of its
    * bin floor by a broadcast join, so the corpus is read exactly
    * twice (histogram pass + assignment pass), independent of signal
    * count. The ≤ (signals·bins)-row histogram collects to the
    * driver (the codebook-sized bounded-collect contract) to build
    * the cumulative tables. Percentile contract (exact, integer):
    * pct_permille = 1000·|docs in strictly lower bins| DIV total;
    * the within-bin tie is the documented resolution trade (bins are
    * the sketch).
    *
    * Signals (each an exact per-row integer, oracle-identical):
    * n_chars, whitespace-token count, distinct-token permille.
    *
    * EAGER at construction (ADVICE r11): the histogram pass RUNS as a
    * Spark job inside this call — the percentile tables are frozen
    * against the input as of now, so the returned plan does NOT
    * recompute cutoffs if the input changes before execution, and
    * construction itself can block or throw. This is the repo's
    * bounded-collect artifact convention (codebooks, LSH planes,
    * histogram tables build eagerly; the plan consumes the artifact).
    */
  def percentileEnsemble(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val toks = graft.text.Tokenizer.tokensCol(col(textCol))
    val base = docs.select(col(idCol),
        length(coalesce(col(textCol), lit(""))).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("distinct_permille",
        expr("n_distinct * 1000 DIV greatest(n_tokens, CAST(1 AS BIGINT))"))
      // fixed, data-independent bin edges: 64 bins per signal
      .withColumn("__b_chars", least(expr("n_chars DIV 16"), lit(63L)))
      .withColumn("__b_tokens", least(expr("n_tokens DIV 4"), lit(63L)))
      .withColumn("__b_distinct", least(expr("distinct_permille DIV 16"), lit(63L)))
    val hist = base.select(explode(array(
        struct(lit("chars").as("sig"), col("__b_chars").as("bin")),
        struct(lit("tokens").as("sig"), col("__b_tokens").as("bin")),
        struct(lit("distinct").as("sig"), col("__b_distinct").as("bin"))))
        .as("__sb"))
      .groupBy(col("__sb.sig").as("sig"), col("__sb.bin").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .collect() // ≤ signals·bins = 192 rows — codebook-bounded
    def pctTable(sig: String, binCol: String, pctName: String): DataFrame = {
      val cells = hist.filter(_.getString(0) == sig)
        .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val total = cells.map(_._2).sum
      var below = 0L
      val rows = cells.toSeq.map { case (bin, cnt) =>
        val pct = below * 1000L / total // positive DIV = truncation
        below += cnt
        (bin, pct)
      }
      val spark = docs.sparkSession
      import spark.implicits._
      rows.toDF(binCol, pctName)
    }
    base
      .join(broadcast(pctTable("chars", "__b_chars", "pct_chars")), "__b_chars")
      .join(broadcast(pctTable("tokens", "__b_tokens", "pct_tokens")), "__b_tokens")
      .join(broadcast(pctTable("distinct", "__b_distinct", "pct_distinct")), "__b_distinct")
      .withColumn("pct_ensemble",
        expr("(pct_chars + pct_tokens + pct_distinct) DIV 3"))
      .select(col(idCol), col("n_chars"), col("n_tokens"),
        col("distinct_permille"), col("pct_chars"), col("pct_tokens"),
        col("pct_distinct"), col("pct_ensemble"))
  }

  /** Per-document token Shannon entropy — the information-density
    * screen (low entropy = keyword stuffing, template spam, repeated
    * boilerplate; complements [[gopherProfile]]'s distinct/total ratio,
    * which is blind to SKEWED-but-not-identical token mixes, and
    * [[TextAnalysis]]'s MATTR, which measures positional type variety
    * rather than distributional mass). H = Σ_w (c_w/n)·ln(n/c_w).
    *
    * Shape: entirely in-row — sort the token array once, then ONE
    * run-length fold over the sorted array accumulates each distinct
    * token's entropy term; scan → project, zero Exchange at any corpus
    * size (the relational (doc,token) groupBy would shuffle every
    * corpus token for a per-doc statistic). Parity: each term
    * quantizes once to integer nano-nats (floor(x·1e9 + 0.5), the
    * [[sourceUnigramKl]] recipe) and the doc total is an integer sum —
    * order-independent, engine-exact; the ln argument is a ratio of
    * exact integers (< 2⁵³). `max_entropy_e9` = ln(n_distinct) in the
    * same fixed point, so callers form the evenness ratio themselves
    * from two exact integers.
    */
  def tokenEntropy(docs: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val term = // entropy term for a closed run of `run` copies, in e9
      """IF(s.run > 0,
        |   CAST(floor(CAST(s.run AS DOUBLE) / n
        |              * ln(CAST(n AS DOUBLE) / s.run) * 1e9 + 0.5)
        |        AS BIGINT),
        |   CAST(0 AS BIGINT))""".stripMargin
    docs
      .select(col(idCol), array_sort(wsTokens(col(textCol))).as("ts"))
      .withColumn("n", size(col("ts")).cast("long"))
      .withColumn("st", expr(
        s"""aggregate(
           |  ts,
           |  struct(CAST('' AS STRING) AS prev, CAST(0 AS BIGINT) AS run,
           |         CAST(0 AS BIGINT) AS ent, CAST(0 AS BIGINT) AS nd),
           |  (s, x) -> IF(x = s.prev,
           |    struct(s.prev AS prev, s.run + CAST(1 AS BIGINT) AS run,
           |           s.ent AS ent, s.nd AS nd),
           |    struct(x AS prev, CAST(1 AS BIGINT) AS run,
           |           s.ent + $term AS ent,
           |           s.nd + IF(s.run > 0, CAST(1 AS BIGINT),
           |                     CAST(0 AS BIGINT)) AS nd)),
           |  s -> struct(s.ent + $term AS ent,
           |              s.nd + IF(s.run > 0, CAST(1 AS BIGINT),
           |                        CAST(0 AS BIGINT)) AS nd))""".stripMargin))
      .select(col(idCol),
        col("n").as("n_tokens"),
        col("st.nd").as("n_distinct"),
        col("st.ent").as("entropy_e9"),
        when(col("st.nd") > 1,
          floor(log(col("st.nd").cast("double")) * lit(1e9) + lit(0.5))
            .cast("long"))
          .otherwise(lit(0L)).as("max_entropy_e9"))
  }

  /** Per-source Zipf rank–frequency fit — the corpus-health check that
    * catches machine-generated and template text: natural language
    * follows ln(freq) ≈ a + s·ln(rank) with slope s ≈ −1, while spam
    * mills, log dumps, and lorem-ipsum generators bend the curve
    * (flat s → uniform vocabulary; steep s → a few tokens dominating).
    * Least-squares slope over the log–log rank/frequency points of
    * each source's unigram table.
    *
    * Shapes: ONE (source, word) corpus aggregation; the rank window
    * and the moment sums run on the Zipf/vocab-bounded relation.
    * Parity: ranks and counts are exact integers; ln(rank)/ln(count)
    * quantize ONCE each to integer milli-nats (floor(x·1e3 + 0.5)),
    * the four moment sums are integer sums of integer products
    * (|lx| ≤ 17e3 ⇒ per-term products ≤ 3e8 — safe to ~3×10¹⁰ types),
    * and the closing slope is the SAME double expression of those
    * exact sums on both engines (deterministic IEEE ops — the sums
    * may exceed 2⁵³ at extreme vocab, where both engines round the
    * identical way).
    */
  def zipfFit(docs: DataFrame, textCol: String,
      byCol: String = "source"): DataFrame = {
    val sw = docs
      .select(col(byCol).as("src"), explode(wsTokens(col(textCol))).as("w"))
      .groupBy("src", "w").agg(count(lit(1)).as("c"))
    val rankW = Window.partitionBy("src").orderBy(col("c").desc, col("w").asc)
    sw.withColumn("r", row_number().over(rankW).cast("long"))
      .withColumn("lx", floor(log(col("r").cast("double")) * lit(1e3)
        + lit(0.5)).cast("long"))
      .withColumn("ly", floor(log(col("c").cast("double")) * lit(1e3)
        + lit(0.5)).cast("long"))
      .groupBy(col("src").as(byCol))
      .agg(count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(col("lx") * col("ly")).as("sxy"),
        sum(col("lx") * col("lx")).as("sxx"))
      .select(col(byCol), col("n_types"), col("n_tokens"),
        expr("""CASE WHEN CAST(n_types AS DOUBLE) * sxx
               |          - CAST(sx AS DOUBLE) * sx <> 0.0
               |       THEN (CAST(n_types AS DOUBLE) * sxy
               |             - CAST(sx AS DOUBLE) * sy)
               |          / (CAST(n_types AS DOUBLE) * sxx
               |             - CAST(sx AS DOUBLE) * sx)
               |       ELSE CAST(0.0 AS DOUBLE) END""".stripMargin)
          .as("zipf_slope"))
  }

  /** Corpus concentration report — the Gini coefficient of the
    * document-count distribution over each requested dimension (who
    * owns the corpus: is it 50 balanced sources or one crawler wearing
    * twenty hats?). The data-governance companion to
    * [[datasetCard]]'s per-group counts: one number per dimension,
    * comparable across snapshots. G = (2·Σᵢ i·xᵢ − (n+1)·Σx) /
    * (n·Σx) with xᵢ ascending, reported in exact e6 fixed point
    * (numerator is provably ≥ 0, so positive-integer DIV truncation is
    * engine-independent; exact while n_groups·n_docs·10⁶ < 2⁶³ — any
    * real dimension qualifies).
    *
    * Shapes: per dimension, ONE map-side-combinable count aggregation,
    * then the rank window and the closing sum run on the
    * group-cardinality-bounded relation; dimensions union.
    */
  def concentrationGini(docs: DataFrame,
      dims: Seq[String] = Seq("source", "lang")): DataFrame = {
    require(dims.nonEmpty, "at least one dimension")
    dims.map { d =>
      val counts = docs.groupBy(col(d).cast("string").as("grp"))
        .agg(count(lit(1)).as("x"))
      val rk = Window.orderBy(col("x").asc, col("grp").asc)
      counts.withColumn("i", row_number().over(rk).cast("long"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("x")).as("n_docs"),
          sum(col("i") * col("x")).as("s1"))
        .select(lit(d).as("dim"), col("n_groups"), col("n_docs"),
          expr("""(2 * s1 - (n_groups + 1) * n_docs) * 1000000
                 |DIV greatest(n_groups * n_docs, CAST(1 AS BIGINT))"""
            .stripMargin).as("gini_e6"))
    }.reduce(_.unionByName(_))
  }

  /** Per-source two-sample Kolmogorov–Smirnov drift over the document
    * token-length distribution — source vs REST of corpus. The SHAPE
    * drift monitor beside the two vocabulary monitors
    * ([[sourceUnigramKl]], [[chiSquareDrift]]): a scraper that starts
    * emitting truncated pages or concatenated dumps moves the length
    * ECDF long before the unigram mix shifts. D = sup_x |F_s(x) −
    * F_rest(x)|, reported exactly in integers: d_num = max |cum_s·
    * n_rest − cum_rest·n_s| over the merged length grid, `ks_e6` =
    * 10⁶·d_num DIV (n_s·n_rest), plus the length achieving the sup
    * (ties → smallest length — deterministic in any engine). The
    * 10⁶·d_num product runs in DECIMAL(38,0) (d_num can reach
    * n_s·n_rest when the distributions are disjoint — exactly the
    * drift the monitor exists to catch — so a BIGINT product would
    * overflow at ~6×10⁶ docs); the remaining bound is the BIGINT cum
    * products, n_s·n_rest < 2⁶³ — safe to ~6×10⁹ documents; past
    * that, run per-shard and compare shard ECDFs, or widen the cum
    * columns to decimal.
    *
    * Shapes: lengths are an in-row map; the (source, len) histogram is
    * ONE map-side-combinable corpus aggregation, checkpointed once for
    * its three consumers (the [[chiSquareDrift]] convention);
    * everything after — grid completion, the per-source cumulative
    * window, the argmax — runs on the |sources| × |distinct lengths|
    * relation, bounded by max document size, not corpus size. The
    * |sources|-row totals broadcast so grid completion is a
    * BroadcastNestedLoopJoin, never a CartesianProduct exchange.
    */
  def ksLengthDrift(docs: DataFrame, textCol: String,
      byCol: String = "source"): DataFrame = {
    val sl = docs
      .select(col(byCol).as("src"),
        size(wsTokens(col(textCol))).cast("long").as("len"))
      .groupBy("src", "len").agg(count(lit(1)).as("c_sl"))
      .localCheckpoint(true)
    val srcTot = sl.groupBy("src").agg(sum(col("c_sl")).as("n_src"))
    val lenTot = sl.groupBy("len").agg(sum(col("c_sl")).as("c_len"))
    val total = lenTot.agg(sum(col("c_len")).as("n_all"))
    val grid = broadcast(srcTot).crossJoin(lenTot)
      .join(sl, Seq("src", "len"), "left")
      .crossJoin(broadcast(total))
      .select(col("src"), col("len"), col("n_src"),
        (col("n_all") - col("n_src")).as("n_rest"),
        coalesce(col("c_sl"), lit(0L)).as("c_sl"), col("c_len"))
    val w = Window.partitionBy("src").orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .withColumn("cum_s", sum(col("c_sl")).over(w))
      .withColumn("cum_all", sum(col("c_len")).over(w))
      .withColumn("d_num",
        abs(col("cum_s") * col("n_rest")
          - (col("cum_all") - col("cum_s")) * col("n_src")))
    val pick = Window.partitionBy("src")
      .orderBy(col("d_num").desc, col("len").asc)
    cum.withColumn("__rn", row_number().over(pick))
      .where(col("__rn") === 1)
      .select(col("src").as(byCol),
        col("n_src").as("n_docs"),
        expr("""CAST(CAST(d_num AS DECIMAL(38, 0)) * 1000000
               |DIV CAST(greatest(n_src * n_rest, CAST(1 AS BIGINT))
               |         AS DECIMAL(38, 0)) AS BIGINT)""".stripMargin)
          .as("ks_e6"),
        col("len").as("at_len"))
  }

  /** Fixed-point Poisson(1) CDF ladder at 2^40 scale: a uniform on
    * [0, 2^40) maps to a resample multiplicity 0..7 (P(w > 7|λ=1) ≈
    * 1e-5 — the cap is the documented truncation). The constants are
    * floor(CDF(k)·2^40); both engines share them literally.
    */
  private val PoissonT = Seq(404487723187L, 808975446375L,
    1011219307969L, 1078633928500L, 1095487583633L, 1098858314660L,
    1099420103164L)

  /** Poisson-bootstrap replicate means of per-document token length —
    * the at-scale uncertainty quantification for corpus statistics
    * (the one-pass bootstrap of Chamandy et al. 2012, "Estimating
    * uncertainty for massive data streams": per (row, replicate) the
    * resample multiplicity is an independent Poisson(1) draw, so all
    * B resamples run in ONE corpus scan with no resample ever
    * materialized). A corpus report that says "mean doc length 412"
    * without an interval can't distinguish drift from noise; the
    * spread of these B replicate means IS the interval.
    *
    * Determinism: the draw is the portable-hash uniform of
    * (replicate, id) pushed through the exact 2^40 fixed-point
    * Poisson CDF ladder ([[PoissonT]]) — both engines draw the SAME
    * resamples, and each replicate mean is positive-integer algebra
    * (Σw·len · 1e6 DIV Σw), so the output is engine-identical with
    * no float anywhere.
    *
    * Scale shape: the B-fold row expansion feeds straight into a
    * map-side-combinable aggregation — each partition collapses to
    * ≤ B rows before the one exchange, so the shuffle carries
    * O(partitions·B) rows at any corpus size. B is a constant (32),
    * not a function of the data.
    */
  def poissonBootstrap(docs: DataFrame, textCol: String, b: Int = 32,
      idCol: String = "doc_id"): DataFrame = {
    require(b >= 1, s"b must be >= 1, got $b")
    val spark = docs.sparkSession
    val lens = docs.select(col(idCol).cast("string").as("id"),
      size(wsTokens(col(textCol))).cast("long").as("len"))
    val reps = spark.range(0, b).select(col("id").as("rep"))
    val u = pmod(graft.ext.Dedup.portableHash(
      concat(col("rep").cast("string"), lit(":"), col("id"))),
      lit(1L << 40))
    val w = PoissonT.zipWithIndex
      .foldLeft(when(u < PoissonT.head, 0L)) { case (acc, (t, i)) =>
        if (i == 0) acc else acc.when(u < t, i.toLong)
      }
      .otherwise(lit(7L))
    lens.crossJoin(broadcast(reps))
      .select(col("rep"), col("len"), w.as("w"))
      .groupBy("rep")
      .agg(sum(when(col("w") > 0, 1L).otherwise(0L)).as("n_eff"),
        sum(col("w")).as("sum_w"),
        sum(col("w") * col("len")).as("wlen"))
      .select(col("rep"), col("n_eff"), col("sum_w"),
        // DECIMAL(38,0) for the ·1e6 product (the ks_e6 precedent):
        // Σw·len·1e6 leaves BIGINT near ~10¹³ resampled tokens
        expr("""CAST(CAST(wlen AS DECIMAL(38, 0)) * 1000000
               |DIV CAST(greatest(sum_w, CAST(1 AS BIGINT))
               |         AS DECIMAL(38, 0)) AS BIGINT)""".stripMargin)
          .as("mean_e6"))
  }
}
