package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality/compliance operators over crafted documents that exercise
  * the paths the synthetic corpus can't (multi-line text, real dup
  * lines, PII, URLs).
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gopherProfile: line metrics on a boilerplate-shaped doc") {
    import spark.implicits._
    // 6 non-empty lines: "same" ×3 (12 of 30 line chars duplicated),
    // two bullet lines, one line ending in "..."
    val text = "same\nsame\nsame\n- bullet one\n* bullet two\nwait for it...\n\n"
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val r = Quality.gopherProfile(d, "text").collect()(0)
    assert(r.getAs[Long]("n_lines") == 6L)
    assert(r.getAs[Double]("dup_line_frac") == 3.0 / 6)
    val lineChars = 4 * 3 + 12 + 12 + 14
    assert(r.getAs[Double]("dup_line_char_frac") == 12.0 / lineChars)
    assert(r.getAs[Double]("bullet_line_frac") == 2.0 / 6)
    assert(r.getAs[Double]("ellipsis_line_frac") == 1.0 / 6)
    assert(!r.getAs[Boolean]("gopher_pass")) // < 50 tokens
  }

  test("paragraphDupStats: blank-line blocks, repeats, empty/null text") {
    import spark.implicits._
    val d = Seq(
      // 4 paragraphs, "dup" twice → 4 total, 3 distinct, 250‰
      (1L, "dup\n\nmiddle one\n\ndup\n\nlast"),
      // multi-blank-line separators and surrounding whitespace trim
      (2L, "a\n\n\n  a  \n\n\nb"),      // [a, a, b] → 3/2, 333‰
      (3L, "only one paragraph"),       // 1/1, 0‰
      (4L, ""),                         // 0 paras → permille 0, not ÷0
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = Quality.paragraphDupStats(d, "text").orderBy("doc_id")
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (4L, 3L, 250L), (3L, 2L, 333L), (1L, 1L, 0L), (0L, 0L, 0L), (0L, 0L, 0L)))
  }

  test("gopherProfile: symbol ratio counts # and ... per token") {
    import spark.implicits._
    val d = Seq((1L, "a # b ... c #")).toDF("doc_id", "text")
    val r = Quality.gopherProfile(d, "text").collect()(0)
    // tokens: a # b ... c #  (6); symbols: two '#' + one '...'
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Double]("symbol_token_ratio") == 3.0 / 6)
  }

  test("gopherProfile: dup_token_frac and null/empty text") {
    import spark.implicits._
    val d = Seq((1L, "x x x y"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val rs = Quality.gopherProfile(d, "text").orderBy("doc_id").collect()
    assert(rs(0).getAs[Double]("dup_token_frac") == 1.0 - 2.0 / 4)
    // null/empty: zero tokens/lines, every ratio 0 (guarded), no NaN
    for (i <- Seq(1, 2)) {
      assert(rs(i).getAs[Long]("n_tokens") == 0L)
      assert(rs(i).getAs[Double]("dup_token_frac") == 1.0) // 1 - 0/1
      assert(rs(i).getAs[Double]("dup_line_char_frac") == 0.0)
      assert(!rs(i).getAs[Boolean]("gopher_pass"))
    }
  }

  test("ngramRepetition: known top bigram and repeated trigrams") {
    import spark.implicits._
    // "a b a b a b": bigrams [a b, b a, a b, b a, a b] → top "a b"×3/5;
    // trigrams [a b a, b a b, a b a, b a b] → both repeated → rep 4/4
    val d = Seq((1L, "a b a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val rs = Quality.ngramRepetition(d, "text").orderBy("doc_id").collect()
    assert(rs(0).getAs[Long]("n_bigrams") == 5L)
    assert(rs(0).getAs[Long]("top_bigram_count") == 3L)
    assert(rs(0).getAs[Double]("top_bigram_frac") == 3.0 / 5)
    assert(rs(0).getAs[Long]("n_trigrams") == 4L)
    assert(rs(0).getAs[Double]("rep_trigram_frac") == 1.0)
    // doc 2: one bigram, no trigrams → NULL trigram stats (left join)
    assert(rs(1).getAs[Long]("n_bigrams") == 1L)
    assert(rs(1).isNullAt(rs(1).fieldIndex("rep_trigram_frac")))
  }

  test("ngramRepetition: docs under 2 tokens are absent") {
    import spark.implicits._
    val d = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    assert(Quality.ngramRepetition(d, "text").count() == 0L)
  }

  test("piiScreen counts and redactPii masks all three shapes") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail a.b+c@ex-ample.org or x@y.io, ip 192.168.0.1, call 555-0199"),
      (2L, "clean text, version 1.2 section 3.4.5 at 12:30")
    ).toDF("doc_id", "text")
    val rs = Quality.piiScreen(d, "text").orderBy("doc_id").collect()
    assert(rs(0).getAs[Long]("n_emails") == 2L)
    assert(rs(0).getAs[Long]("n_phones") == 1L)
    assert(rs(0).getAs[Long]("n_ips") == 1L)
    assert(rs(0).getAs[Boolean]("has_pii"))
    assert(rs(1).getAs[Long]("n_emails") == 0L &&
      rs(1).getAs[Long]("n_phones") == 0L && rs(1).getAs[Long]("n_ips") == 0L &&
      !rs(1).getAs[Boolean]("has_pii"))
    val red = Quality.redactPii(d, "text").orderBy("doc_id")
      .collect()(0).getAs[String]("text")
    assert(red == "mail <EMAIL> or <EMAIL>, ip <IP>, call <PHONE>")
  }

  test("urlHostProfile extracts hosts, aggregates reach, caps at k") {
    import spark.implicits._
    val d = Seq(
      (1L, "see https://a.com/x and http://b.net/y?z=1"),
      (2L, "again https://a.com/other"),
      (3L, "https://a.com/x https://a.com/x2 and https://c.org")
    ).toDF("doc_id", "text")
    val rs = Quality.urlHostProfile(d, "text", k = 2).collect()
    assert(rs.length == 2)
    assert(rs(0).getAs[String]("host") == "a.com")
    assert(rs(0).getAs[Long]("n_docs") == 3L && rs(0).getAs[Long]("n_urls") == 4L)
    // b.net and c.org tie on (1 doc, 1 url); host asc → b.net takes slot 2
    assert(rs(1).getAs[String]("host") == "b.net")
  }

  test("removeBoilerplate: strips hot lines, keeps order/blank/unique lines") {
    import spark.implicits._
    // "footer" appears (trimmed) in 3 docs → hot at minDocs=3; the
    // indented variant in doc 1 matches via trim; blank lines and
    // unique content survive in original order and form
    val d = Seq(
      (1L, "alpha\n  footer \n\nbeta"),
      (2L, "footer\ngamma"),
      (3L, "delta\nfooter")
    ).toDF("doc_id", "text")
    val hot = Quality.boilerplateLines(d, "text", minDocs = 3).collect()
    assert(hot.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("footer", 3L)))
    val r = Quality.removeBoilerplate(d, "text", minDocs = 3).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[String]("clean_text") == "alpha\n\nbeta")
    assert(r(1L).getAs[Long]("n_lines") == 4L)
    assert(r(1L).getAs[Long]("n_removed") == 1L)
    assert(r(2L).getAs[String]("clean_text") == "gamma")
    // below threshold → nothing removed
    val none = Quality.removeBoilerplate(d, "text", minDocs = 4).collect()
      .map(x => x.getLong(0) -> x.getAs[Long]("n_removed")).toMap
    assert(none.values.forall(_ == 0L))
  }

  test("ngramRepetitionNative ≡ ngramRepetition on edge and repeat docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b a b a"),         // top bigram "a b" ×2 of 4; trigrams: "a b a"×2, "b a b" → rep 2/3
      (2L, "x y"),               // bigrams but no trigrams → NULL trigram cols
      (3L, "solo"),              // 1 token → dropped
      (4L, ""),                  // empty → dropped
      (5L, null.asInstanceOf[String]), // null → dropped
      (6L, "  p  q\tr \n s ")    // messy whitespace
    ).toDF("doc_id", "text")
    val rel = Quality.ngramRepetition(d, "text").orderBy("doc_id").collect()
    val nat = Quality.ngramRepetitionNative(d, "text").orderBy("doc_id").collect()
    assert(rel.map(_.toSeq).toSeq == nat.map(_.toSeq).toSeq)
    val m = nat.map(x => x.getLong(0) -> x).toMap
    assert(m.keySet == Set(1L, 2L, 6L))
    assert(m(1L).getAs[Long]("top_bigram_count") == 2L)
    assert(m(1L).getAs[Double]("rep_trigram_frac") == 2.0 / 3)
    assert(m(2L).isNullAt(m(2L).fieldIndex("n_trigrams")))
    assert(m(6L).getAs[Long]("n_bigrams") == 3L)
  }

  test("normalizeText: NFC composes, controls strip, runs collapse, newlines live") {
    import spark.implicits._
    val d = Seq(
      (1L, "café  x"),          // decomposed é + double space
      (2L, "ab\tc"),            // bell stripped, tab collapsed
      (3L, " line1 \nline2\t "),      // newline PRESERVED, outer trim
      (4L, "clean"),                   // untouched
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = Quality.normalizeText(d, "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[String]("norm_text") == "café x")
    assert(r(1L).getAs[Boolean]("changed"))
    assert(r(2L).getAs[String]("norm_text") == "ab c")
    assert(r(3L).getAs[String]("norm_text") == "line1 \nline2")
    assert(r(4L).getAs[String]("norm_text") == "clean")
    assert(!r(4L).getAs[Boolean]("changed"))
    assert(r(5L).getAs[String]("norm_text") == "")
  }

  test("urlDedup: scheme/www/case/query/fragment/slash variants collapse") {
    import spark.implicits._
    val d = Seq(
      (1L, "see https://WWW.Site.Example.com/A/b/ and more"),
      (2L, "ref http://site.example.com/A/b?utm_source=x"),
      (3L, "ref https://site.example.com/A/b#frag"),
      (4L, "other https://site.example.com/other")
    ).toDF("doc_id", "text")
    val r = Quality.urlDedup(d, "text").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("site.example.com/A/b", "site.example.com/other"))
    val c = r("site.example.com/A/b")
    assert(c.getAs[Long]("n_docs") == 3L)
    assert(c.getAs[Long]("n_urls") == 3L)
    assert(c.getAs[Long]("first_doc") == 1L)
  }

  test("unigramCommonness: integer-exact mean token frequency") {
    import spark.implicits._
    // corpus: a a a b → cnt(a)=3, cnt(b)=1, total=4
    // doc 1 = "a a a": sum_cnt=9, n=3 → 1e9·9/(3·4) = 750000000
    // doc 2 = "b":     sum_cnt=1, n=1 → 1e9·1/(1·4) = 250000000
    val d = Seq((1L, "a a a"), (2L, "b"), (3L, "")).toDF("doc_id", "text")
    val r = Quality.unigramCommonness(d, "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(1L, 2L)) // empty doc emits no row
    assert(r(1L).getAs[Long]("commonness_e9") == 750000000L)
    assert(r(2L).getAs[Long]("commonness_e9") == 250000000L)
  }

  test("corpusStats: counts, language spread, exact-dup rate per group") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c", "en", "s1"), (2L, "a b c", "en", "s1"), // exact dup pair
      (3L, "d e", "fr", "s1"),
      (4L, "x", "en", "s2")
    ).toDF("doc_id", "text", "lang", "source")
    val r = Quality.corpusStats(d, "text").collect()
      .map(x => x.getString(0) -> x).toMap
    val s1 = r("s1")
    assert(s1.getAs[Long]("n_docs") == 3L)
    assert(s1.getAs[Long]("n_tokens") == 8L)
    assert(s1.getAs[Long]("n_chars") == 13L)
    assert(s1.getAs[Long]("n_langs") == 2L)
    assert(s1.getAs[Long]("n_distinct_texts") == 2L)
    assert(s1.getAs[Long]("n_exact_dups") == 1L)
    assert(r("s2").getAs[Long]("n_exact_dups") == 0L)
  }

  test("lengthQuantiles: exact rank selection on a known histogram") {
    import spark.implicits._
    // group g: lengths 1..10 (one doc each) → N=10; rank(q) = ceil(q·10)
    // p25 → rank 3 → len 3; p50 → 5; p75 → 8; p90 → 9; p99 → 10
    val d = (1 to 10).map(i => (s"g", i.toLong, ("w " * i).trim))
      .toDF("source", "doc_id", "text")
    val r = Quality.lengthQuantiles(d, "text").collect()(0)
    assert(r.getAs[Long]("p25") == 3L)
    assert(r.getAs[Long]("p50") == 5L)
    assert(r.getAs[Long]("p75") == 8L)
    assert(r.getAs[Long]("p90") == 9L)
    assert(r.getAs[Long]("p99") == 10L)
  }

  test("tfidfTopTerms ranks rare-but-frequent terms first") {
    import spark.implicits._
    // "rare" occurs twice in doc 1 and nowhere else → tf·N/df = 2·3/1 = 6
    // beats "common" (df 3): tf·N/df = 3·3/3 = 3
    val d = Seq(
      (1L, "rare rare common common common"),
      (2L, "common other other"),
      (3L, "common misc")
    ).toDF("doc_id", "text")
    val top = Quality.tfidfTopTerms(d, "text", k = 1).orderBy("doc_id").collect()
    assert(top(0).getAs[String]("token") == "rare")
    assert(top(0).getAs[Double]("tfidf") == 6.0)
    assert(top(1).getAs[String]("token") == "other") // 2·3/1 = 6 beats common 3·3/3
    assert(top(2).getAs[String]("token") == "misc")
    assert(top.forall(_.getAs[Long]("term_rank") == 1L))
  }

  test("moreLikeThis: shared rare terms score, stopwords pruned, self excluded") {
    import spark.implicits._
    // "common" is in all 5 docs (df·1000 = 5000 > n·800 = 4000 → pruned);
    // doc 1's remaining terms rare/alpha have df 2 of N 5 → rel ppm
    // = 2e6 DIV 5 = 400000 → w = 1e8 DIV 400000 = 250 (ratio-bounded
    // weight: never proportional to N, so no BIGINT overflow at scale)
    val d = Seq(
      (1L, "common rare alpha"),
      (2L, "common rare rare"),   // rare tf 2 → score 2·1·250 = 500
      (3L, "common solo"),        // shares only the pruned stopword → absent
      (4L, "common beta"),
      (5L, "common gamma alpha")  // alpha tf 1 → score 250
    ).toDF("doc_id", "text")
    val r = Quality.moreLikeThis(d, "text", queryId = 1L, k = 10,
        maxDfPermille = 800)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((2L, 500L), (5L, 250L)))
  }

  test("bigramLmScore: add-one smoothed micro-nat sums, hand-computed") {
    import spark.implicits._
    // uni: a=3 b=2 c=1, V=3; bigrams: (a,b)=2, (b,a)=1;
    // d4 empty → zero tokens, must not crash the bigram slice
    val d = Seq((1L, "a b a"), (2L, "a b"), (3L, "c"), (4L, ""))
      .toDF("doc_id", "text")
    def e6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val ab = e6(math.log(6.0 / 3.0)) // -ln P(b|a) = ln((3+3)/(2+1))
    val ba = e6(math.log(5.0 / 2.0)) // -ln P(a|b) = ln((2+3)/(1+1))
    val r = Quality.bigramLmScore(d, "text").orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, 2L, ab + ba, (ab + ba) / 2),
      (2L, 1L, ab, ab),
      (3L, 0L, 0L, 0L), // a 1-token doc has no bigrams, scores 0
      (4L, 0L, 0L, 0L)))
  }

  test("nbScore: hand-computed LLR sums and predictions on a separable corpus") {
    import spark.implicits._
    val d = Seq((1L, "en", "good nice"), (2L, "xx", "bad ugly"),
      (3L, "en", "good bad")).toDF("doc_id", "lang", "text")
    def e6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    // np/nn: good 2/0, nice 1/0, bad 1/1, ugly 0/1; tp=4 tn=2 v=4
    def llr(np: Long, nn: Long): Long =
      e6(math.log((np + 1.0) / 8.0) - math.log((nn + 1.0) / 6.0))
    val prior = e6(math.log(3.0 / 2.0)) // dp=2 dn=1
    val good = llr(2, 0); val nice = llr(1, 0)
    val bad = llr(1, 1); val ugly = llr(0, 1)
    val r = Quality.nbScore(d, "text", col("lang") === "en").orderBy("doc_id")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getBoolean(4)))
    assert(r.toSeq == Seq(
      (1L, 2L, good + nice, good + nice + prior, good + nice + prior > 0),
      (2L, 2L, bad + ugly, bad + ugly + prior, bad + ugly + prior > 0),
      (3L, 2L, good + bad, good + bad + prior, good + bad + prior > 0)))
    assert(r(0)._5 && !r(1)._5) // en-shaped doc positive, xx-shaped negative
  }

  test("sourceUnigramKl: corpus-identical source reads 0, skewed source positive") {
    import spark.implicits._
    // s1/s2 share the corpus shape; s3 is all-'a' (the drifted source)
    val d = Seq(("s1", "a b"), ("s2", "a b"), ("s3", "a a a a"))
      .toDF("source", "text")
    val r = Quality.sourceUnigramKl(d, "text").orderBy("source")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    def e9(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong
    // corpus: a=6 b=2 T=8; s1: (1/2)ln(8/12) + (1/2)ln(8/4)
    val s1 = e9(0.5 * math.log(8.0 / 12.0)) + e9(0.5 * math.log(2.0))
    val s3 = e9(math.log(32.0 / 24.0))
    assert(r.toSeq == Seq(
      ("s1", 2L, 2L, s1), ("s2", 2L, 2L, s1), ("s3", 4L, 1L, s3)))
    assert(s1 > 0 && s3 > 0) // KL ≥ 0; both diverge from the mix
  }

  test("chiSquareDrift: hand-computed grid incl. missing-token mass") {
    import spark.implicits._
    // srcA "a a b": a=2,b=1,n=3; srcB "b c": b=1,c=1,n=2.
    // corpus: a=2,b=2,c=1, N=5 → q_e6 = 400000/400000/200000.
    // A: p_e6 = 666666/333333/0 → contribs 177776 + 11111 + 200000
    //    (the c term is the MISSING-token (0−q)²/q mass KL can't see)
    // B: p_e6 = 0/500000/500000 → contribs 400000 + 25000 + 450000
    val d = Seq(("A", "a a b"), ("B", "b c")).toDF("source", "text")
    val r = Quality.chiSquareDrift(d, "text", "source").orderBy("source")
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("A", 3L, 388887L), ("B", 2L, 875000L)))
  }

  test("tokenEntropy: hand-computed terms; degenerate docs") {
    import spark.implicits._
    def e9(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong
    val d = Seq(
      (1L, "a a b"),        // 2/3·ln(3/2) + 1/3·ln(3), nd=2
      (2L, "x"),            // single token: H = 0, max = 0 (nd=1)
      (3L, "c c c c"),      // uniform single type: H = 0
      (4L, ""),             // empty: n=0, nd=0, H=0
      (5L, "b a a b")       // unsorted input: sort-then-fold, H=ln 2
    ).toDF("doc_id", "text")
    val r = Quality.tokenEntropy(d, "text").orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    val h1 = e9(2.0 / 3 * math.log(1.5)) + e9(1.0 / 3 * math.log(3.0))
    val h5 = e9(0.5 * math.log(2.0)) * 2
    assert(r.toSeq == Seq(
      (1L, 3L, 2L, h1, e9(math.log(2.0))),
      (2L, 1L, 1L, 0L, 0L),
      (3L, 4L, 1L, 0L, 0L),
      (4L, 0L, 0L, 0L, 0L),
      (5L, 4L, 2L, h5, e9(math.log(2.0)))))
  }

  test("tokenEntropy: in-row fold == relational definition (random docs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(12)
    val docs = (0 until 120).map { i =>
      val n = rnd.nextInt(40) // includes 0-token docs
      (i.toLong, Seq.fill(n)("w" + rnd.nextInt(8)).mkString(" "))
    }
    val d = docs.toDF("doc_id", "text")
    val got = Quality.tokenEntropy(d, "text").orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    def e9(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong
    val want = docs.map { case (id, text) =>
      val ts = text.split("\\s+").filter(_.nonEmpty)
      val n = ts.length
      val counts = ts.groupBy(identity).values.map(_.length)
      val ent = counts.map(c =>
        e9(c.toDouble / n * math.log(n.toDouble / c))).sum
      (id, n.toLong, counts.size.toLong, ent)
    }
    assert(got.toSeq == want)
  }

  test("zipfFit: hand-computed moments; degenerate single-type source") {
    import spark.implicits._
    // Z: a=4 b=2 c=1 → ranks 1,2,3. S: one type → denom 0 → slope 0.
    val d = Seq(("Z", "a a a a b b c"), ("S", "x x"))
      .toDF("source", "text")
    val r = Quality.zipfFit(d, "text").orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    def e3(v: Double): Long = math.floor(v * 1e3 + 0.5).toLong
    val (lx, ly) = (Seq(1L, 2L, 3L).map(r => e3(math.log(r.toDouble))),
      Seq(4L, 2L, 1L).map(c => e3(math.log(c.toDouble))))
    val (sx, sy) = (lx.sum, ly.sum)
    val sxy = lx.zip(ly).map { case (a, b) => a * b }.sum
    val sxx = lx.map(a => a * a).sum
    val slope = (3.0 * sxy - sx.toDouble * sy) /
      (3.0 * sxx - sx.toDouble * sx)
    assert(r.toSeq == Seq(("S", 1L, 2L, 0.0), ("Z", 3L, 7L, slope)))
    assert(slope < -1.0 && slope > -1.5) // a Zipf-ish head fits near −1
  }

  test("concentrationGini: exact two-group value; balanced groups read 0") {
    import spark.implicits._
    val d = Seq(
      ("A", "en"), ("B", "en"), ("B", "fr"), ("B", "fr")
    ).toDF("source", "lang")
    val r = Quality.concentrationGini(d, Seq("source", "lang"))
      .orderBy("dim").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // source: x = [1,3] → G = (2·(1+6) − 3·4)/(2·4) = 0.25
    // lang:   x = [2,2] → 0
    assert(r.toSeq == Seq(
      ("lang", 2L, 4L, 0L), ("source", 2L, 4L, 250000L)))
  }

  test("ksLengthDrift: hand-computed two-source ECDF sup") {
    import spark.implicits._
    // srcA lens {1,1,2} (n=3), srcB lens {2,3,3,3} (n=4). Merged grid
    // 1,2,3; cum_A = 2,3,3; cum_B = 0,1,4. d_num = |cum_A·4 − cum_B·3|
    // = 8, 9, 0 → sup 9 at len 2 (both directions — symmetric).
    // ks_e6 = 9·10⁶ // 12 = 750000.
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val d = Seq(
      ("A", doc(1)), ("A", doc(1)), ("A", doc(2)),
      ("B", doc(2)), ("B", doc(3)), ("B", doc(3)), ("B", doc(3))
    ).toDF("source", "text")
    val r = Quality.ksLengthDrift(d, "text").orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("A", 3L, 750000L, 2L), ("B", 4L, 750000L, 2L)))
  }

  test("ksLengthDrift: matches brute-force ECDF sup on random sources") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0 until 150).map { i =>
      val src = "s" + rnd.nextInt(3)
      val n = rnd.nextInt(15) // includes 0-token docs
      (src, Seq.fill(n)("w").mkString(" "))
    }
    val d = docs.toDF("source", "text")
    val got = Quality.ksLengthDrift(d, "text").orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val lens = docs.map { case (s, t) =>
      (s, t.split("\\s+").count(_.nonEmpty).toLong)
    }
    val grid = lens.map(_._2).distinct.sorted
    val want = lens.map(_._1).distinct.sorted.map { s =>
      val mine = lens.filter(_._1 == s).map(_._2)
      val rest = lens.filter(_._1 != s).map(_._2)
      val dnums = grid.map(l => (l,
        math.abs(mine.count(_ <= l).toLong * rest.length
          - rest.count(_ <= l).toLong * mine.length)))
      val dMax = dnums.map(_._2).max
      val atLen = dnums.filter(_._2 == dMax).map(_._1).min
      (s, mine.length.toLong,
        dMax * 1000000L / (mine.length.toLong * rest.length), atLen)
    }
    assert(got.toSeq == want)
  }

  test("ksLengthDrift: identical sources read zero drift") {
    import spark.implicits._
    def doc(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val d = Seq(
      ("A", doc(2)), ("A", doc(5)), ("B", doc(2)), ("B", doc(5))
    ).toDF("source", "text")
    val r = Quality.ksLengthDrift(d, "text").orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(2)))
    assert(r.toSeq == Seq(("A", 0L), ("B", 0L)))
  }

  test("pplBuckets: exact tercile cutoffs, ties land low") {
    import spark.implicits._
    // three distinct avg-NLL groups: "a b"×3 (common bigram, lowest
    // NLL), "e f g"×2 (middle), "c d"×1 (rarest bigram, highest) —
    // cum over distinct scores = 3, 5, 6; cutoffs at ceil(6/3)=2 and
    // ceil(12/3)=4 → head = the 3-doc group (ties stay low), middle =
    // the 2-doc group, tail = the rare doc
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "c d"),
      (5L, "e f g"), (6L, "e f g")).toDF("doc_id", "text")
    val r = Quality.pplBuckets(d, "text").orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.map(_._3).toSeq ==
      Seq("head", "head", "head", "tail", "middle", "middle"))
    // bucket order tracks score order
    val byBucket = r.groupBy(_._3).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBucket("head").max < byBucket("middle").min &&
      byBucket("middle").max < byBucket("tail").min)
  }

  test("dsirWeights: target-shaped docs outrank off-target; empty doc zero") {
    import spark.implicits._
    // d1 (target) and d3 share the target bigram vocabulary; d2 is
    // off-distribution junk. With Laplace smoothing on 512 buckets the
    // absolute signs are smoothing-dominated at toy scale, so the
    // contract asserted is the ORDERING the resampler consumes:
    // w(d3) > w(d1) > w(d2) (d1 pays for its duplicated feature mass).
    val d = Seq(
      (1L, "good text good text", "en"),
      (2L, "bad junk bad junk", "xx"),
      (3L, "good text", "xx"),
      (4L, "", "xx")
    ).toDF("doc_id", "text", "lang")
    val r = Quality.dsirWeights(d, "text", col("lang") === "en")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(r.map(_._2).toSeq == Seq(3L, 3L, 1L, 0L)) // bigram feature counts
    assert(r(2)._3 > r(0)._3 && r(0)._3 > r(1)._3)
    assert(r(3) == ((4L, 0L, 0L, false))) // no features → weight 0, not null
  }

  test("poissonBootstrap: md5-ladder brute mirror; reshuffle-proof") {
    import spark.implicits._
    val docs = (1L to 200L)
      .map(i => (i, Seq.fill((i % 13 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Quality.poissonBootstrap(docs, "text", b = 8)
      .orderBy("rep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent mirror: md5 → 15 hex chars → %2^40 → CDF ladder
    val th = Seq(404487723187L, 808975446375L, 1011219307969L,
      1078633928500L, 1095487583633L, 1098858314660L, 1099420103164L)
    def u(rep: Long, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$rep:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % (1L << 40)
    }
    def w(uu: Long): Long = {
      val i = th.indexWhere(uu < _); if (i < 0) 7L else i.toLong
    }
    val want = (0L until 8L).map { rep =>
      val ws = (1L to 200L).map(id => (w(u(rep, id)), id % 13 + 1))
      val sw = ws.map(_._1).sum
      val wl = ws.map(t => t._1 * t._2).sum
      (rep, ws.count(_._1 > 0).toLong, sw, wl * 1000000L / math.max(sw, 1L))
    }
    assert(got.toSeq == want)
    // resample mass concentrates near n (Poisson(1) mean 1 per row)
    assert(got.forall(t => t._3 > 100 && t._3 < 300))
    // physical layout must not change the draw
    val re = Quality.poissonBootstrap(docs.repartition(7), "text", b = 8)
      .orderBy("rep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(re.toSeq == got.toSeq)
  }
}
