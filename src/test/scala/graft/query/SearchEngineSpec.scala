package graft.query

import graft.{RefFixtures, TestSpark}
import graft.index.{IndexJob, TextIndex}
import graft.query.SearchEngine.Request
import graft.text.Tokenize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Query-engine parity with the reference plugin e2e tests
  * (reference tests/test_plugin.py): FTS cases, timeline order, sort
  * overrides, facet counts — over the exact emails/commits fixture.
  *
  * Divergence (documented, SURVEY §2.5): the reference breaks ties in
  * SQLite scan order (effectively rowid); we break ties with the
  * deterministic (type, key). The 2020-08-01T00:05:02 tie between
  * emails:1 and commits:a5b39c therefore orders emails first here,
  * commits first in the reference.
  */
class SearchEngineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val index: DataFrame = {
    RefFixtures.registerPlugin(spark)
    IndexJob.buildIndex(spark, RefFixtures.pluginRules).cache()
  }

  private def ids(df: DataFrame): Seq[String] =
    df.select(concat(col("type"), lit(":"), col("key")))
      .collect().map(_.getString(0)).toSeq

  private def search(q: String, sort: Option[String] = None): DataFrame =
    SearchEngine.search(spark, index,
      Request(q = Some(q), sort = sort, tokenize = Tokenize.Porter))

  private val emails1 = "emails.db/emails:1"
  private val emails2 = "emails.db/emails:2"
  private val commitA = "github.db/commits:a5b39c5049b28997528bb0eca52730ab6febabeaba54cfcba0ab5d70e7207523"
  private val commitB = "github.db/commits:5becbf70d64951e2910314ef5227d19b11c25b0c9586934941366da8997e57cb"

  test("'' and ' ' → timeline of all 4 docs, newest first (test_plugin.py:119-124)") {
    val expected = Seq(commitB, emails2, emails1, commitA) // tie-break note above
    assert(ids(search("")) == expected)
    assert(ids(search(" ")) == expected)
  }

  test("q=things → 3 results (test_plugin.py facet fixture)") {
    assert(ids(search("things")).toSet == Set(emails1, emails2, commitA))
  }

  test("things NOT email → only the commit (test_plugin.py:125-131)") {
    assert(ids(search("things NOT email")) == Seq(commitA))
  }

  test("#dogfest → escape fallback hits emails:1 (test_plugin.py:132-135)") {
    assert(ids(search("#dogfest")) == Seq(emails1))
  }

  test("github-to-sqlite → escaped phrase misses → [] (test_plugin.py:136-139)") {
    assert(ids(search("github-to-sqlite")).isEmpty)
  }

  test("sort overrides with q=email (test_plugin.py:155-230)") {
    assert(ids(search("email", sort = Some("newest"))) == Seq(emails2, emails1))
    assert(ids(search("email", sort = Some("oldest"))) == Seq(emails1, emails2))
  }

  test("timeline oldest reverses (test_plugin.py timeline sort)") {
    assert(ids(SearchEngine.search(spark, index,
      Request(q = None, sort = Some("oldest")))) ==
      Seq(emails1, commitA, emails2, commitB)) // (type,key) tie-break again
  }

  test("term-partitioned postings/positions prune partitions end-to-end") {
    // driver-side bucket mirror must equal the write-side Column hash
    val terms = Seq("things", "email", "dogfest", "café", "x")
    val colBuckets = {
      import spark.implicits._
      terms.toDF("term")
        .select(col("term"), TextIndex.termBucketCol(col("term")).as("tb"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    terms.foreach(t => assert(TextIndex.termBucket(t) == colBuckets(t),
      s"driver/Column bucket mismatch for '$t'"))

    val toks = TextIndex.docTokens(index, Tokenize.Porter)
    val dir = java.nio.file.Files.createTempDirectory("graft-postings").toString
    TextIndex.writeTermPartitioned(TextIndex.postings(toks), s"$dir/postings")
    TextIndex.writeTermPartitioned(TextIndex.positions(toks), s"$dir/positions")
    val arts = SearchEngine.TextArtifacts(toks,
      spark.read.parquet(s"$dir/postings"),
      Some(spark.read.parquet(s"$dir/positions")))
    val memArts = SearchEngine.TextArtifacts(toks,
      TextIndex.postings(toks), Some(TextIndex.positions(toks)))

    // term + boolean + phrase paths: same results as in-memory postings,
    // and the scan carries a static tb partition filter
    for (q <- Seq("things", "things NOT email", "\"about things\"")) {
      val node = graft.text.FtsQuery.parseOrEscape(q, Tokenize.Porter).get
      val onDisk = SearchEngine.matchSet(arts, node)
      val plan = onDisk.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*tb[^\\]]*\\]".r.findFirstIn(plan).isDefined,
        s"'$q' should prune postings partitions, plan:\n$plan")
      assert(ids(onDisk.orderBy("type", "key")) ==
        ids(SearchEngine.matchSet(memArts, node).orderBy("type", "key")))
    }
    // BM25 over the partitioned layout matches the in-memory scores
    val scored = SearchEngine.bm25Scores(spark, arts.postings, toks, Seq("things"))
      .orderBy("type", "key").collect().map(r => (r.getString(0), r.getString(1),
        math.round(r.getDouble(2) * 1e4))).toSeq
    val memScored = SearchEngine.bm25Scores(spark, memArts.postings, toks, Seq("things"))
      .orderBy("type", "key").collect().map(r => (r.getString(0), r.getString(1),
        math.round(r.getDouble(2) * 1e4))).toSeq
    assert(scored == memScored)
  }

  test("facet counts over q=things (test_plugin.py:45-108)") {
    val toks = TextIndex.docTokens(index, Tokenize.Porter)
    val node = graft.text.FtsQuery.parseOrEscape("things", Tokenize.Porter).get
    val matched = toks.filter(SearchEngine.matchCondition(node))
      .select("type", "key").join(index, Seq("type", "key"))
    // type facet: emails 2, commits 1
    val typeFacet = matched.groupBy("type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typeFacet == Map("emails.db/emails" -> 2L, "github.db/commits" -> 1L))
    // is_public facet: 2 private, 1 public
    val pubFacet = matched.groupBy("is_public").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(pubFacet == Map(0 -> 2L, 1 -> 1L))
    // date facet: 2020-08-01 ×2, 2020-08-02 ×1
    val dateFacet = matched
      .groupBy(substring(col("timestamp"), 1, 10).as("d")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dateFacet == Map("2020-08-01" -> 2L, "2020-08-02" -> 1L))
  }

  test("filters compose with search (string-typed, loose: __init__.py:132-135)") {
    val r = SearchEngine.search(spark, index,
      Request(q = Some("things"), isPublic = Some("1"), tokenize = Tokenize.Porter))
    assert(ids(r) == Seq(commitA))
  }

  test("malformed filter values filter to empty, never raise (querystring contract)") {
    // the reference binds filters as SQLite parameters: 'banana' = 1 is
    // simply false, never an error — try_cast gives the same totality
    for (bad <- Seq("banana", "", "1.5.2")) {
      val r = SearchEngine.search(spark, index,
        Request(q = Some("things"), isPublic = Some(bad), tokenize = Tokenize.Porter))
      assert(r.count() == 0, s"is_public=$bad")
      val c = SearchEngine.search(spark, index,
        Request(q = None, category = Some(bad), tokenize = Tokenize.Porter))
      assert(c.count() == 0, s"category=$bad")
    }
  }

  test("search_2/search_3 are declared but never FTS-indexed (utils.py:89-90)") {
    import spark.implicits._
    val extra = graft.core.Schema.conform(
      Seq(("x/t", "9", "title here", "2020-08-03T00:00:00", "only_in_s2", "only_in_s3"))
        .toDF("type", "key", "title", "timestamp", "search_2", "search_3"))
    val idx2 = index.unionByName(extra)
    def hits(q: String) = ids(SearchEngine.search(spark, idx2,
      SearchEngine.Request(q = Some(q), tokenize = Tokenize.Porter)))
    assert(hits("only_in_s2").isEmpty && hits("only_in_s3").isEmpty)
    assert(hits("title here") == Seq("x/t:9")) // title IS indexed
  }

  test("-d database allowlist restricts the indexer (cli.py:27-32)") {
    RefFixtures.registerPlugin(spark)
    val only = graft.index.IndexJob.buildIndex(spark, RefFixtures.pluginRules,
      databases = Some(Set("emails.db")))
    assert(only.select("type").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("emails.db/emails"))
  }

  test("prefix and pure-OR queries resolve in the postings index — no token-array scan") {
    import graft.text.FtsQuery
    val toks = TextIndex.docTokens(index, Tokenize.Porter)
    val arts = SearchEngine.TextArtifacts(toks, TextIndex.postings(toks))
    def planOf(q: String): String = {
      val node = FtsQuery.parseOrEscape(q, Tokenize.Porter).get
      SearchEngine.matchSet(arts, node).queryExecution.optimizedPlan.toString
    }
    for (q <- Seq("thing*", "things OR email", "thing* OR email",
        "things NOT email", "title:thing*")) {
      val plan = planOf(q)
      assert(!plan.contains("array_contains") && !plan.contains("exists("),
        s"query `$q` still scans token arrays:\n$plan")
    }
    // results unchanged vs the exact array-scan predicate
    def setOf(q: String): Set[String] = {
      val node = FtsQuery.parseOrEscape(q, Tokenize.Porter).get
      SearchEngine.matchSet(arts, node)
        .collect().map(r => r.getString(0) + ":" + r.getString(1)).toSet
    }
    assert(setOf("thing*") == Set(emails1, emails2, commitA))
    assert(setOf("things OR tests") == Set(emails1, emails2, commitA, commitB))
    assert(setOf("things NOT email") == Set(commitA))
    assert(setOf("title:thing*").isEmpty) // 'things' only in bodies
  }

  test("phrases resolve via positional-postings adjacency joins when positions exist") {
    import graft.text.FtsQuery
    val toks = TextIndex.docTokens(index, Tokenize.Porter)
    val arts = SearchEngine.TextArtifacts(toks, TextIndex.postings(toks),
      Some(TextIndex.positions(toks)))
    def setOf(q: String): Set[String] = {
      val node = FtsQuery.parseOrEscape(q, Tokenize.Porter).get
      SearchEngine.matchSet(arts, node)
        .collect().map(r => r.getString(0) + ":" + r.getString(1)).toSet
    }
    assert(setOf("\"email about things\"") == Set(emails1, emails2))
    assert(setOf("\"about things\" NOT another") == Set(emails1))
    assert(setOf("\"things about\"").isEmpty) // order matters
    assert(setOf("title:\"hey there\"") == Set(emails1)) // field-restricted phrase
    assert(setOf("search_1:\"hey there\"").isEmpty)
    // the plan is pure postings algebra: no token-array predicate
    val node = FtsQuery.parseOrEscape("\"email about things\"", Tokenize.Porter).get
    val plan = SearchEngine.matchSet(arts, node).queryExecution.optimizedPlan.toString
    assert(!plan.contains("instr") && !plan.contains("array_contains"),
      s"positional phrase still scans token arrays:\n$plan")
  }

  test("multi-token phrases verify on a postings candidate set, not the corpus") {
    import graft.text.FtsQuery
    val toks = TextIndex.docTokens(index, Tokenize.Porter)
    val arts = SearchEngine.TextArtifacts(toks, TextIndex.postings(toks))
    val node = FtsQuery.parseOrEscape("\"email about things\"", Tokenize.Porter).get
    val ms = SearchEngine.matchSet(arts, node)
    assert(ms.collect().map(r => r.getString(0) + ":" + r.getString(1)).toSet ==
      Set(emails1, emails2))
    // the token-array filter must sit above a semi-join with the
    // candidate aggregation, i.e. the plan contains a LeftSemi
    assert(ms.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
  }

  test("group/NEAR/^ match sets: indexed path agrees with token-array fallback") {
    import graft.text.FtsQuery
    val toks = TextIndex.docTokens(index, Tokenize.Porter)
    val post = TextIndex.postings(toks)
    val posArts = SearchEngine.TextArtifacts(toks, post, Some(TextIndex.positions(toks)))
    val noPos = SearchEngine.TextArtifacts(toks, post)
    def setOf(arts: SearchEngine.TextArtifacts, q: String): Set[String] = {
      val node = FtsQuery.parseOrEscape(q, Tokenize.Porter).get
      SearchEngine.matchSet(arts, node)
        .collect().map(r => r.getString(0) + ":" + r.getString(1)).toSet
    }
    val queries = Seq(
      "(things OR dogfest) NOT another",
      "(email OR commit) things",
      "NEAR(email things, 3)",
      "NEAR(\"about things\" email, 2)",
      "^hey",
      "title:(hey OR another)")
    for (q <- queries)
      assert(setOf(posArts, q) == setOf(noPos, q),
        s"indexed vs fallback disagree for: $q")
    // pinned: ^hey anchors to emails:1's 'hey there...' title only
    assert(setOf(posArts, "^hey") == Set(emails1))
    // NEAR/^ indexed plans are pure postings algebra — no token-array
    // scanning. The fallback matchCondition's markers are `instr` (the
    // phrase fast path) and `sequence(` (phraseStartsCol's position
    // enumeration over token arrays); the r15 positional path runs
    // in-row HOFs (exists/array_contains) over doc-level POSITION
    // LISTS, which is the indexed form, so those are not banned.
    for (q <- Seq("NEAR(email things, 3)", "^hey")) {
      val node = FtsQuery.parseOrEscape(q, Tokenize.Porter).get
      val plan = SearchEngine.matchSet(posArts, node)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("instr") && !plan.contains("sequence("),
        s"$q still scans token arrays:\n$plan")
    }
  }

  test("BM25 ranks rarer term higher (relevance order)") {
    // 'dogfest' appears once; docs sort by score desc
    val scored = search("things").select("score").collect().map(_.getDouble(0))
    assert(scored.sameElements(scored.sorted(Ordering[Double].reverse)))
  }
}
