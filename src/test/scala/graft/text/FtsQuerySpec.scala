package graft.text

import graft.text.FtsQuery._
import org.scalatest.funsuite.AnyFunSuite

/** Query-language parsing: the FTS5 subset + escape fallback the
  * reference exercises (reference tests/test_plugin.py:119-152).
  */
class FtsQuerySpec extends AnyFunSuite {
  private val M = Tokenize.None_

  test("implicit AND of bare terms") {
    assert(parse("urgent building", M) == And(Seq(Term("urgent"), Term("building"))))
  }

  test("explicit AND / OR precedence: NOT > AND > OR") {
    assert(parse("a b OR c", M) ==
      Or(Seq(And(Seq(Term("a"), Term("b"))), Term("c"))))
    assert(parse("a NOT b c", M) ==
      And(Seq(Not(Term("a"), Term("b")), Term("c"))))
  }

  test("quoted phrase and prefix") {
    assert(parse("\"slow fast\" x*", M) ==
      And(Seq(Phrase(Seq("slow", "fast")), Prefix("x"))))
  }

  test("terms are tokenized per index mode (porter stems query terms)") {
    assert(parse("orders", Tokenize.Porter) == Term("order"))
    assert(parse("running", Tokenize.Porter) == Term("run"))
  }

  test("porter pipeline is unicode61-faithful: letters kept, diacritics folded") {
    assert(Tokenizer.tokenize("Café RUNNING", Tokenize.Porter) == Seq("cafe", "run"))
    // the ASCII oracle tokenizer deliberately splits at the accent
    assert(Tokenizer.tokenize("Café", Tokenize.None_) == Seq("caf"))
  }

  test("invalid tokens are FTS syntax errors (matching FTS5)") {
    intercept[FtsParseError](parse("#dogfest", M))
    intercept[FtsParseError](parse("github-to-sqlite", M))
    intercept[FtsParseError](parse("NOT alone", M))
  }

  test("FTS5 bareword set: underscore + non-ASCII parse natively (no fallback)") {
    // `café NOT foo` must parse as a native NOT, not literalize 'NOT'
    // through the escape fallback (ADVICE r2)
    assert(parse("café NOT foo", Tokenize.Porter) ==
      Not(Term("cafe"), Term("foo")))
    // underscore is a bareword char in FTS5; none-mode tokenization
    // then splits it into a contiguous phrase
    assert(parse("snake_case", M) == Phrase(Seq("snake", "case")))
    // widened prefix tokens fold like indexed tokens
    assert(parse("café*", Tokenize.Porter) == Prefix("cafe"))
    // ASCII symbols stay syntax errors → escape fallback still fires
    intercept[FtsParseError](parse("c@fé", M))
  }

  test("column filters: col:term / col:\"phrase\"; unknown column = syntax error") {
    assert(parse("title:foo", M) == Field("title", Term("foo")))
    assert(parse("search_1:\"a b\" x", M) ==
      And(Seq(Field("search_1", Phrase(Seq("a", "b"))), Term("x"))))
    intercept[FtsParseError](parse("nosuchcol:foo", M))
    // unknown column falls back to escaped literal phrase, like FTS5 + escape
    assert(parseOrEscape("nosuchcol:foo", M) ==
      Some(Phrase(Seq("nosuchcol", "foo"))))
  }

  test("escape fallback: every whitespace token becomes a literal phrase") {
    // reference __init__.py:141-145 + escape_fts; proven cases:
    // `#dogfest` matches docs with token `dogfest`
    assert(parseOrEscape("#dogfest", M) == Some(Phrase(Seq("dogfest"))))
    // `github-to-sqlite` becomes a 3-token contiguous phrase
    assert(parseOrEscape("github-to-sqlite", M) ==
      Some(Phrase(Seq("github", "to", "sqlite"))))
  }

  test("blank-query normalize (reference tests/test_plugin.py:122-124)") {
    assert(parseOrEscape("", M).isEmpty)
    assert(parseOrEscape("   ", M).isEmpty)
    assert(parseOrEscape("#!$% @@", M).isEmpty) // nothing tokenizes
  }

  test("escape fallback is total: arbitrary garbage never throws") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab\"*-#() ANDORNOT\t'%$"
    (0 until 2000).foreach { _ =>
      val s = (0 until rnd.nextInt(20)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
      parseOrEscape(s, M) // must not throw
    }
  }

  test("positive terms exclude NOT operands (BM25 scoring set)") {
    assert(positiveTerms(parse("a b NOT c OR \"d e\"", M)) ==
      Seq("a", "b", "d", "e"))
  }

  // ---- r7: parenthesized grouping, NEAR, ^ (VERDICT r6 item 2) -------

  test("parens group subexpressions; juxtaposition ANDs the group") {
    assert(parse("(a OR b) c", M) ==
      And(Seq(Or(Seq(Term("a"), Term("b"))), Term("c"))))
    assert(parse("a OR (b c)", M) ==
      Or(Seq(Term("a"), And(Seq(Term("b"), Term("c"))))))
    // explicit AND next to a group — the FTS5-proper spelling
    assert(parse("(a OR b) AND c", M) == parse("(a OR b) c", M))
    // NOT over a group; nested groups
    assert(parse("a NOT (b OR c)", M) ==
      Not(Term("a"), Or(Seq(Term("b"), Term("c")))))
    assert(parse("((a))", M) == Term("a"))
    // unbalanced parens are syntax errors → escape fallback
    intercept[FtsParseError](parse("(a OR b", M))
    intercept[FtsParseError](parse("a)", M))
    intercept[FtsParseError](parse("()", M))
  }

  test("column filter applies to a whole group: col:(a OR b)") {
    assert(parse("title:(a OR b)", M) ==
      Field("title", Or(Seq(Term("a"), Term("b")))))
  }

  test("NEAR: phrases + optional distance, default 10") {
    assert(parse("NEAR(a b)", M) ==
      Near(Seq(Seq("a"), Seq("b")), NearDefault))
    assert(parse("NEAR(a \"b c\", 5)", M) ==
      Near(Seq(Seq("a"), Seq("b", "c")), 5))
    // NEAR is only special immediately before '(' — else a plain term
    assert(parse("NEAR", M) == Term("near"))
    assert(parse("near (a)", M) == And(Seq(Term("near"), Term("a"))))
    intercept[FtsParseError](parse("NEAR()", M))
    intercept[FtsParseError](parse("NEAR(a, x)", M))
    intercept[FtsParseError](parse("NEAR(a b", M))
  }

  test("NEAR matching: <= N tokens between, per single field (FTS5-pinned)") {
    val doc = "f 1 urgent order for building customer c91".split(" ").toIndexedSeq
    def near(q: String) = matches(parse(q, M), IndexedSeq.empty, doc)
    // urgent@2..2, building@5..5: 2 tokens between (order, for)
    assert(near("NEAR(urgent building, 3)"))
    assert(near("NEAR(urgent building, 2)"))
    assert(!near("NEAR(urgent building, 1)"))
    // order matters not: same distance either way
    assert(near("NEAR(building urgent, 2)"))
    assert(!near("NEAR(building urgent, 1)"))
    // phrase member: "order for"@3..4, building@5..5: 0 tokens between
    assert(near("NEAR(\"order for\" building, 0)"))
    // all phrases must be in ONE field — split across fields is no match
    assert(!matches(parse("NEAR(x y, 10)", M),
      IndexedSeq("x"), IndexedSeq("y")))
    // overlapping instances: negative gap always matches
    assert(matches(parse("NEAR(\"a b\" \"b c\", 0)", M),
      IndexedSeq("a", "b", "c"), IndexedSeq.empty))
  }

  test("^ anchors the phrase to the field's first token") {
    assert(parse("^view", M) == First(Seq("view")))
    assert(parse("^\"order 10\"", M) == First(Seq("order", "10")))
    assert(parse("a ^b", M) == And(Seq(Term("a"), First(Seq("b")))))
    val t = IndexedSeq("view", "by", "user")
    assert(matches(parse("^view", M), t, IndexedSeq.empty))
    assert(matches(parse("^view", M), IndexedSeq.empty, t)) // either field
    assert(!matches(parse("^by", M), t, IndexedSeq.empty))
    // mid-word caret is a syntax error → escape fallback literalizes
    intercept[FtsParseError](parse("a^b", M))
    assert(parseOrEscape("a^b", M) == Some(Phrase(Seq("a", "b"))))
  }

  test("col:^anchor and prefix anchors in NEAR / ^ (r7 close-out)") {
    // col:^term — field-restricted first-token anchor
    assert(parse("title:^view", M) == Field("title", First(Seq("view"))))
    assert(parse("title:^\"order 10\"", M) ==
      Field("title", First(Seq("order", "10"))))
    // prefix anchors: a starred token means starts-with
    assert(parse("NEAR(urg* customer, 5)", M) ==
      Near(Seq(Seq("urg*"), Seq("customer")), 5))
    assert(parse("^ord*", M) == First(Seq("ord*")))
    // prefix anchors are folded, never stemmed
    assert(parse("NEAR(runn* x)", Tokenize.Porter) ==
      Near(Seq(Seq("runn*"), Seq("x")), NearDefault))
    // matching: starred token is a starts-with match
    // (urg*@2, customer@6: 3 tokens between)
    val doc = "f 1 urgent order for building customer".split(" ").toIndexedSeq
    assert(matches(parse("NEAR(urg* customer, 4)", M), IndexedSeq.empty, doc))
    assert(matches(parse("NEAR(urg* customer, 3)", M), IndexedSeq.empty, doc))
    assert(!matches(parse("NEAR(urg* customer, 2)", M), IndexedSeq.empty, doc))
    assert(matches(parse("^f NEAR(ord* building, 2)", M), IndexedSeq.empty, doc))
    // starred tokens stay out of the BM25 positive-term set
    assert(positiveTerms(parse("NEAR(urg* customer) ^ord*", M)) ==
      Seq("customer"))
  }

  test("phrase-prefix: \"a b\"* stars the LAST token; 1-token form IS a prefix") {
    assert(parse("\"beta gam\"*", M) == Phrase(Seq("beta", "gam*")))
    assert(parse("\"gam\"*", M) == Prefix("gam"))
    // porter mode: interior tokens stem, the starred last token folds
    // but is NOT stemmed (the Prefix contract)
    assert(parse("\"running build\"*", Tokenize.Porter) ==
      Phrase(Seq("run", "build*")))
  }

  test("colsets: {a b}, negation, whitespace colon (pinned vs SQLite FTS5)") {
    // schema-complete set unwraps; singleton keeps Field; negation
    // resolves to the complement at parse time; empty set matches nothing
    assert(parse("{title search_1}: x", M) == Term("x"))
    assert(parse("{title}: x", M) == Field("title", Term("x")))
    assert(parse("{title title}: x", M) == Field("title", Term("x")))
    assert(parse("-title: x", M) == Field("search_1", Term("x")))
    assert(parse("-{search_1}: x", M) == Field("title", Term("x")))
    assert(parse("-{title search_1}: x", M) == Not(Term("x"), Term("x")))
    assert(parse("title : x", M) == Field("title", Term("x")))
    assert(parse("title: (a OR b)", M) ==
      Field("title", Or(Seq(Term("a"), Term("b")))))
    assert(parse("title: NEAR(a b, 2)", M) ==
      Field("title", Near(Seq(Seq("a"), Seq("b")), 2)))
    // colset binds the NEXT unit only (FTS5-pinned): `title: beta zeta`
    // restricts beta alone
    assert(parse("title: beta zeta", M) ==
      And(Seq(Field("title", Term("beta")), Term("zeta"))))
    intercept[FtsParseError](parse("{bogus}: x", M))
    intercept[FtsParseError](parse("{}: x", M))
    intercept[FtsParseError](parse("title:", M))
    intercept[FtsParseError](parse("12:30", M))
    intercept[FtsParseError](parse("- x", M))
    intercept[FtsParseError](parse("NEAR(title:beta gamma, 1)", M))
    intercept[FtsParseError](parse("^title:beta", M))
  }

  test("matches(): golden parity with SQLite FTS5 on the probe corpus") {
    // goldens produced by running these exact queries through SQLite
    // FTS5 (fts5 table (title, body); body plays search_1)
    val docs = Seq(
      (IndexedSeq("alpha", "beta", "gamma"), IndexedSeq("delta", "epsilon", "zeta")),
      (IndexedSeq("beta", "gamma", "delta"), IndexedSeq("alpha", "nu", "xi")),
      (IndexedSeq("gamma", "delta", "beta"), IndexedSeq("epsilon", "alpha", "beta")))
    def ids(q: String): Seq[Int] = {
      val n = parse(q.replace("body", "search_1"), M)
      docs.zipWithIndex.collect {
        case ((t, s1), i) if matches(n, t, s1) => i + 1
      }
    }
    assert(ids("\"beta gam\"*") == Seq(1, 2))
    assert(ids("\"alpha beta\"*") == Seq(1, 3))
    assert(ids("{title body}: alpha") == Seq(1, 2, 3))
    assert(ids("-title: alpha") == Seq(2, 3))
    assert(ids("title : beta") == Seq(1, 2, 3))
    assert(ids("-body: beta") == Seq(1, 2, 3))
    assert(ids("{body}: \"alpha beta\"") == Seq(3))
    assert(ids("title: (beta OR delta)") == Seq(1, 2, 3))
    assert(ids("-title: (alpha OR nu)") == Seq(2, 3))
    assert(ids("NEAR(\"bet\"* gamma, 1)") == Seq(1, 2, 3))
    assert(ids("^\"alpha bet\"*") == Seq(1))
    assert(ids("title: NEAR(beta gamma, 1)") == Seq(1, 2, 3))
    assert(ids("-{title body}: alpha") == Seq.empty)
    assert(ids("\"gamma delta\"* beta") == Seq(2, 3))
  }

  test("group/NEAR/^ queries still fall back safely when malformed") {
    assert(parseOrEscape("(((", M).isEmpty)
    assert(parseOrEscape("NEAR(a b", M) ==
      Some(And(Seq(Phrase(Seq("near", "a")), Phrase(Seq("b"))))))
    assert(positiveTerms(parse("NEAR(a \"b c\") ^d", M)) ==
      Seq("a", "b", "c", "d"))
  }
}
