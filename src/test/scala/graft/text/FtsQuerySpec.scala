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
}
