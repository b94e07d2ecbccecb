package graft.index

import graft.TestSpark
import graft.text.Tokenize
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The derived-porter build (Corpus r7): on an ASCII corpus the porter
  * artifacts are DERIVED from the default-tokenizer artifacts (stem map
  * over token arrays / position terms) instead of re-tokenizing the
  * source. These specs pin the equivalence that makes the derivation
  * sound, and the non-ASCII gate that guards it.
  */
class TextIndexDeriveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // stem-rich ASCII rows: plurals, -ing/-ed/-ational forms, numerics,
  // punctuation-split tokens, NULL and empty fields
  private def asciiIndex: DataFrame =
    Seq(
      ("docs.db/documents", "1", "Running dogs Relational",
        "the caresses of several ponies were hopping happily"),
      ("docs.db/documents", "2", "conflated agreement",
        "traditional references: vietnamization, predication!"),
      ("docs.db/documents", "3", null.asInstanceOf[String], ""),
      ("events.db/events", "4", "plastered bled",
        "motoring, sing; 123 mixed42tokens")
    ).toDF("type", "key", "title", "search_1")
      .withColumn("timestamp",
        org.apache.spark.sql.functions.lit("2024-01-01 00:00:00"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("ASCII corpus: derived porter artifacts == direct porter build") {
    val direct = TextIndex.docTokens(asciiIndex, Tokenize.Porter)
    val derived = TextIndex.stemTokens(
      TextIndex.docTokens(asciiIndex, Tokenize.None_))
    assert(sortedRows(derived) == sortedRows(direct))

    val directPos = TextIndex.positions(direct)
    val derivedPos = TextIndex.stemPositions(
      TextIndex.positions(TextIndex.docTokens(asciiIndex, Tokenize.None_)))
    assert(sortedRows(derivedPos) == sortedRows(directPos))

    // and the tf postings roll up identically from either position set
    assert(sortedRows(TextIndex.postingsFromPositions(derivedPos))
      == sortedRows(TextIndex.postingsFromPositions(directPos)))
  }

  test("hasNonAscii gates the derivation") {
    assert(!TextIndex.hasNonAscii(asciiIndex))
    val accented = Seq(
      ("docs.db/documents", "1", "café society", "naïve résumé"))
      .toDF("type", "key", "title", "search_1")
    assert(TextIndex.hasNonAscii(accented))
    // NULL-only fields do not trip the gate (empty corpus is ASCII)
    val nulls = Seq(("t", "1", null.asInstanceOf[String],
      null.asInstanceOf[String])).toDF("type", "key", "title", "search_1")
    assert(!TextIndex.hasNonAscii(nulls))
  }

  test("non-ASCII text is exactly where derivation would diverge") {
    // "naïve" — unicode61+porter folds to one token "naiv";
    // the ASCII split breaks it at 'ï' into two tokens. The gate is
    // what keeps the derived path away from this case.
    val df = Seq(("t", "1", "naïve", null.asInstanceOf[String]))
      .toDF("type", "key", "title", "search_1")
      .withColumn("timestamp",
        org.apache.spark.sql.functions.lit("2024-01-01 00:00:00"))
    val porterToks = TextIndex.docTokens(df, Tokenize.Porter)
      .select($"tokens_title").as[Seq[String]].head()
    assert(porterToks == Seq("naiv"))
    val asciiSplit = TextIndex.docTokens(df, Tokenize.None_)
      .select($"tokens_title").as[Seq[String]].head()
    assert(asciiSplit == Seq("na", "ve"))
  }
}
