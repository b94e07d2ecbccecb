package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization for the full-text index.
  *
  * Two modes, mirroring the reference's tokenizer switch
  * (reference dogsheep_beta/cli.py:22-26: `porter` by default,
  * `--tokenize none` → SQLite unicode61):
  *
  *  - [[Tokenize.None_]]: lowercase + split on non-alphanumeric — the
  *    unicode61 contract restricted to the ASCII corpus; expressed as
  *    pure built-in column functions so it stays inside whole-stage
  *    codegen AND is bit-reproducible in the DuckDB oracle
  *    (`string_split_regex(lower(x), '[^a-z0-9]+')`).
  *  - [[Tokenize.Porter]]: the same split followed by Porter stemming —
  *    the stem step is a Scala UDF (indexing-time only).
  */
object Tokenize extends Enumeration {
  val None_, Porter, Unicode61, Ascii = Value

  /** Parse an FTS5-style tokenizer spec. The reference CLI passes the
    * `--tokenize` string straight into the FTS5 DDL (reference
    * cli.py:22-26), so any FTS5 spec is legal input: `porter`,
    * `porter unicode61`, `unicode61`, `unicode61 remove_diacritics 2`,
    * `none`, `ascii`. The leading tokenizer name selects the pipeline;
    * unknown names fail loudly — exactly when FTS5 would fail at
    * CREATE time.
    *
    * `--tokenize none` drops the porter wrapper and leaves FTS5's
    * DEFAULT tokenizer, which is unicode61 (reference cli.py:33-38 +
    * fts5 docs) — NOT the ASCII-split pipeline; [[None_]] is the
    * internal oracle-parity mode (ASCII corpora only) used by declared
    * queries, reachable only programmatically.
    */
  def parse(spec: String): Value =
    spec.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").head match {
      case "porter"    => Porter
      case "none"      => Unicode61
      case "ascii"     => Ascii
      case "unicode61" => Unicode61
      case other =>
        throw new IllegalArgumentException(s"unknown tokenizer: $other")
    }
}

object Tokenizer {

  /** ASCII split — the oracle-parity tokenizer (bit-identical to DuckDB
    * `string_split_regex(lower(x), '[^a-z0-9]+')`).
    */
  val splitPattern = "[^a-z0-9]+"

  /** Unicode61-faithful split for the Porter pipeline: any Unicode
    * letter/digit is a token character (SQLite unicode61 contract);
    * diacritics are folded before stemming (see [[foldDiacritics]]).
    */
  val unicodeSplitPattern = "[^\\p{L}\\p{N}]+"

  /** FTS5 `ascii` tokenizer split: separators are ASCII non-alnum ONLY
    * — every codepoint > 0x7F is a token character (fts5 docs), so
    * "café" stays one token with its 'é' intact.
    */
  val asciiSplitPattern = "[\\x00-\\x7F&&[^a-zA-Z0-9]]+"

  /** FTS5 `ascii` case folding: A-Z only; non-ASCII codepoints keep
    * their case (unlike `lower()`, which folds 'É' → 'é').
    */
  def asciiLower(t: String): String =
    t.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)

  /** Token array from a (possibly NULL) string column — codegen-friendly
    * built-ins only.
    */
  def tokensCol(c: Column): Column =
    filter(split(lower(coalesce(c, lit(""))), splitPattern), t => t =!= "")

  /** unicode61 `remove_diacritics` equivalent: NFD-decompose and strip
    * combining marks ("café" → "cafe").
    */
  def foldDiacritics(t: String): String =
    java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", "")

  // per-executor stem memo: corpus vocabularies are tiny relative to
  // token occurrences, so stemming each DISTINCT token once per JVM
  // removes the stemmer from the indexing hot loop (bounded to guard
  // against adversarial vocabularies)
  @transient private lazy val stemCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def cachedStem(t: String): String = {
    if (stemCache.size > 1000000) stemCache.clear()
    stemCache.computeIfAbsent(t, u => PorterStemmer.stem(foldDiacritics(u)))
  }

  /** Column-side tokenize pipeline. Porter/Unicode61/Ascii run the
    * fused codegen'd [[graft.functions.TokenPipe]] kernel (split +
    * per-token transform in one static call, no ScalaUDF converter
    * round-trip — r12 verdict item 6a); case folding for the porter /
    * fold modes stays Spark's own `lower` so fold semantics are
    * unchanged from the seq-UDF pipeline this replaced. Requires
    * [[graft.functions.TokenFunctions.register]] on the session (done
    * by Corpus.registerSources and the index entry points).
    */
  def tokens(c: Column, mode: Tokenize.Value): Column = mode match {
    case Tokenize.None_     => tokensCol(c)
    case Tokenize.Porter    =>
      graft.functions.TokenFunctions.token_pipe(
        lower(coalesce(c, lit(""))), graft.functions.TokenPipeImpl.Porter)
    case Tokenize.Unicode61 =>
      graft.functions.TokenFunctions.token_pipe(
        lower(coalesce(c, lit(""))), graft.functions.TokenPipeImpl.Fold)
    case Tokenize.Ascii     =>
      graft.functions.TokenFunctions.token_pipe(
        coalesce(c, lit("")), graft.functions.TokenPipeImpl.Ascii)
  }

  /** Driver-side tokenization of a query string — must agree exactly
    * with the column-side definition above.
    */
  def tokenize(s: String, mode: Tokenize.Value): Seq[String] = mode match {
    case Tokenize.None_ =>
      s.toLowerCase(java.util.Locale.ROOT)
        .split(splitPattern).filter(_.nonEmpty).toSeq
    case Tokenize.Porter =>
      s.toLowerCase(java.util.Locale.ROOT)
        .split(unicodeSplitPattern).filter(_.nonEmpty).toSeq
        .map(t => PorterStemmer.stem(foldDiacritics(t)))
    case Tokenize.Unicode61 =>
      s.toLowerCase(java.util.Locale.ROOT)
        .split(unicodeSplitPattern).filter(_.nonEmpty).toSeq
        .map(foldDiacritics)
    case Tokenize.Ascii =>
      s.split(asciiSplitPattern).filter(_.nonEmpty).toSeq.map(asciiLower)
  }
}
