package graft.text

/** Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", 1980) — the published algorithm implemented directly in
  * Scala. The reference engine gets this behavior from SQLite FTS5's
  * `porter` tokenizer (reference dogsheep_beta/utils.py:90, default per
  * cli.py:22-26); proven semantics: query `run` matches a document
  * containing `running` iff porter is enabled
  * (reference tests/test_cli.py:104-122).
  *
  * Pure function String => String over lowercase ASCII tokens; used from
  * a Spark UDF in [[TextIndex]] (indexing-time only — never in a
  * per-query hot path at scale, so UDF overhead is acceptable; the
  * query side stems only the handful of query terms on the driver).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word
    w = step1a(w)
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5a(w)
    w = step5b(w)
    w
  }

  private def isVowelAt(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(w, i - 1)
    case _ => false
  }

  /** Porter's measure m: number of VC sequences in the stem. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && !isVowelAt(w, i)) i += 1 // leading C*
    while (i < n) {
      while (i < n && isVowelAt(w, i)) i += 1 // V+
      if (i < n) { m += 1; while (i < n && !isVowelAt(w, i)) i += 1 } // C+
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    w.indices.exists(isVowelAt(w, _))

  private def endsDoubleC(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      !isVowelAt(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    if (n < 3) return false
    val c = w.charAt(n - 1)
    !isVowelAt(w, n - 3) && isVowelAt(w, n - 2) && !isVowelAt(w, n - 1) &&
      c != 'w' && c != 'x' && c != 'y'
  }

  private def replaceSuffix(w: String, suffix: String, repl: String,
      minMeasure: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.substring(0, w.length - suffix.length)
      if (measure(stem) > minMeasure) Some(stem + repl) else Some(w)
    } else None

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      val stem = w.dropRight(3)
      if (measure(stem) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleC(s) && !s.endsWith("l") && !s.endsWith("s") && !s.endsWith("z"))
            s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i"
    else w

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private def step2(w: String): String =
    step2Rules.collectFirst {
      case (s, r) if w.endsWith(s) => replaceSuffix(w, s, r, 0).get
    }.getOrElse(w)

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def step3(w: String): String =
    step3Rules.collectFirst {
      case (s, r) if w.endsWith(s) => replaceSuffix(w, s, r, 0).get
    }.getOrElse(w)

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(w: String): String =
    step4Suffixes.collectFirst {
      case s if w.endsWith(s) =>
        val stem = w.substring(0, w.length - s.length)
        val ok =
          if (s == "ion") measure(stem) > 1 &&
            (stem.endsWith("s") || stem.endsWith("t"))
          else measure(stem) > 1
        if (ok) stem else w
    }.getOrElse(w)

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else w
    } else w

  private def step5b(w: String): String =
    if (w.endsWith("ll") && measure(w.dropRight(1)) > 1) w.dropRight(1) else w
}
