package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases from Porter's 1980 paper plus the reference-proven
  * behavior (`running` → `run`: reference tests/test_cli.py:104-122).
  */
class PorterStemmerSpec extends AnyFunSuite {

  private val golden = Seq(
    // the case the reference proves end-to-end
    "running" -> "run",
    "run" -> "run",
    "chasing" -> "chase",
    // step 1
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc", "hesitanci" -> "hesit",
    "digitizer" -> "digit", "conformabli" -> "conform",
    "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr",
    "hopeful" -> "hope", "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt", "homologou" -> "homolog",
    "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll"
  )

  test("golden vocabulary from the published algorithm") {
    val bad = golden.collect {
      case (in, want) if PorterStemmer.stem(in) != want =>
        s"$in -> ${PorterStemmer.stem(in)} (want $want)"
    }
    assert(bad.isEmpty, s"mismatches: ${bad.mkString(", ")}")
  }

  test("total: never throws on arbitrary tokens") {
    // (Porter is deliberately NOT idempotent — e.g. agreed→agre→agr —
    // so totality, not fixpoint, is the property to hold.)
    val rnd = new scala.util.Random(42)
    (0 until 5000).foreach { _ =>
      val len = rnd.nextInt(15)
      val tok = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      PorterStemmer.stem(tok) // must not throw
    }
  }
}
