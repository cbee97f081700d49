package graft

import graft.registry.PorterStemmer.stem
import org.scalatest.funsuite.AnyFunSuite

/** The published example pairs from Porter 1980 (each step's
  * illustration table), plus the FTS-relevant behaviors. These are
  * also Snowball-English agreement cases — the reference's `en_stem`
  * produces the same stems for all of them.
  */
class PorterStemmerSpec extends AnyFunSuite {

  private val pairs = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b (+ cleanup rules)
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc", "hesitanci" -> "hesit",
    "digitizer" -> "digit", "conformabli" -> "conform",
    "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl",
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
    "controll" -> "control", "roll" -> "roll",
    // FTS-relevant regulars
    "events" -> "event", "features" -> "featur", "feature" -> "featur",
    "running" -> "run", "normalization" -> "normal")

  test("Porter 1980 vocabulary pairs") {
    val bad = pairs.collect {
      case (in, want) if stem(in) != want => s"$in -> ${stem(in)} (want $want)"
    }
    assert(bad.isEmpty, s"${bad.size} mismatches:\n${bad.mkString("\n")}")
  }

  test("short tokens and already-stemmed words are fixed points") {
    Seq("f", "x", "ab", "run", "event").foreach(w =>
      assert(stem(stem(w)) == stem(w), s"$w not idempotent"))
  }
}
