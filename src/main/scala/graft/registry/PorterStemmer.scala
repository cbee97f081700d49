package graft.registry

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for
  * suffix stripping", Program 14(3), 1980 — the public-domain
  * definition). Used by the registry's FTS tokenizer so inflected
  * query terms match their stems, mirroring the reference index's
  * `en_stem` tokenizer (fts.rs:94-96). The reference stems with
  * Snowball English ("Porter2"); the two agree on regular English
  * inflections (plurals, -ing, -ed, -ness, -ation…) and differ only
  * on exotic forms — the parity spec pins agreement cases.
  *
  * Implementation notes: within each step the LONGEST matching suffix
  * is selected and its condition tested; a failed condition does NOT
  * fall through to shorter suffixes of the same step (the published
  * behavior — e.g. "rational" keeps its "ational" because the r-stem
  * has measure 0, even though "tional" would also match).
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word
    w = step1a(w); w = step1b(w); w = step1c(w)
    w = step2(w); w = step3(w); w = step4(w); w = step5(w)
    w
  }

  private def isConsonant(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isConsonant(w, i - 1)
    case _ => true
  }

  /** The measure m: number of VC sequences in `[C](VC)^m[V]`. */
  private def measure(stem: String): Int = {
    var m = 0; var i = 0
    val n = stem.length
    while (i < n && isConsonant(stem, i)) i += 1
    while (i < n) {
      while (i < n && !isConsonant(stem, i)) i += 1
      if (i < n) { m += 1; while (i < n && isConsonant(stem, i)) i += 1 }
    }
    m
  }

  private def containsVowel(stem: String): Boolean =
    stem.indices.exists(i => !isConsonant(stem, i))

  private def endsDoubleC(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isConsonant(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x, or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && isConsonant(w, n - 3) && !isConsonant(w, n - 2) &&
      isConsonant(w, n - 1) && !"wxy".contains(w.charAt(n - 1))
  }

  /** Longest-suffix rule application: first (suffix, replacement) whose
    * suffix matches decides; apply iff `cond(stem)`. Rules must be
    * listed longest-suffix-first.
    */
  private def applyRules(w: String, rules: Seq[(String, String)],
      cond: String => Boolean): String =
    rules.find { case (suf, _) => w.endsWith(suf) && w.length > suf.length } match {
      case Some((suf, rep)) =>
        val stem = w.dropRight(suf.length)
        if (cond(stem)) stem + rep else w
      case None => w
    }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s") && w.length > 1) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      val stem = w.dropRight(3)
      return if (measure(stem) > 0) w.dropRight(1) else w
    }
    val stripped =
      if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
      else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
      else None
    stripped match {
      case None => w
      case Some(s) =>
        if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
        else if (endsDoubleC(s) && !"lsz".contains(s.charAt(s.length - 1)))
          s.dropRight(1)
        else if (measure(s) == 1 && endsCvc(s)) s + "e"
        else s
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1)))
      w.dropRight(1) + "i"
    else w

  private val Step2Rules = Seq(
    "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "biliti" -> "ble",
    "tional" -> "tion", "entli" -> "ent", "ousli" -> "ous",
    "ation" -> "ate", "alism" -> "al", "aliti" -> "al",
    "iviti" -> "ive", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "ator" -> "ate", "eli" -> "e").sortBy(-_._1.length)

  private def step2(w: String): String =
    applyRules(w, Step2Rules, measure(_) > 0)

  private val Step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al",
    "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
    .sortBy(-_._1.length)

  private def step3(w: String): String =
    applyRules(w, Step3Rules, measure(_) > 0)

  private val Step4Plain = Seq(
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "al", "er", "ic", "ou").sortBy(-_.length)

  private def step4(w: String): String =
    // "ion" carries the extra *S-or-*T condition; no other step-4
    // suffix ends in "ion", so it is its own longest-match branch
    if (w.endsWith("ion")) {
      val stem = w.dropRight(3)
      if (measure(stem) > 1 &&
          (stem.endsWith("s") || stem.endsWith("t"))) stem else w
    } else
      applyRules(w, Step4Plain.map(_ -> ""), measure(_) > 1)

  private def step5(w: String): String = {
    // 5a
    val a = if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else w
    } else w
    // 5b
    if (measure(a) > 1 && endsDoubleC(a) && a.endsWith("ll")) a.dropRight(1)
    else a
  }
}
