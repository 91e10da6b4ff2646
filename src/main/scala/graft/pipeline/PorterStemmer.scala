package graft.pipeline

/** The Porter stemming algorithm, implemented from the published
  * specification (M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3), 1980 — the ORIGINAL algorithm, not any library's
  * extension set). Needed by the METEOR stem-match stage (Metrics.meteor):
  * the reference scores METEOR via nltk (eval_ocr.py:90), whose stem
  * stage is exactly this algorithm.
  *
  * Pure, deterministic, allocation-light: operates on a char buffer.
  */
object PorterStemmer {

  // rule tables pre-sorted longest-suffix-first ONCE (stem() runs per
  // token in the METEOR alignment hot path; sorting constants per call
  // was measurable waste)
  private val Step2Rules: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    .sortBy(-_._1.length)
  private val Step3Rules: Seq[(String, String)] = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "").sortBy(-_._1.length)
  private val Step4Rules: Seq[(String, String)] = Seq("al", "ance", "ence",
    "er", "ic", "able", "ible", "ant", "ement", "ment", "ent", "ou", "ism",
    "ate", "iti", "ous", "ive", "ize").map(_ -> "").sortBy(-_._1.length)

  def stem(word: String): String = {
    if (word.length <= 2) return word.toLowerCase
    val b = word.toLowerCase.toCharArray
    var end = b.length // exclusive
    def isCons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => i == 0 || !isCons(i - 1)
      case _ => true
    }
    /** measure m of b[0, limit): [C](VC)^m[V] */
    def measure(limit: Int): Int = {
      var m = 0; var i = 0
      while (i < limit && isCons(i)) i += 1
      while (i < limit) {
        while (i < limit && !isCons(i)) i += 1
        if (i < limit) { m += 1; while (i < limit && isCons(i)) i += 1 }
      }
      m
    }
    def hasVowel(limit: Int): Boolean = (0 until limit).exists(!isCons(_))
    def endsWith(s: String): Boolean = {
      if (s.length > end) return false
      var i = 0
      while (i < s.length) {
        if (b(end - s.length + i) != s.charAt(i)) return false
        i += 1
      }
      true
    }
    def setTo(suffixLen: Int, repl: String): Unit = {
      var i = 0
      while (i < repl.length) { b(end - suffixLen + i) = repl.charAt(i); i += 1 }
      end = end - suffixLen + repl.length
    }
    def doubleCons: Boolean =
      end >= 2 && b(end - 1) == b(end - 2) && isCons(end - 1)
    /** *o: CVC where final C is not w, x, y */
    def cvc(at: Int): Boolean =
      at >= 2 && isCons(at) && !isCons(at - 1) && isCons(at - 2) &&
        b(at) != 'w' && b(at) != 'x' && b(at) != 'y'

    // ---- step 1a
    if (endsWith("sses")) setTo(4, "ss")
    else if (endsWith("ies")) setTo(3, "i")
    else if (endsWith("ss")) ()
    else if (endsWith("s")) setTo(1, "")

    // ---- step 1b
    var step1bFired = false
    if (endsWith("eed")) {
      if (measure(end - 3) > 0) setTo(3, "ee")
    } else if (endsWith("ed") && hasVowel(end - 2)) {
      setTo(2, ""); step1bFired = true
    } else if (endsWith("ing") && hasVowel(end - 3)) {
      setTo(3, ""); step1bFired = true
    }
    if (step1bFired) {
      if (endsWith("at")) setTo(2, "ate")
      else if (endsWith("bl")) setTo(2, "ble")
      else if (endsWith("iz")) setTo(2, "ize")
      else if (doubleCons && !endsWith("l") && !endsWith("s") && !endsWith("z")) end -= 1
      else if (measure(end) == 1 && cvc(end - 1)) setTo(0, "e")
    }

    // ---- step 1c
    if (endsWith("y") && hasVowel(end - 1)) setTo(1, "i")

    // Porter's rule-selection contract: within a step, the LONGEST
    // matching suffix is selected first and only then is its condition
    // tested; a failed condition ends the step (no fall-through to a
    // shorter suffix). Rule tables are pre-sorted at object init.
    def applyStep(rules: Seq[(String, String)], minM: Int): Unit = {
      rules.find { case (s, _) => endsWith(s) }.foreach {
        case (s, r) => if (measure(end - s.length) > minM - 1) setTo(s.length, r)
      }
    }

    // ---- step 2 (m > 0 over the stem before the suffix)
    applyStep(Step2Rules, minM = 1)

    // ---- step 3
    applyStep(Step3Rules, minM = 1)

    // ---- step 4 (m > 1; "ion" additionally requires *S or *T before it)
    if (endsWith("ion")) {
      if (measure(end - 3) > 1 && end >= 4 && (b(end - 4) == 's' || b(end - 4) == 't'))
        setTo(3, "")
    } else applyStep(Step4Rules, minM = 2)

    // ---- step 5a
    if (endsWith("e")) {
      val m = measure(end - 1)
      if (m > 1 || (m == 1 && !cvc(end - 2))) end -= 1
    }
    // ---- step 5b
    if (end >= 2 && b(end - 1) == 'l' && doubleCons && measure(end) > 1) end -= 1

    new String(b, 0, end)
  }
}
