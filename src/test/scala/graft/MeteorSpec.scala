package graft

import graft.pipeline.{Metrics, PorterStemmer}
import org.scalatest.funsuite.AnyFunSuite

/** METEOR (A5) and its Porter-stemmer dependency, checked against the
  * published algorithm's own example vectors and hand-computed scores. */
class MeteorSpec extends AnyFunSuite {

  test("Porter stemmer, NLTK_EXTENSIONS mode (the METEOR default): nltk's extension vectors") {
    val vectors = Seq(
      // irregular-form pool
      "dying" -> "die", "lying" -> "lie", "tying" -> "tie",
      "skies" -> "sky", "sky" -> "sky", "news" -> "news",
      "innings" -> "inning", "proceed" -> "proceed", "succeed" -> "succeed",
      // length-4 ies/ied keep the e; longer words take the original path
      "dies" -> "die", "ties" -> "tie", "died" -> "die", "tied" -> "tie",
      "flies" -> "fli", "spied" -> "spi", "ponies" -> "poni",
      // revised step 1c: y->i only after a consonant, stem len > 1
      "happy" -> "happi", "enjoy" -> "enjoy", "cry" -> "cri",
      "say" -> "say", "by" -> "by",
      // unaffected mainline words stem identically in both modes
      "caresses" -> "caress", "generalizations" -> "gener",
      "motoring" -> "motor", "hopping" -> "hop", "relational" -> "relat")
    vectors.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"stem($in) = ${PorterStemmer.stem(in)}")
    }
    // the words the modes DISAGREE on, as documentation of the delta
    assert(PorterStemmer.stemOriginal("dying") == "dy")
    assert(PorterStemmer.stemOriginal("ties") == "ti")
    assert(PorterStemmer.stemOriginal("say") == "sai")
    assert(PorterStemmer.stemOriginal("news") == "new")
  }

  test("Porter stemmer, original 1980 mode: vectors from the published algorithm") {
    // FULL-pipeline expectations (all five steps run in sequence — the
    // paper's per-step example tables show intermediates, e.g. 1b gives
    // agreed->agree but step 5a then drops the e since m("agre")=1 and
    // "gre" is not CVC, so the algorithm's output is "agre"). Every
    // vector below was hand-traced through the published spec.
    val vectors = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing",
      "hopping" -> "hop", "falling" -> "fall", "hissing" -> "hiss",
      "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration",
      "valenci" -> "valenc", "digitizer" -> "digit",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "formaliti" -> "formal", "sensitiviti" -> "sensit",
      "triplicate" -> "triplic", "formative" -> "form",
      "electriciti" -> "electr", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      "allowance" -> "allow", "inference" -> "infer",
      "adjustable" -> "adjust", "replacement" -> "replac",
      "adoption" -> "adopt", "communism" -> "commun",
      "effective" -> "effect",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll",
      // multi-step composition (the paper's flagship example)
      "generalizations" -> "gener")
    vectors.foreach { case (in, want) =>
      assert(PorterStemmer.stemOriginal(in) == want, s"stemOriginal($in)")
    }
  }

  test("meteor: identity, reordering penalty, recall weighting") {
    def toks(s: String) = s.split(" ")
    // identity: m=4, chunks=1 -> 1 * (1 - 0.5*(1/4)^3) = 0.9921875
    assert(math.abs(Metrics.meteor(toks("a b c d"), toks("a b c d")) - 0.9921875) < 1e-12)
    // dropped word: ref 6 toks, hyp 5, chunks 2 (hand-computed)
    val s = Metrics.meteor(toks("the cat sat on the mat"), toks("the cat sat on mat"))
    assert(math.abs(s - 0.8203389830508474) < 1e-9, s.toString)
    // disjoint -> 0; empty -> 0
    assert(Metrics.meteor(toks("x y"), toks("p q")) == 0.0)
    assert(Metrics.meteor(Array.empty[String], toks("a")) == 0.0)
    // nltk preprocess=str.lower: case differences never break alignment
    assert(Metrics.meteor(toks("A b C d"), toks("a B c D")) ==
      Metrics.meteor(toks("a b c d"), toks("a b c d")))
  }

  test("meteor stem stage aligns inflection variants") {
    def toks(s: String) = s.split(" ")
    // 'stemming'/'stemmed' only match via Porter stems; both + 'works'
    // align -> m=2, chunks=1, P=R=1 -> 1 * (1 - 0.5*(1/2)^3) = 0.9375
    val s = Metrics.meteor(toks("stemming works"), toks("stemmed works"))
    assert(math.abs(s - 0.9375) < 1e-12, s.toString)
    // without the stem stage this would be the works-only alignment:
    // m=1 of 2/2 -> strictly lower
    assert(s > Metrics.meteor(toks("running works"), toks("jogged works")))
  }

  test("perDoc carries meteor alongside the other metrics") {
    val m = Metrics.perDoc("alpha beta gamma delta", "alpha beta gamma delta")
    assert(m.contains("meteor") && m("meteor") > 0.99)
    assert(m("bleu") == 1.0)
  }
}
