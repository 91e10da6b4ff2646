package graft

import graft.functions.{LangId, TextSketch}
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {

  test("langid: script gates and latin profiles") {
    assert(LangId.detect("这是一个中文测试文本，包含很多中文字符。") == "zh")
    assert(LangId.detect("The quick brown fox is jumping over the lazy dog and the fence.") == "en")
    assert(LangId.detect("Der Hund ist nicht schnell und die Katze ist auch nicht da.") == "de")
    assert(LangId.detect("El perro es que corre con la casa y los árboles en la calle.") == "es")
    assert(LangId.detect("Le chat est sur la table avec les livres et une pomme, ça va.") == "fr")
    assert(LangId.detect("") == "und")
    assert(LangId.detect("12345 67890 !!!") == "und")
  }

  test("langid is deterministic") {
    val texts = Seq("The cat and the dog.", "Der der der und und.", "之乎者也")
    texts.foreach(t => assert(LangId.detect(t) == LangId.detect(t)))
  }

  test("fingerprints: stable, order-independent min-k, detects shared content") {
    val a = "the quick brown fox jumps over the lazy dog " * 10
    val b = "PREFIX CONTENT HERE " + a + " SUFFIX TAIL"
    val fa = TextSketch.fingerprints(a)
    val fb = TextSketch.fingerprints(b)
    assert(fa.nonEmpty && fa.length <= 8)
    assert(fa.toSeq == TextSketch.fingerprints(a).toSeq) // deterministic
    // winnowed fingerprints survive embedding in a larger doc
    assert(fa.toSet.intersect(fb.toSet).nonEmpty)
    // disjoint content shares nothing
    val fc = TextSketch.fingerprints("completely different material about ships and harbors " * 10)
    assert(fa.toSet.intersect(fc.toSet).isEmpty)
    // short docs get a single whole-text fingerprint
    assert(TextSketch.fingerprints("tiny").length == 1)
    assert(TextSketch.fingerprints("").isEmpty)
  }
}
