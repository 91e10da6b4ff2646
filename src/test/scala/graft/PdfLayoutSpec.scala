package graft

import graft.pdf.{PdfLine, PdfParser, PdfWriter}
import org.scalatest.funsuite.AnyFunSuite

/** Column-aware PDF reading order (SURVEY.md §7 hard-part (c) v2): the
  * parser tracks positions through the line matrix and restores
  * top-down-per-column order when x-starts are bimodal, while
  * single-column pages keep exact document order (golden byte-identity
  * for the existing fixture corpus is unchanged). */
class PdfLayoutSpec extends AnyFunSuite {

  test("two-column page written in interleaved row order reads column-wise") {
    val left = Seq("left one", "left two", "left three", "left four")
    val right = Seq("right one", "right two", "right three")
    val pdf = PdfWriter.makeTwoColumn(left, right)
    assert(PdfParser.extractText(pdf) == (left ++ right).mkString("\n"))
  }

  test("three columns split recursively, left to right") {
    val c1 = Seq("a1", "a2", "a3")
    val c2 = Seq("b1", "b2", "b3")
    val c3 = Seq("c1", "c2", "c3")
    val b = new StringBuilder("BT\n/F1 12 Tf\n")
    (0 until 3).foreach { r =>
      val y = 720 - 14 * r
      b.append(s"1 0 0 1 50 $y Tm\n(${c1(r)}) Tj\n")
      b.append(s"1 0 0 1 260 $y Tm\n(${c2(r)}) Tj\n")
      b.append(s"1 0 0 1 470 $y Tm\n(${c3(r)}) Tj\n")
    }
    b.append("ET\n")
    val pdf = PdfWriter.makeWithContent(b.toString)
    assert(PdfParser.extractText(pdf) == (c1 ++ c2 ++ c3).mkString("\n"))
  }

  test("centered headings / offset blocks are not columns") {
    // single-column body at x=72 with long lines + 3 centered headings at
    // x=216: bimodal x with a 144pt gap, but (a) the heading side holds
    // <25% of lines and (b) body lines visibly cross the heading x —
    // both vetoes must keep document order
    val b = new StringBuilder("BT\n/F1 12 Tf\n")
    val doc = scala.collection.mutable.ArrayBuffer.empty[String]
    var y = 720
    (0 until 3).foreach { sec =>
      val h = s"Heading $sec"
      b.append(s"1 0 0 1 216 $y Tm\n($h) Tj\n"); doc += h; y -= 14
      (0 until 5).foreach { i =>
        val l = s"body line $sec-$i with plenty of words stretching across the full page width"
        b.append(s"1 0 0 1 72 $y Tm\n($l) Tj\n"); doc += l; y -= 14
      }
    }
    b.append("ET\n")
    val pdf = PdfWriter.makeWithContent(b.toString)
    assert(PdfParser.extractText(pdf) == doc.mkString("\n"))
  }

  test("paragraph indents are not columns: document order preserved") {
    // alternating x 72 / 90 (indent, far below the 72pt gutter threshold)
    val lines = (0 until 8).map(i => s"line number $i")
    val b = new StringBuilder("BT\n/F1 12 Tf\n")
    lines.zipWithIndex.foreach { case (l, i) =>
      val x = if (i % 2 == 0) 72 else 90
      b.append(s"1 0 0 1 $x ${720 - 14 * i} Tm\n($l) Tj\n")
    }
    b.append("ET\n")
    val pdf = PdfWriter.makeWithContent(b.toString)
    assert(PdfParser.extractText(pdf) == lines.mkString("\n"))
  }

  test("single-column fixture output is unchanged by position tracking") {
    val lines = Seq("alpha bravo", "charlie delta", "echo foxtrot",
      "golf hotel india juliet", "kilo lima")
    // the classic fixture writer (Td/TD/T*/TJ mix, one x position)
    assert(PdfParser.extractText(PdfWriter.make(lines)) == lines.mkString("\n"))
  }

  test("line-matrix bookkeeping: Tm absolute, Td relative, T* leading") {
    val content =
      "BT\n/F1 12 Tf\n14 TL\n1 0 0 1 100 700 Tm\n(p1) Tj\n" +
        "10 -14 Td\n(p2) Tj\nT*\n(p3) Tj\nET\n"
    val out = new scala.collection.mutable.ArrayBuffer[PdfLine]
    PdfParser.parseContent(content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), out)
    assert(out.toSeq == Seq(
      PdfLine(100.0, 700.0, "p1"),
      PdfLine(110.0, 686.0, "p2"),
      PdfLine(110.0, 672.0, "p3")))
  }

  test("multiple content streams (pages) order columns independently") {
    // page 1: two-column interleaved; page 2: single column — the column
    // decision is per stream, so page 2 stays in document order even
    // though page 1 reorders
    val p1 = PdfWriter.contentStreamTwoColumn(
      Seq("p1 l1", "p1 l2", "p1 l3"), Seq("p1 r1", "p1 r2", "p1 r3"))
    val p2 = "BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm\n(p2 a) Tj\n0 -14 Td\n(p2 b) Tj\nET\n"
    // hand-rolled two-page body: reuse the writer's framing per stream
    val pdf1 = PdfWriter.makeWithContent(p1)
    val pdf2 = PdfWriter.makeWithContent(p2)
    // concatenated documents parse as consecutive streams (findStreams
    // scans byte-wise) — equivalent to a two-page /Kids array for the
    // text path
    val both = pdf1 ++ pdf2
    assert(PdfParser.extractText(both) ==
      Seq("p1 l1", "p1 l2", "p1 l3", "p1 r1", "p1 r2", "p1 r3", "p2 a", "p2 b").mkString("\n"))
  }

  test("hostile numeric forms never throw, text still extracted") {
    val content = "BT\n1e5 - . +. --3 Tm\n(ok text) Tj\nET\n"
    val out = new scala.collection.mutable.ArrayBuffer[PdfLine]
    PdfParser.parseContent(content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), out)
    assert(out.map(_.text).toSeq == Seq("ok text"))
  }
}
