package graft

import graft.pdf.{PdfTable, PdfWriter}
import org.scalatest.funsuite.AnyFunSuite

/** PDF layout-analysis table contract: y-row / x-column clustering, run
  * detection bounded by prose, the two-column-layout veto, ragged rows,
  * same-column joins, multiple tables per page, hostile bytes. */
class PdfTableSpec extends AnyFunSuite {

  private val X = Seq(72, 200, 330) // column anchors used throughout

  test("a grid between prose lines extracts with the first row as header") {
    val pdf = PdfWriter.makeCells(Seq(
      Seq(72 -> "Quarterly Report"),
      Seq(X(0) -> "Name", X(1) -> "Value"),
      Seq(X(0) -> "alpha", X(1) -> "1"),
      Seq(X(0) -> "beta", X(1) -> "2"),
      Seq(72 -> "Footnote text here.")))
    val ts = PdfTable.tables(pdf)
    assert(ts.length == 1)
    assert(ts.head.rows == Vector(
      Vector("Name", "Value"), Vector("alpha", "1"), Vector("beta", "2")))
    assert(ts.head.headerRows == 1)
    assert(ts.head.markdown ==
      "| Name | Value |\n| --- | --- |\n| alpha | 1 |\n| beta | 2 |")
  }

  test("ragged rows pad missing columns with empty cells") {
    val pdf = PdfWriter.makeCells(Seq(
      Seq(72 -> "title"),
      Seq(X(0) -> "a", X(1) -> "b", X(2) -> "c"),
      Seq(X(0) -> "d", X(2) -> "f"), // middle cell absent
      Seq(72 -> "after")))
    val ts = PdfTable.tables(pdf)
    assert(ts.length == 1)
    assert(ts.head.rows == Vector(
      Vector("a", "b", "c"), Vector("d", "", "f")))
  }

  test("cells within the x tolerance join with a space; slight drift shares a column") {
    val pdf = PdfWriter.makeCells(Seq(
      Seq(72 -> "title"),
      Seq(X(0) -> "k1", (X(0) + 30) -> "k2", X(1) -> "v"),
      Seq((X(0) + 10) -> "drifted", X(1) -> "w"),
      Seq(72 -> "after")))
    val ts = PdfTable.tables(pdf)
    assert(ts.length == 1)
    // anchors: 72, 102 (30 > 18 apart), 200; x=82 joins the 72 anchor
    assert(ts.head.rows == Vector(
      Vector("k1", "k2", "v"), Vector("drifted", "", "w")))
  }

  test("two tables separated by a prose row extract independently") {
    val pdf = PdfWriter.makeCells(Seq(
      Seq(X(0) -> "h1", X(1) -> "h2"),
      Seq(X(0) -> "a", X(1) -> "b"),
      Seq(72 -> "interlude prose"),
      Seq(X(0) -> "H1", X(1) -> "H2"),
      Seq(X(0) -> "c", X(1) -> "d")))
    val ts = PdfTable.tables(pdf)
    assert(ts.length == 2)
    assert(ts(0).rows == Vector(Vector("h1", "h2"), Vector("a", "b")))
    assert(ts(1).rows == Vector(Vector("H1", "H2"), Vector("c", "d")))
  }

  test("a full-page two-column LAYOUT is vetoed (reading order owns it)") {
    val left = (1 to 6).map(i => s"left prose line $i")
    val right = (1 to 6).map(i => s"right prose line $i")
    assert(PdfTable.tables(PdfWriter.makeTwoColumn(left, right)).isEmpty)
  }

  test("a short wide-gap two-column table inside prose is NOT vetoed") {
    val pdf = PdfWriter.makeCells(Seq(
      Seq(72 -> "prose one"),
      Seq(72 -> "prose two"),
      Seq(72 -> "prose three"),
      Seq(X(0) -> "k", X(2) -> "v"), // gap 258 ≥ gutter, but 2 of 7 rows
      Seq(X(0) -> "k2", X(2) -> "v2"),
      Seq(72 -> "prose four"),
      Seq(72 -> "prose five")))
    val ts = PdfTable.tables(pdf)
    assert(ts.length == 1)
    assert(ts.head.rows == Vector(Vector("k", "v"), Vector("k2", "v2")))
  }

  test("three aligned columns are never vetoed even when page-spanning") {
    val pdf = PdfWriter.makeCells((1 to 6).map(i =>
      Seq(X(0) -> s"a$i", X(1) -> s"b$i", X(2) -> s"c$i")))
    val ts = PdfTable.tables(pdf)
    assert(ts.length == 1)
    assert(ts.head.rows.length == 6)
    assert(ts.head.rows.head == Vector("a1", "b1", "c1"))
  }

  test("pipes in cells escape in the rendered markdown") {
    val pdf = PdfWriter.makeCells(Seq(
      Seq(72 -> "t"),
      Seq(X(0) -> "a|b", X(1) -> "c"),
      Seq(X(0) -> "d", X(1) -> "e"),
      Seq(72 -> "z")))
    val ts = PdfTable.tables(pdf)
    assert(ts.head.markdown.contains("| a\\|b | c |"))
  }

  test("non-PDF and hostile payloads yield no tables and never throw") {
    assert(PdfTable.tables("not a pdf".getBytes("UTF-8")).isEmpty)
    assert(PdfTable.tables(Array[Byte]()).isEmpty)
    val pdf = PdfWriter.makeCells(Seq(Seq(X(0) -> "a", X(1) -> "b"),
      Seq(X(0) -> "c", X(1) -> "d")))
    val truncated = pdf.take(pdf.length / 2)
    PdfTable.tables(truncated) // must not throw
  }
}
