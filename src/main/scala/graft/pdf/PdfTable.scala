package graft.pdf

import graft.extract.TableMd
import scala.collection.mutable.ArrayBuffer

/** PDF table extraction via layout analysis — the binary-payload half of
  * the reference's formatted-table output (GOT-OCR2.0's format mode emits
  * markdown tables from document images, GOT/demo/run_ocr_2.0.py OCR-format
  * path; our PDF analog recovers the table from the content stream's text
  * POSITIONS instead of pixels, the classic pdftotext-layout approach).
  *
  * Semantics, all deterministic:
  *  - positioned lines come from the real [[PdfParser]] (every Tm/Td/TD/T*
  *    starts a line; show ops carry the (x,y) of the line's first glyph);
  *  - rows: lines cluster by y descending — a line within [[YTolPts]] of
  *    the row's anchor (its top line) joins the row; visual rows in PDFs
  *    share a baseline, paragraphs step a full leading (≥ ~12pt);
  *  - a TABLE is a maximal run of ≥2 consecutive rows each holding ≥2
  *    cells (single-cell rows — titles, prose — bound the run);
  *  - columns: cell x-starts cluster greedily left-to-right — a cell
  *    within [[XTolPts]] of its cluster's anchor joins it (generators
  *    left-align table columns; 18pt ≈ 3 glyphs of drift allowed). Cells
  *    landing in the same (row, column) join with a space in x order;
  *    missing cells render empty;
  *  - the LAYOUT veto: a two-anchor block that passes the page's
  *    column-gutter test ([[PdfParser.gutterX]] — gap ≥ 72pt, both sides
  *    ≥3 lines and ≥25% of the block, no line crosses the gutter) AND
  *    spans ≥80% of the page's visual rows is a two-column page layout,
  *    not a table; reading order owns it (a layout DOMINATES its page —
  *    a table sits inside prose). A two-column block under that bar
  *    stays a table however wide its gap; blocks with
  *    3+ anchors are never vetoed (prose never flows in 3 aligned columns
  *    of equal row count). A page that is NOTHING BUT one wide two-column
  *    grid is genuinely ambiguous without ruling lines — we read it as
  *    layout, the conservative choice for extraction order;
  *  - the first row of a detected table is its markdown header (PDF has
  *    no `<th>`; generators put the header on top) — rendered by the SAME
  *    [[TableMd.render]] as the HTML path, so both payload kinds emit
  *    byte-identical GFM for the same logical table.
  *
  * Scale shape: pure per-payload kernel (map-side, no shuffle) — the
  * [[TableMd]]/[[graft.extract.Outlinks]] fan-out shape; callers
  * aggregate the emitted rows.
  */
object PdfTable {

  /** Lines within this of a row's anchor y share the visual row (PDF
    * baselines of one row coincide; leading is ≥ ~12pt). */
  final val YTolPts = 2.0

  /** Cells within this of a column's anchor x share the column
    * (~3 glyphs at 12pt Helvetica). */
  final val XTolPts = 18.0

  /** Every table in the document, in (stream, y-descending) order. */
  def tables(bytes: Array[Byte]): Seq[TableMd.Table] = {
    if (!PdfParser.isPdf(bytes)) return Nil
    PdfParser.findStreams(bytes).flatMap { s =>
      val page = ArrayBuffer.empty[PdfLine]
      PdfParser.parseContent(s, page)
      pageTables(page.toSeq)
    }
  }

  /** Cluster one page's lines into visual rows (y descending; within a
    * row, x ascending). Anchor = the row's first (highest-y) line. */
  private[graft] def rowsOf(ls: Seq[PdfLine]): Seq[Seq[PdfLine]] = {
    val sorted = ls.sortBy(l => (-l.y, l.x))
    val rows = ArrayBuffer.empty[ArrayBuffer[PdfLine]]
    var anchorY = 0.0
    sorted.foreach { l =>
      if (rows.isEmpty || anchorY - l.y > YTolPts) {
        rows += ArrayBuffer(l); anchorY = l.y
      } else rows.last += l
    }
    rows.map(_.toSeq).toSeq
  }

  /** Greedy left-to-right x clustering: each anchor is its cluster's
    * leftmost x; an x joins the cluster while x - anchor ≤ [[XTolPts]]. */
  private[graft] def xAnchors(xs: Seq[Double]): IndexedSeq[Double] = {
    val sorted = xs.distinct.sorted
    val anchors = ArrayBuffer.empty[Double]
    sorted.foreach { x =>
      if (anchors.isEmpty || x - anchors.last > XTolPts) anchors += x
    }
    anchors.toIndexedSeq
  }

  private[graft] def pageTables(page: Seq[PdfLine]): Seq[TableMd.Table] = {
    val rows = rowsOf(page)
    val out = ArrayBuffer.empty[TableMd.Table]
    var i = 0
    while (i < rows.length) {
      if (rows(i).length >= 2) {
        var j = i
        while (j < rows.length && rows(j).length >= 2) j += 1
        if (j - i >= 2) gridOf(rows.slice(i, j), rows.length).foreach(out += _)
        i = j
      } else i += 1
    }
    out.toSeq
  }

  /** Assign the block's cells to column anchors and render; None when the
    * block is a two-column page layout (see the veto in the header). */
  private[graft] def gridOf(block: Seq[Seq[PdfLine]],
      pageRows: Int): Option[TableMd.Table] = {
    val cells = block.flatten
    val anchors = xAnchors(cells.map(_.x))
    if (anchors.length < 2) return None
    if (anchors.length == 2 && block.length * 5 >= pageRows * 4 &&
      PdfParser.gutterX(cells).isDefined) return None
    def colOf(x: Double): Int = {
      var k = anchors.length - 1
      while (k > 0 && anchors(k) > x) k -= 1
      k
    }
    val grid = block.map { row =>
      val byCol = Array.fill(anchors.length)("")
      row.foreach { l => // row is x-ascending from rowsOf
        val k = colOf(l.x)
        byCol(k) = if (byCol(k).isEmpty) l.text else byCol(k) + " " + l.text
      }
      byCol.toVector
    }.toVector
    Some(TableMd.Table(grid, 1, TableMd.render(grid, 1)))
  }
}
