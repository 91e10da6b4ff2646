package graft.pdf

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater

/** Deterministic minimal PDF writer — produces the synthetic `%PDF-`
  * payloads of the fixture corpus (FIXTURES.md §3 "synthetic PDF
  * payload"). One page, Helvetica, a single Flate-compressed content
  * stream. The emitted operator mix (Td, TD, T-star, Tj, TJ, TL) deliberately
  * covers every text op the parser supports.
  */
object PdfWriter {

  def escapeString(s: String): String = {
    val b = new StringBuilder(s.length + 4)
    s.foreach {
      case '('  => b.append("\\(")
      case ')'  => b.append("\\)")
      case '\\' => b.append("\\\\")
      case c    => b.append(c)
    }
    b.toString
  }

  /** Build the content stream for the given text lines. Operator choice
    * rotates by line index so fixtures exercise Td, TD, T* and TJ. */
  def contentStream(lines: Seq[String]): String = {
    val b = new StringBuilder
    b.append("BT\n/F1 12 Tf\n14 TL\n72 720 Td\n")
    lines.zipWithIndex.foreach { case (line, i) =>
      val move =
        if (i == 0) ""
        else if (i % 3 == 1) "0 -14 TD\n"
        else if (i % 3 == 2) "T*\n"
        else "0 -14 Td\n"
      b.append(move)
      if (i % 4 == 3 && line.length > 4) {
        val mid = line.length / 2
        b.append("[(").append(escapeString(line.substring(0, mid)))
          .append(") -250 (").append(escapeString(line.substring(mid)))
          .append(")] TJ\n")
      } else {
        b.append("(").append(escapeString(line)).append(") Tj\n")
      }
    }
    b.append("ET\n")
    b.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    out.toByteArray
  }

  /** Two-column page whose content stream emits text in INTERLEAVED row
    * order (L1, R1, L2, R2, …) with absolute Tm positioning — the order a
    * row-major generator (or a naive printer) writes a two-column layout,
    * and exactly what breaks extraction that trusts document order. The
    * correct reading order is the full left column then the full right
    * column; PdfParser's column detection must recover it. */
  def contentStreamTwoColumn(left: Seq[String], right: Seq[String],
      leftX: Int = 72, rightX: Int = 330): String = {
    val b = new StringBuilder
    b.append("BT\n/F1 12 Tf\n")
    val rows = math.max(left.length, right.length)
    (0 until rows).foreach { r =>
      val y = 720 - 14 * r
      if (r < left.length)
        b.append(s"1 0 0 1 $leftX $y Tm\n(").append(escapeString(left(r))).append(") Tj\n")
      if (r < right.length)
        b.append(s"1 0 0 1 $rightX $y Tm\n(").append(escapeString(right(r))).append(") Tj\n")
    }
    b.append("ET\n")
    b.toString
  }

  def makeTwoColumn(left: Seq[String], right: Seq[String]): Array[Byte] =
    makeWithContent(contentStreamTwoColumn(left, right))

  /** Absolutely-positioned cells — rows of (x, text) at y0, y0-dy, … —
    * the shape a report generator emits for a table (each cell its own
    * `Tm` + `Tj`). Rows may be ragged; an empty row emits nothing. */
  def contentStreamCells(rows: Seq[Seq[(Int, String)]], y0: Int = 700,
      dy: Int = 16): String = {
    val b = new StringBuilder
    b.append("BT\n/F1 12 Tf\n")
    rows.zipWithIndex.foreach { case (cells, r) =>
      val y = y0 - dy * r
      cells.foreach { case (x, txt) =>
        b.append(s"1 0 0 1 $x $y Tm\n(").append(escapeString(txt)).append(") Tj\n")
      }
    }
    b.append("ET\n")
    b.toString
  }

  def makeCells(rows: Seq[Seq[(Int, String)]]): Array[Byte] =
    makeWithContent(contentStreamCells(rows))

  /** Full single-page PDF with a correct xref table. Lines must be
    * ISO-8859-1-representable (the generator keeps PDFs ASCII). */
  def make(lines: Seq[String]): Array[Byte] =
    makeWithContent(contentStream(lines))

  def makeWithContent(contentStr: String): Array[Byte] = {
    val content = deflate(contentStr.getBytes(ISO_8859_1))
    val out = new ByteArrayOutputStream(content.length + 1024)
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = new Array[Int](6)

    w("%PDF-1.4\n%âãÏÓ\n")
    offsets(1) = out.size()
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets(2) = out.size()
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offsets(3) = out.size()
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
    offsets(4) = out.size()
    w(s"4 0 obj\n<< /Length ${content.length} /Filter /FlateDecode >>\nstream\n")
    out.write(content, 0, content.length)
    w("\nendstream\nendobj\n")
    offsets(5) = out.size()
    w("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xrefAt = out.size()
    w("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }
}
