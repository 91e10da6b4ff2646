package graft.pipeline

/** S9: from-scratch **kern → SVG staff renderer.
  *
  * The reference pipes **kern model output through the external verovio
  * toolkit and wraps the SVG in an HTML shell
  * (GOT/demo/run_ocr_2.0.py:158-172, GOT/demo/process_results.py:12-31).
  * Verovio is a full engraving engine and an explicit non-goal; this
  * renderer re-derives the CONTRACT — sheet-music notation in, valid
  * standalone SVG out, HTML-wrapped — with deterministic from-scratch
  * layout: a five-line staff, noteheads positioned by diatonic pitch
  * (treble clef, Humdrum **kern pitch spelling), stems, accidentals,
  * rests and barlines. Engraving fidelity (beams, clefs, key
  * signatures, spacing) is out of scope; byte-determinism and
  * never-throw on hostile input are in scope.
  *
  * **kern basics honored (public Humdrum syntax): `**kern`/`*…` control
  * lines and `!` comments are skipped; `=` lines are barlines; data
  * tokens carry duration digits + optional dots, pitch letters
  * (lowercase c-b = octave 4 upward by repetition, uppercase C-B =
  * octave 3 downward by repetition), `#`/`-` accidentals, `r` rests.
  * Multi-spine lines render their first spine (melody line).
  */
object KernSvg {

  private final val Gap = 10        // staff line gap
  private final val Top = 30        // y of top staff line
  private final val NoteStep = 26   // x advance per token
  private final val X0 = 40

  private def letterIdx(c: Char): Int = "cdefgab".indexOf(c.toLower)

  /** Diatonic index of the token's pitch (c4 = 28 → bottom-line E4 = 30);
    * None for rests/unpitched. The octave run is clamped to the musical
    * range (hostile tokens with huge letter runs would otherwise push the
    * note millions of points off-staff and the ledger-line loops would
    * emit one element per gap — unbounded output from bounded input). */
  private[graft] def pitchIndex(tok: String): Option[Int] = {
    if (tok.contains('r')) return None
    val letters = tok.filter(c => letterIdx(c) >= 0)
    if (letters.isEmpty) return None
    val c = letters.head
    val run = math.min(letters.takeWhile(_ == c).length, 4)
    val li = letterIdx(c)
    val octave = if (c.isLower) 3 + run else 4 - run // kern octave spelling
    Some(octave * 7 + li)
  }

  private[graft] def duration(tok: String): Int = {
    val digits = tok.takeWhile(_.isDigit)
    if (digits.isEmpty) 4 else math.max(1, digits.toInt)
  }

  /** Render kern text to a standalone SVG. Never throws. */
  def toSvg(kern: String): String = {
    val sb = new StringBuilder
    var x = X0
    val body = new StringBuilder
    kern.split("\n").foreach { line0 =>
      val line = line0.split("\t").headOption.getOrElse("") // first spine
      if (line.nonEmpty && !line.startsWith("*") && !line.startsWith("!")) {
        if (line.startsWith("=")) {
          body.append(s"""<line x1="$x" y1="$Top" x2="$x" y2="${Top + 4 * Gap}" stroke="black"/>""").append('\n')
          x += NoteStep / 2
        } else {
          val dur = duration(line)
          pitchIndex(line) match {
            case Some(idx) =>
              // bottom staff line (y = Top + 4*Gap) is E4 = diatonic 30
              val y = Top + 4 * Gap - (idx - 30) * (Gap / 2)
              val fill = if (dur >= 4) "black" else "none"
              // ledger lines for notes outside the staff
              var ly = Top - Gap
              while (ly >= y - Gap / 2) {
                body.append(s"""<line x1="${x - 8}" y1="$ly" x2="${x + 8}" y2="$ly" stroke="black"/>""").append('\n')
                ly -= Gap
              }
              ly = Top + 5 * Gap
              while (ly <= y + Gap / 2) {
                body.append(s"""<line x1="${x - 8}" y1="$ly" x2="${x + 8}" y2="$ly" stroke="black"/>""").append('\n')
                ly += Gap
              }
              body.append(s"""<ellipse cx="$x" cy="$y" rx="5" ry="4" fill="$fill" stroke="black"/>""").append('\n')
              if (dur >= 2)
                body.append(s"""<line x1="${x + 5}" y1="$y" x2="${x + 5}" y2="${y - 28}" stroke="black"/>""").append('\n')
              if (line.contains('#'))
                body.append(s"""<text x="${x - 14}" y="${y + 4}" font-size="10">#</text>""").append('\n')
              if (line.contains('-') && !line.startsWith("-"))
                body.append(s"""<text x="${x - 14}" y="${y + 4}" font-size="10">b</text>""").append('\n')
              x += NoteStep
            case None if line.contains('r') =>
              body.append(s"""<rect x="${x - 4}" y="${Top + Gap + 3}" width="8" height="4" fill="black"/>""").append('\n')
              x += NoteStep
            case None => () // unparseable token: skip, never throw
          }
        }
      }
    }
    val width = math.max(x + X0, 200)
    sb.append(s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="120" viewBox="0 0 $width 120">""").append('\n')
    (0 until 5).foreach { i =>
      val y = Top + i * Gap
      sb.append(s"""<line x1="10" y1="$y" x2="${width - 10}" y2="$y" stroke="black"/>""").append('\n')
    }
    sb.append(body)
    sb.append("</svg>")
    sb.toString
  }

  /** HTML wrapper (the process_results.py:12-31 analog: SVG inline in a
    * minimal page). */
  def toHtml(kern: String): String =
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>graft kern</title></head>
       |<body>
       |${toSvg(kern)}
       |</body></html>
       |""".stripMargin
}
