package graft.pipeline

/** Render sinks (SURVEY.md S7/S8/P9/P10/P11): per-doc scalar render
  * functions producing an `html_render` column. The HTML shells are OUR
  * OWN minimal templates (the reference splices into
  * render_tools/content-mmd-to-html.html at the `const text =` slot —
  * run_ocr_2.0.py:174-199; we reproduce the splice contract, not the
  * template file). */
object Render {

  /** P10: CJK punctuation translate (process_results.py:3-7). */
  def translatePunctuation(s: String): String =
    s.replace('，', ',').replace('。', '.')

  /** P9: mathpix-style escaping (run_ocr_2.0.py:187-194): double quotes
    * become double backticks, dollars are dropped, then each line is
    * emitted as a JS string literal `"<line>\n" +` with backslashes
    * doubled; the trailing `+\n` pair is dropped. */
  def mathpixEscape(outputs0: String): String = {
    val outputs = outputs0.replace("\"", "``").replace("$", "")
    val sb = new StringBuilder
    outputs.split("\n", -1).foreach { line =>
      sb.append('"').append(line.replace("\\", "\\\\")).append("\\n").append('"').append('+').append('\n')
    }
    if (sb.length >= 2) sb.setLength(sb.length - 2)
    sb.toString
  }

  /** P11: tikz line normalization (run_ocr_2.0.py:204-220): translate
    * punctuation; drop empty lines; outside tikzpicture delimiters strip
    * trailing spaces and force `;` termination (the reference's quirk —
    * a line not ending in `;` loses its last char before `;` is
    * appended — is ported as-is). */
  def tikzNormalize(outputs0: String): String = {
    val outputs = translatePunctuation(outputs0)
    val sb = new StringBuilder
    outputs.split("\n", -1).foreach { out0 =>
      if (out0.nonEmpty) {
        if (!out0.contains("\\begin{tikzpicture}") && !out0.contains("\\end{tikzpicture}")) {
          var out = out0
          while (out.nonEmpty && out.last == ' ') out = out.dropRight(1)
          if (out.nonEmpty) {
            if (out.last != ';') sb.append(out.dropRight(1)).append(";\n")
            else sb.append(out).append('\n')
          }
        } else sb.append(out0).append('\n')
      }
    }
    sb.toString
  }

  private val mmdShell =
    """<!DOCTYPE html>
      |<html><head><meta charset="utf-8"><title>graft render</title>
      |<script>
      |const text =%s;
      |window.onload = () => { document.getElementById("out").textContent = text; };
      |</script></head>
      |<body><pre id="out"></pre></body></html>
      |""".stripMargin

  private val tikzShell =
    """<!DOCTYPE html>
      |<html><head><meta charset="utf-8"><title>graft tikz</title></head>
      |<body><script type="text/tikz">
      |%s</script></body></html>
      |""".stripMargin

  /** S7: mathpix-markdown render (format-mode outputs). */
  def renderMmdHtml(text: String): String =
    mmdShell.format(mathpixEscape(text))

  /** S8: tikz render. */
  def renderTikzHtml(text: String): String =
    tikzShell.format(tikzNormalize(text))

  /** P13: InternVL cross-system answer unwrap (eval_ocr.py:27-31):
    * content after "All words in the image:\n" and before
    * "[UNUSED_TOKEN_145]". The reference indexes split(...)[1] and
    * crashes when the marker is absent; we pass the text through
    * unchanged instead (never-throw discipline). Column equivalent:
    * substring_index(substring_index(c, '[UNUSED_TOKEN_145]', 1),
    * 'All words in the image:\n', -1). */
  def unwrapInternVl(text: String): String = {
    val m1 = "All words in the image:\n"
    val afterIdx = text.indexOf(m1)
    val after = if (afterIdx >= 0) text.substring(afterIdx + m1.length) else text
    val stopIdx = after.indexOf("[UNUSED_TOKEN_145]")
    if (stopIdx >= 0) after.substring(0, stopIdx) else after
  }

  /** F1 mode routing (run_ocr_2.0.py:158,177,201): kern output renders
    * through the from-scratch SVG staff renderer (S9 — the reference
    * uses the external verovio toolkit; KernSvg re-derives the
    * notation→SVG→HTML contract), tikz goes to the tikz shell,
    * everything else to the mmd shell. */
  def render(text: String): String = {
    if (text.contains("**kern")) KernSvg.toHtml(text)
    else if (text.contains("\\begin{tikzpicture}")) renderTikzHtml(text)
    else renderMmdHtml(text)
  }
}
