package graft.html

/** HTML character-reference decoding (the named subset the engine
  * supports, plus full numeric `&#123;` / `&#x1F4A9;` forms).
  *
  * Normalization contract (SURVEY.md §7 hard-part (b)): entity decode
  * happens exactly once, here, during tokenization; unknown named
  * references are left verbatim (HTML5 leniency).
  */
object Entities {
  val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "deg" -> "°", "middot" -> "·", "laquo" -> "«",
    "raquo" -> "»", "eacute" -> "é", "egrave" -> "è",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä",
    "szlig" -> "ß", "ndash" -> "–", "mdash" -> "—",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "bull" -> "•", "hellip" -> "…",
    "prime" -> "′", "euro" -> "€", "trade" -> "™",
    "times" -> "×", "divide" -> "÷", "minus" -> "−",
    "plusmn" -> "±", "le" -> "≤", "ge" -> "≥",
    "ne" -> "≠", "rarr" -> "→", "larr" -> "←",
    "sect" -> "§", "para" -> "¶", "dagger" -> "†")

  /** Decode the reference starting at `pos` (which must point at '&').
    * Returns (decodedText, lengthConsumedInChars). If not a valid
    * reference, returns ("&", 1) — the ampersand is literal text.
    */
  def decodeAt(s: CharSequence, pos: Int): (String, Int) = {
    val n = s.length
    if (pos + 1 >= n) return ("&", 1)
    if (s.charAt(pos + 1) == '#') {
      var i = pos + 2
      var hex = false
      if (i < n && (s.charAt(i) == 'x' || s.charAt(i) == 'X')) { hex = true; i += 1 }
      val start = i
      var code = 0L
      while (i < n && isDigitOf(s.charAt(i), hex) && i - start < 8) {
        code = code * (if (hex) 16 else 10) + hexVal(s.charAt(i))
        i += 1
      }
      if (i == start) return ("&", 1)
      val end = if (i < n && s.charAt(i) == ';') i + 1 else i
      if (code <= 0 || code > 0x10ffff || (code >= 0xd800 && code <= 0xdfff))
        return ("�", end - pos)
      (new String(Character.toChars(code.toInt)), end - pos)
    } else {
      var i = pos + 1
      val start = i
      while (i < n && i - start < 12 && Character.isLetterOrDigit(s.charAt(i))) i += 1
      if (i < n && s.charAt(i) == ';' && i > start) {
        val name = s.subSequence(start, i).toString
        named.get(name) match {
          case Some(v) => (v, i + 1 - pos)
          case None    => ("&", 1) // unknown named ref stays literal
        }
      } else ("&", 1)
    }
  }

  @inline private def isDigitOf(c: Char, hex: Boolean): Boolean =
    if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    else c >= '0' && c <= '9'

  @inline private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10

  /** Escape text for embedding in an HTML text node (generator side). */
  def escapeText(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => b.append("&amp;")
        case '<' => b.append("&lt;")
        case '>' => b.append("&gt;")
        case c   => b.append(c)
      }
      i += 1
    }
    b.toString
  }
}
