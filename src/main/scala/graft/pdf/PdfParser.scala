package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** From-scratch PDF content-stream text extractor (the binary-payload
  * path of BASELINE.json: "PDF content-stream parser ... plus layout").
  *
  * v1 layout model (SURVEY.md §7 hard-part (c)): single-column reading
  * order — every text-positioning op (Td, TD, T*, Tm, ', ") starts a new
  * line; show ops (Tj, TJ, ', ") append to the current line; lines join
  * with '\n'. Never throws on hostile bytes: malformed structures yield
  * best-effort text (possibly empty).
  */
object PdfParser {

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-'

  /** Extract text lines from all content streams in the document. */
  def extractText(bytes: Array[Byte]): String = {
    val streams = findStreams(bytes)
    val lines = new ArrayBuffer[String]
    streams.foreach { s => parseContent(s, lines) }
    lines.mkString("\n")
  }

  /** Locate `stream ... endstream` payloads; inflate when the preceding
    * dictionary mentions /FlateDecode, else use raw bytes. */
  private[pdf] def findStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val raw = new String(bytes, ISO_8859_1)
    val out = new ArrayBuffer[Array[Byte]]
    var from = 0
    while (from < raw.length) {
      val si = raw.indexOf("stream", from)
      if (si < 0) { from = raw.length }
      else {
        // require it to be the keyword, not "endstream"
        val isEnd = si >= 3 && raw.regionMatches(si - 3, "end", 0, 3)
        if (isEnd) { from = si + 6 }
        else {
          var dataStart = si + 6
          if (dataStart < raw.length && raw.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
          val ei = raw.indexOf("endstream", dataStart)
          if (ei < 0) { from = raw.length }
          else {
            var dataEnd = ei
            // strip one trailing EOL
            if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\n') dataEnd -= 1
            if (dataEnd > dataStart && raw.charAt(dataEnd - 1) == '\r') dataEnd -= 1
            val dictStart = math.max(0, raw.lastIndexOf("<<", si))
            val dict = raw.substring(dictStart, si)
            val payload = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
            val data =
              if (dict.contains("/FlateDecode")) inflate(payload) else payload
            if (data.nonEmpty) out += data
            from = ei + 9
          }
        }
      }
    }
    out.toSeq
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4 + 64)
      val buf = new Array[Byte](4096)
      var guard = 0
      while (!inf.finished() && guard < (1 << 16)) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) guard = (1 << 16) // truncated
        else out.write(buf, 0, n)
        guard += 1
      }
      inf.end()
      out.toByteArray
    } catch { case _: Throwable => Array.emptyByteArray }
  }

  /** Parse one content stream, appending completed lines. */
  private[pdf] def parseContent(stream: Array[Byte], lines: ArrayBuffer[String]): Unit = {
    val s = new String(stream, ISO_8859_1)
    val n = s.length
    var i = 0
    val cur = new StringBuilder
    var anyShow = false
    def breakLine(): Unit = {
      if (anyShow) { lines += cur.toString; cur.clear(); anyShow = false }
    }
    // last string/array tokens seen (operands stack, strings only)
    val operands = new ArrayBuffer[String]
    var lastWasArray = false
    var arrayStrings: List[String] = Nil

    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') {
        val (str, next) = parseString(s, i)
        operands += str
        lastWasArray = false
        i = next
      } else if (c == '[') {
        val (strs, next) = parseArray(s, i)
        arrayStrings = strs
        lastWasArray = true
        i = next
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') {
        val (str, next) = parseHexString(s, i)
        operands += str
        lastWasArray = false
        i = next
      } else if (c == '%') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (isOpChar(c)) {
        val start = i
        while (i < n && isOpChar(s.charAt(i))) i += 1
        s.substring(start, i) match {
          case "Td" | "TD" | "T*" | "Tm" =>
            breakLine()
          case "Tj" =>
            if (operands.nonEmpty) { cur.append(operands.last); anyShow = true }
            operands.clear()
          case "TJ" =>
            if (lastWasArray) { arrayStrings.foreach(cur.append); anyShow = arrayStrings.nonEmpty || anyShow }
            lastWasArray = false
          case "'" =>
            breakLine()
            if (operands.nonEmpty) { cur.append(operands.last); anyShow = true }
            operands.clear()
          case "\"" =>
            breakLine()
            if (operands.nonEmpty) { cur.append(operands.last); anyShow = true }
            operands.clear()
          case "ET" | "BT" =>
            breakLine()
            operands.clear(); lastWasArray = false
          case _ =>
            operands.clear()
        }
      } else {
        i += 1 // numbers, names, whitespace, dict delimiters
      }
    }
    breakLine()
  }

  @inline private def isOpChar(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || c == '*' || c == '\'' || c == '"'

  /** PDF literal string with escapes and balanced nesting. Returns
    * (decoded, indexAfterClose). */
  private[graft] def parseString(s: String, open: Int): (String, Int) = {
    val b = new StringBuilder
    var i = open + 1
    var depth = 1
    val n = s.length
    while (i < n && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = s.charAt(i + 1)
        e match {
          case 'n'  => b.append('\n'); i += 2
          case 'r'  => b.append('\r'); i += 2
          case 't'  => b.append('\t'); i += 2
          case 'b'  => b.append('\b'); i += 2
          case 'f'  => b.append('\f'); i += 2
          case '('  => b.append('('); i += 2
          case ')'  => b.append(')'); i += 2
          case '\\' => b.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case '\r' => i += (if (i + 2 < n && s.charAt(i + 2) == '\n') 3 else 2)
          case d if d >= '0' && d <= '7' =>
            var code = 0; var k = i + 1; var cnt = 0
            while (k < n && cnt < 3 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
              code = code * 8 + (s.charAt(k) - '0'); k += 1; cnt += 1
            }
            b.append((code & 0xff).toChar); i = k
          case other => b.append(other); i += 2
        }
      } else if (c == '(') { depth += 1; b.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) b.append(c); i += 1 }
      else { b.append(c); i += 1 }
    }
    (b.toString, i)
  }

  private[graft] def parseHexString(s: String, open: Int): (String, Int) = {
    val b = new StringBuilder
    var i = open + 1
    val n = s.length
    var hi = -1
    while (i < n && s.charAt(i) != '>') {
      val c = s.charAt(i)
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else -1
      if (v >= 0) {
        if (hi < 0) hi = v
        else { b.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) b.append((hi << 4).toChar)
    (b.toString, if (i < n) i + 1 else n)
  }

  /** `[ (a) -250 (b) ] TJ` array: collect the strings in order. */
  private[pdf] def parseArray(s: String, open: Int): (List[String], Int) = {
    val out = List.newBuilder[String]
    var i = open + 1
    val n = s.length
    while (i < n && s.charAt(i) != ']') {
      val c = s.charAt(i)
      if (c == '(') {
        val (str, next) = parseString(s, i)
        out += str; i = next
      } else if (c == '<') {
        val (str, next) = parseHexString(s, i)
        out += str; i = next
      } else i += 1
    }
    (out.result(), if (i < n) i + 1 else n)
  }
}
