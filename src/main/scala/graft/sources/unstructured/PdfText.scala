package graft.sources.unstructured

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater

/** Minimal, dependency-free PDF text extraction.
  *
  * Covers the common case without PDFBox (whose absence offline forced a stub
  * in round 1): content streams that are either unfiltered or FlateDecode
  * (zlib — `java.util.zip.Inflater` handles it), with text drawn via the
  * standard `Tj` / `TJ` / `'` operators and literal `(...)` strings. That is
  * the output shape of most generators for Latin-script text.
  *
  * Known limits (documented, deliberate): no cross-reference parsing (we scan
  * for `stream`..`endstream` directly), no CID/Type0 composite-font decoding
  * (hex strings with multi-byte glyph indexes), no LZW/ASCII85 filters, no
  * encryption. When nothing decodable is found the caller falls back to the
  * printable-ASCII heuristic.
  *
  * Reference equivalent: PdfReaderFactory.scala:52-67 (PDFBox call).
  */
private[graft] object PdfText {

  private val MaxInflated = 8 * 1024 * 1024

  /** Extract text from a PDF byte array; empty string when no text ops found. */
  def extract(bytes: Array[Byte], maxChars: Int = 10000): String = {
    val sb = new StringBuilder
    contentStreams(bytes).foreach { data =>
      if (sb.length < maxChars) appendTextOps(data, sb, maxChars)
    }
    sb.toString.trim.take(maxChars)
  }

  /** All stream..endstream payloads that are unfiltered or FlateDecode. */
  private[graft] def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    // ISO-8859-1 maps bytes 1:1 to chars, so string indexes == byte offsets
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    var continue = true
    while (continue) {
      val k = s.indexOf("stream", pos)
      if (k < 0) continue = false
      else if (k >= 3 && s.regionMatches(k - 3, "end", 0, 3)) pos = k + 6
      else {
        val dictStart = s.lastIndexOf("<<", k)
        val dict = if (dictStart >= 0) s.substring(dictStart, k) else ""
        var dataStart = k + 6
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val end = s.indexOf("endstream", dataStart)
        if (end < 0) continue = false
        else {
          var dataEnd = end
          while (dataEnd > dataStart && (s.charAt(dataEnd - 1) == '\n' || s.charAt(dataEnd - 1) == '\r'))
            dataEnd -= 1
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          if (!dict.contains("/Filter")) out += raw
          else if (dict.contains("/FlateDecode")) inflate(raw).foreach(out += _)
          // other filters (LZW, ASCII85, DCT...) are skipped
          pos = end + "endstream".length
        }
      }
    }
    out.toSeq
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val buf = new java.io.ByteArrayOutputStream(math.min(data.length * 4, MaxInflated))
      val chunk = new Array[Byte](8192)
      while (!inf.finished() && buf.size < MaxInflated) {
        val n = inf.inflate(chunk)
        if (n == 0 && inf.needsInput()) return if (buf.size > 0) Some(buf.toByteArray) else None
        buf.write(chunk, 0, n)
      }
      inf.end()
      Some(buf.toByteArray)
    } catch { case _: Exception => None }

  /** Walk a decoded content stream: literal strings accumulate, the
    * line-positioning operators (Td TD T* ' ") break lines.
    */
  private def appendTextOps(data: Array[Byte], sb: StringBuilder, maxChars: Int): Unit = {
    val s = new String(data, StandardCharsets.ISO_8859_1)
    val token = new StringBuilder
    var i = 0
    def flushToken(): Unit = {
      token.toString match {
        case "Td" | "TD" | "T*" | "'" | "\"" =>
          if (sb.nonEmpty && sb.last != '\n') sb.append('\n')
        case _ =>
      }
      token.clear()
    }
    while (i < s.length && sb.length < maxChars) {
      s.charAt(i) match {
        case '(' =>
          flushToken()
          i = parseLiteralString(s, i + 1, sb, maxChars)
        case c if c.isWhitespace || c == '[' || c == ']' || c == '/' =>
          flushToken(); i += 1
        case c =>
          token.append(c); i += 1
      }
    }
    flushToken()
  }

  /** PDF literal string body starting after '(': handles nested parens,
    * backslash escapes, and octal codes. Returns the index after ')'.
    */
  private def parseLiteralString(s: String, start: Int, sb: StringBuilder, maxChars: Int): Int = {
    var i = start
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\r' => i += (if (i + 2 < s.length && s.charAt(i + 2) == '\n') 3 else 2) // line continuation
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var code = 0; var n = 0; i += 1
              while (n < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                code = code * 8 + (s.charAt(i) - '0'); i += 1; n += 1
              }
              sb.append(code.toChar)
            case other => sb.append(other); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) sb.append(')')
          i += 1
        case c =>
          if (sb.length < maxChars) sb.append(c)
          i += 1
      }
    }
    i
  }
}
