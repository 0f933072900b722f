package graft.parser

/** Tokens carry their start offset in the ORIGINAL text so the parser can
  * capture raw statement tails (`AS <query>`, `DDL <ddls>`) verbatim — the
  * same trick as the reference grammar's `restOfInput`
  * (reference: antlr/LightningParser.g4:148-150,
  * parser/LightningExtensionAstBuilder.scala:346-352).
  */
sealed trait Token { def start: Int; def text: String }
final case class Ident(text: String, start: Int, quoted: Boolean = false) extends Token
final case class StrLit(text: String, start: Int) extends Token
final case class NumLit(text: String, start: Int) extends Token
final case class Sym(ch: Char, start: Int) extends Token { def text: String = ch.toString }
final case class Eof(start: Int) extends Token { def text: String = "<EOF>" }

final class ParseException(msg: String) extends IllegalArgumentException(msg)

/** SQL-ish lexer: case-preserving identifiers, backquoted identifiers with
  * ``-escape, single/double-quoted strings with ''-escape, `--` and
  * slash-star comments skipped.
  */
object Lexer {
  def tokenize(s: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        val e = s.indexOf("*/", i + 2)
        i = if (e < 0) n else e + 2
      } else if (c == '`') {
        val start = i
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (s.charAt(i) == '`') {
            if (i + 1 < n && s.charAt(i + 1) == '`') { sb.append('`'); i += 2 }
            else { closed = true; i += 1 }
          } else { sb.append(s.charAt(i)); i += 1 }
        }
        if (!closed) throw new ParseException(s"unterminated backquoted identifier at $start")
        out += Ident(sb.toString, start, quoted = true)
      } else if (c == '\'' || c == '"') {
        val start = i
        val quote = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (s.charAt(i) == quote) {
            if (i + 1 < n && s.charAt(i + 1) == quote) { sb.append(quote); i += 2 }
            else { closed = true; i += 1 }
          } else if (s.charAt(i) == '\\' && i + 1 < n && (s.charAt(i + 1) == quote || s.charAt(i + 1) == '\\')) {
            sb.append(s.charAt(i + 1)); i += 2
          } else { sb.append(s.charAt(i)); i += 1 }
        }
        if (!closed) throw new ParseException(s"unterminated string literal at $start")
        out += StrLit(sb.toString, start)
      } else if (c.isDigit) {
        val start = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        out += NumLit(s.substring(start, i), start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '$')) i += 1
        out += Ident(s.substring(start, i), start)
      } else {
        out += Sym(c, i)
        i += 1
      }
    }
    out += Eof(n)
    out.result()
  }
}
