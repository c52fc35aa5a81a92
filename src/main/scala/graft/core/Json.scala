package graft.core

/** Minimal JSON support shared by every artifact writer/reader. No
  * external dependency by design (build.sbt is frozen): `quote` escapes
  * for writers; `parse` is a small recursive-descent reader used to load
  * the engine's OWN artifacts (commit-log version files, manifest.json) —
  * replacing the field-order-dependent regex scraping flagged in r1/r2. */
object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Parse a JSON document: objects → Map[String, Any] (insertion order),
    * arrays → Vector[Any], strings → String, numbers → Double (or Long
    * when integral), true/false → Boolean, null → null. */
  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing JSON content at offset ${p.pos}")
    v
  }

  def obj(v: Any): Map[String, Any] = v.asInstanceOf[Map[String, Any]]
  def arr(v: Any): Vector[Any] = v.asInstanceOf[Vector[Any]]
  def str(v: Any): String = v.asInstanceOf[String]

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(pos) == c, s"expected '$c' at offset $pos")
      pos += 1
    }
    def value(): Any = {
      skipWs()
      require(!eof, "unexpected end of JSON")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => array()
        case '"' => string()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => number()
      }
    }
    private def lit(word: String, v: Any): Any = {
      require(s.regionMatches(pos, word, 0, word.length), s"bad literal at $pos")
      pos += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      val b = scala.collection.immutable.ListMap.newBuilder[String, Any]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return b.result() }
      var done = false
      while (!done) {
        skipWs()
        val k = string()
        expect(':')
        b += k -> value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      b.result()
    }
    private def array(): Vector[Any] = {
      expect('['); skipWs()
      val b = Vector.newBuilder[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      b.result()
    }
    private def string(): String = {
      expect('"')
      val b = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"'  => b += '"'
            case '\\' => b += '\\'
            case '/'  => b += '/'
            case 'b'  => b += '\b'
            case 'f'  => b += '\f'
            case 'n'  => b += '\n'
            case 'r'  => b += '\r'
            case 't'  => b += '\t'
            case 'u'  =>
              b += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else b += c
        pos += 1
      }
      pos += 1
      b.toString
    }
    private def number(): Any = {
      val start = pos
      while (!eof && (s.charAt(pos).isDigit || "+-.eE".indexOf(s.charAt(pos)) >= 0)) pos += 1
      val t = s.substring(start, pos)
      if (t.matches("-?\\d+")) t.toLong else t.toDouble
    }
  }
}
