package graft.core

/** Minimal JSON string escaping shared by every artifact writer. Escapes
  * backslash, quote, and ALL control chars — a newline inside a Spark
  * error message must not corrupt run_results.json. */
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
}
