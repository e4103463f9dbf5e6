package graft

/** Minimal JSON string escaping shared by the driver-contract mains
  * (backslash, quote, and all control chars — a stray quote in a path
  * or query name must not invalidate the one-line protocol). */
object JsonUtil {
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
