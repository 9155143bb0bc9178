package graft

/** Minimal JSON string escaping shared by the harness mains (no JSON
  * library in the dependency set): backslash, quote, and ALL control
  * chars — a tab or CR in builder-authored SQL or a quoted path would
  * otherwise emit malformed JSON.
  */
object JsonUtil {
  def escape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case '\b' => "\\b"
    case '\f' => "\\f"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
