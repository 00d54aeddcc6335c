package graft

/** JSON string escaping shared by the driver-contract mains (Verify's
  * oracle_sql.json, Bench's result line): backslash, quote, and ALL
  * control chars (<0x20) — a raw control character in builder-authored
  * SQL or in an exception message would make the driver's json.load fail
  * and silently zero the round's results.
  */
object JsonEscape {
  def apply(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
