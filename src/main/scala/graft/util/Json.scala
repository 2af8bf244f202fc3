package graft.util

/** Minimal JSON string escaping shared by the driver mains (Bench, Verify).
  * One implementation so escaping fixes can't drift between the two. */
object Json {

  /** Escape `raw` for embedding in a JSON string literal. Truncation (when
    * `maxLen` >= 0) happens BEFORE escaping — truncating afterwards could
    * cut an escape pair in half and corrupt the document. All control
    * chars < 0x20 are escaped. */
  def escape(raw: String, maxLen: Int = -1): String = {
    val s = if (maxLen >= 0) raw.take(maxLen) else raw
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
  }
}
