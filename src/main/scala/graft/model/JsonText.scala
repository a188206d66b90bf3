package graft.model

/** The repo's ONE JSON string-escape table (quote, backslash, the named
  * control escapes, `\\u%04x` for the rest of C0) — shared by the CLI's
  * free-text interpolation, Verify's oracle_sql dump, and the loopback
  * fixtures' hot render paths, so an escaping fix lands once.
  */
object JsonText {

  /** Append `s` JSON-escaped (no surrounding quotes) — allocation-free
    * for hot loops. */
  def appendEscaped(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      (s.charAt(i): @annotation.switch) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  /** `s` as a quoted JSON string literal; null renders as `""`. */
  def quote(s: String): String = {
    val sb = new java.lang.StringBuilder(
      (if (s == null) 0 else s.length) + 8)
    sb.append('"')
    appendEscaped(sb, Option(s).getOrElse(""))
    sb.append('"')
    sb.toString
  }
}
