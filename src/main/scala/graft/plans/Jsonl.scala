package graft.plans

/** Minimal JSON string escape/unescape shared by every manifest writer
  * (superstep manifests, SCC round manifests, the table catalog). One
  * implementation, one set of escaping rules: an escaping bug fixed here
  * can't silently live on in a second copy and corrupt a different
  * manifest family's resume path.
  */
object Jsonl {

  /** Escape + quote: caller-supplied names/paths may carry quotes,
    * backslashes or control characters that would corrupt a manifest line.
    */
  def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Inverse of [[jstr]] for an already-unquoted body. */
  def junstr(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) s(i + 1) match {
        case 'u' => out += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
        case c => out += c; i += 2
      } else { out += s(i); i += 1 }
    }
    out.toString
  }
}
