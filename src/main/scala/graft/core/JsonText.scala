package graft.core

/** The repo's ONE JSON string escaper — used by every hand-rolled JSON
  * emitter (Verify's oracle dump, Bench's metric line, ss-decode's ndjson).
  * Named escapes for the common whitespace controls, `\\uXXXX` for the
  * rest; escapes `"`, `\` and ALL control chars (< 0x20), which is the
  * complete set RFC 8259 requires.
  *
  * Deliberately NOT used by `SsOffset.quote` (ss/spark/SsDataSource.scala):
  * that string is a persisted streaming-checkpoint wire format with a
  * strict round-trip parser — its `\\uXXXX`-only shape must stay stable
  * across versions or restarts would refuse old checkpoints.
  */
object JsonText {
  def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }
}
