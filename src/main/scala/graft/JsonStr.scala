package graft

/** THE shared JSON string escaper — every hand-rolled JSON emitter in
  * the repo (Bench/Verify/ScaleBench contract lines, the model/settings
  * artifacts, the training-file writer) goes through here, so an
  * escaping fix can never miss a copy (four near-identical private
  * copies had already diverged into concrete round-trip bugs: a weak
  * model-artifact escaper vs. the strong training-file one).
  *
  * Escapes everything any of the READERS can reject: quote, backslash,
  * \n \r \t, the other C0 controls, DEL + the C1 controls
  * (U+007F–U+009F — snakeyaml's printable set excludes them), the
  * U+2028/U+2029 separators, ALL Unicode non-characters (U+FDD0–FDEF
  * plus U+nFFFE/U+nFFFF on every plane — supplementary ones are
  * escaped as their surrogate-pair \u sequences), and LONE UTF-16
  * surrogates (`Files.writeString` cannot UTF-8-encode a lone
  * surrogate at all — it throws before any reader is involved); valid
  * surrogate PAIRS of ordinary characters pass through raw. Unlike
  * Python's `json.dump(ensure_ascii=True)` (which escapes ALL
  * non-ASCII), ordinary non-ASCII text stays readable in artifacts.
  */
object JsonStr {

  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\\' => sb.append("\\\\")
        case '"'  => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (Character.isHighSurrogate(c)) {
            if (i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))) {
              val lo = s.charAt(i + 1)
              // Supplementary-plane non-character (U+nFFFE/U+nFFFF):
              // escape both halves so the artifact carries no raw
              // non-character on ANY plane.
              if ((Character.toCodePoint(c, lo) & 0xfffe) == 0xfffe)
                sb.append(f"\\u${c.toInt}%04x\\u${lo.toInt}%04x")
              else sb.append(c).append(lo)
              i += 1
            } else sb.append(f"\\u${c.toInt}%04x")
          } else if (Character.isLowSurrogate(c)) {
            // Lone LOW surrogate (a lone high one is caught above).
            sb.append(f"\\u${c.toInt}%04x")
          } else if (c < 0x20 || (c >= 0x7f && c <= 0x9f) ||
              c == 0x2028.toChar || c == 0x2029.toChar ||
              (c >= 0xfdd0.toChar && c <= 0xfdef.toChar) ||
              c == 0xfffe.toChar || c == 0xffff.toChar) {
            sb.append(f"\\u${c.toInt}%04x")
          } else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }
}
