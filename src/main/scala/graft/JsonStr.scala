package graft

/** Shared JSON string escaping for the hand-rolled JSON emitters (the
  * Bench / Verify / ScaleBench contract lines): quote, backslash, and
  * ALL control chars (< 0x20) — a tab or CR in an emitted value would
  * otherwise make the driver's json.load fail. One definition so a
  * future fix (e.g. surrogate handling) cannot miss a copy;
  * `Settings.toJson` keeps an equivalent StringBuilder-integrated
  * escape for its append-heavy artifact path.
  */
object JsonStr {
  def escape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
