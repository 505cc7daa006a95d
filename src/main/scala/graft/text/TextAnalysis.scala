package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (harness extension):
  * token counting, quality scoring, n-gram language-ID heuristic, and
  * rolling-hash document fingerprinting. All pure column expressions —
  * codegen'd end to end, no shuffle except where aggregation is the point.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped — WITHOUT a lambda: higher-order
    * functions are CodegenFallback, and one in a projection drops the
    * whole stage out of whole-stage codegen (PlanSpec gates this). A
    * regexp trim kills the leading/trailing empties `split` would emit
    * (Spark's split keeps trailing empties, unlike Java's), and interior
    * empties can't occur when splitting on `\s+`; the empty-string guard
    * covers all-whitespace docs.
    */
  def tokens(text: Column): Column =
    splitNonEmpty(text, "\\s+")

  private def splitNonEmpty(text: Column, sep: String): Column = {
    val t = regexp_replace(text, "^\\s+|\\s+$", "")
    when(t === "", array().cast("array<string>")).otherwise(split(t, sep))
  }

  /** BPE-ish subword count: words + digit runs + punctuation runs counted
    * separately (a cheap proxy for BPE token counts: ~= words*1.3 for
    * English; the regex splits on letter/digit/punct class boundaries —
    * the boundaries are zero-width lookarounds, so only whitespace edges
    * could produce empties, and splitNonEmpty trims those).
    */
  def tokenStats(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      size(tokens(t)).as("n_words"),
      length(t).as("n_chars"),
      size(splitNonEmpty(t, "(?<=[a-zA-Z0-9])(?=[^a-zA-Z0-9\\s])" +
        "|(?<=[^a-zA-Z0-9\\s])(?=[a-zA-Z0-9])" +
        "|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|\\s+"))
        .as("n_subtokens"))
  }

  /** Heuristic quality score in [0,1]: combines mean word length,
    * alpha ratio, stopword presence, and repetition (distinct/total token
    * ratio). Deterministic, engine-portable arithmetic.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks).cast("double")
    // Total NON-WHITESPACE chars over token count: the previous
    // `(length - (ntok - 1)) / ntok` assumed exactly one separator
    // space and no padding, so "  hi  " scored mean word length 6.0
    // instead of 2.0 — systematically wrong quality for whitespace-
    // padded or multi-spaced docs.
    val meanWordLen =
      length(regexp_replace(t, "\\s+", "")).cast("double") / nTok
    val alphaRatio =
      (length(regexp_replace(t, "[^a-zA-Z ]", "")).cast("double") /
        greatest(length(t), lit(1)).cast("double"))
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    val wordLenScore =
      lit(1.0) - least(abs(meanWordLen - lit(5.0)) / lit(5.0), lit(1.0))
    docs.select(
      col(idCol),
      round(
        when(nTok === 0, 0.0).otherwise(
          lit(0.3) * wordLenScore + lit(0.4) * alphaRatio +
            lit(0.3) * distinctRatio), 6).as("quality"))
  }

  /** Stopword-profile language ID: score each candidate language by the
    * fraction of tokens in its tiny stopword set; pick the argmax with
    * deterministic tie-breaking — on equal scores the lexicographically
    * GREATEST language code wins (the struct-max rule the
    * implementation and the q42 oracle both encode); 'und' when nothing
    * hits. The profiles are classic top-stopwords per language (public
    * lists).
    */
  val stopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "les"))

  def languageId(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val scored = stopwordProfiles.toSeq.sortBy(_._1).map { case (lang, sws) =>
      // Occurrence count per stopword via size-delta of array_remove —
      // array_intersect would dedupe, and a filter(λ) would knock the
      // projection out of codegen (see tokens()).
      val hits = sws.map(w => size(toks) - size(array_remove(toks, w)))
        .reduce(_ + _)
      struct((hits.cast("double") / nTok).as("score"), lit(lang).as("lang"))
    }
    // array_max on struct(score, lang): max score, ties → max lang; to get
    // deterministic alphabetical-min on ties, compare on (score, reversed
    // lang) is overkill here — profiles are disjoint enough; document the
    // max-lang tie rule instead.
    val best = array_max(array(scored: _*))
    docs.select(col(idCol),
      when(best.getField("score") > 0.0, best.getField("lang"))
        .otherwise(lit("und")).as("lang_guess"),
      round(best.getField("score"), 6).as("lang_score"))
  }

  /** Content-defined fingerprint: md5 over the sorted distinct token set —
    * a whole-document fingerprint robust to token order (the "sorted
    * fingerprint" of the record-linkage literature; cheap rolling-hash
    * stand-in that stays SQL-expressible for the oracle).
    *
    * NULL text fingerprints to NULL — `concat_ws` would silently turn
    * the null token array into "", making every null-text doc share
    * md5("") with every empty doc: exactly the million-row bogus
    * cluster `TextDedup.exactByHash` guards against, and a divergence
    * from the q43 oracle, whose `md5(array_to_string(NULL, ' '))` is
    * NULL.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      when(col(textCol).isNotNull,
        md5(concat_ws(" ", sort_array(array_distinct(tokens(col(textCol)))))))
        .as("fingerprint"))
}
