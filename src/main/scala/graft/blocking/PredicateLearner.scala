package graft.blocking

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.config.DedupeConfig

/** Blocking-predicate learning (ref: SURVEY.md D4 — the reference's
  * `deduper.train(recall=config['recall'])` at pgdedupe/run.py:175-178
  * learns, besides classifier weights, the predicate set whose blocks
  * cover ≥ `recall` of the labeled duplicate pairs while generating as
  * few candidate comparisons as possible; dedupe solves this as greedy
  * weighted set cover — Bilenko et al., "Adaptive Blocking: Learning to
  * Scale Up Record Linkage").
  *
  * Spark shape, two jobs total regardless of candidate count:
  *  1. coverage — ONE pass over the labeled match pairs evaluating every
  *     candidate predicate as `arrays_overlap(keys(l), keys(r))` columns
  *     (reuses the exact predicate Column expressions the blocker runs,
  *     so learned coverage can never drift from applied blocking);
  *  2. cost — ONE pass over the records: every candidate's keys exploded
  *     with a predicate tag, `groupBy(tag, key).count`, then
  *     Σ c·(c−1)/2 per tag = the number of within-block comparisons the
  *     predicate would admit.
  * Greedy selection then runs on the driver over |candidates| bits per
  * match pair — tiny.
  */
object PredicateLearner {

  /** Candidate pool per field type (legal shapes from the reference's
    * learner, SURVEY.md D5, including the TF-IDF canopy index shapes —
    * dedupe offers canopies at several thresholds; two here bound the
    * fitting cost). Deterministic order = tie-break order.
    */
  def candidates(cfg: DedupeConfig): Seq[Predicate] =
    cfg.fields.flatMap { f =>
      f.ftype match {
        case "String" =>
          Seq(WholeField(f.field), FirstChars(f.field, 2),
            FirstChars(f.field, 4), FirstChars(f.field, 6),
            FirstToken(f.field), SortedTokens(f.field),
            NGrams(f.field, 3), DigitsOnly(f.field),
            TfIdfCanopy(f.field, 0.8), TfIdfCanopy(f.field, 0.6))
        case _ => Seq(WholeField(f.field))
      }
    }.distinct

  /** Which candidates cover each labeled match pair: boolean matrix
    * [match pair][candidate]. Column predicates evaluate as
    * `arrays_overlap` expressions; index predicates are fitted over the
    * corpus values UNION the pair values (the reference indexes training
    * records too) and joined in as l/r key arrays — still one collect.
    */
  def coverage(
      matchPairs: DataFrame, // l_<field>/r_<field> columns, label == 1.0
      cands: Seq[Predicate],
      records: DataFrame): Array[Array[Boolean]] = {
    var df = matchPairs
    cands.zipWithIndex.foreach {
      case (p: IndexPredicate, i) =>
        def vals(frame: DataFrame, c: String) =
          frame.select(col(c).as("value"))
            .where(col("value").isNotNull && col("value") =!= "")
        val pairValues = vals(matchPairs, s"l_${p.field}")
          .union(vals(matchPairs, s"r_${p.field}"))
          .distinct()
        // Fit on the full corpus (idf / canopy neighborhoods need every
        // value) but keep only the pair values' rows: the coverage join
        // never reads corpus-only rows, and this bounds the broadcast by
        // the training-file size instead of the corpus size.
        val indexed = p.keysByValue(
          vals(records, p.field).union(pairValues).distinct())
          .join(broadcast(pairValues), "value")
        def attach(side: String) = broadcast(indexed.select(
          col("value").as(s"${side}v$i"), col("keys").as(s"${side}k$i")))
        df = df
          .join(attach("l"), col(s"l_${p.field}") === col(s"lv$i"),
            "left_outer")
          .join(attach("r"), col(s"r_${p.field}") === col(s"rv$i"),
            "left_outer")
      case _ => ()
    }
    val overlapCols = cands.zipWithIndex.map {
      case (p: ColumnPredicate, i) =>
        arrays_overlap(p.keys(col(s"l_${p.field}")),
          p.keys(col(s"r_${p.field}"))).as(s"c$i")
      case (_: IndexPredicate, i) =>
        arrays_overlap(
          coalesce(col(s"lk$i"), array().cast("array<string>")),
          coalesce(col(s"rk$i"), array().cast("array<string>"))).as(s"c$i")
    }
    df.select(overlapCols: _*).collect().map { r =>
      Array.tabulate(cands.length)(i => !r.isNullAt(i) && r.getBoolean(i))
    }
  }

  /** Within-block comparison count each candidate would admit on the
    * records, one Spark job: explode every candidate's keys tagged by
    * candidate index, count per (tag, key), sum c·(c−1)/2. Index
    * candidates contribute their fitted value→keys join.
    */
  def costs(
      records: DataFrame,
      cands: Seq[Predicate],
      maxBlockSize: Long): Array[Double] = {
    val tagged = cands.zipWithIndex.map {
      case (p: ColumnPredicate, i) =>
        records.select(lit(i).as("cand"),
          explode(p.keys(col(p.field))).as("key"))
      case (p: IndexPredicate, i) =>
        val vals = records.select(col(p.field).as("value"))
          .where(col("value").isNotNull && col("value") =!= "").distinct()
        records.select(col(p.field).as("value"))
          .join(p.keysByValue(vals), "value")
          .select(lit(i).as("cand"), explode(col("keys")).as("key"))
    }.reduce(_ unionByName _)
    val rows = tagged.groupBy("cand", "key").count()
      .where(col("count") > 1 && col("count") <= maxBlockSize)
      .groupBy("cand")
      .agg(sum(col("count") * (col("count") - 1) / 2).as("pairs"))
      .collect()
    val out = Array.fill(cands.length)(0.0)
    rows.foreach(r => out(r.getInt(0)) = r.getDouble(1))
    out
  }

  /** Greedy weighted set cover: repeatedly pick the candidate with the
    * best (newly covered pairs) / (comparison cost) ratio until coverage
    * ≥ recall × |matches| or no candidate adds coverage. Deterministic:
    * ties break to the lower candidate index.
    */
  def learn(
      records: DataFrame,
      matchPairs: DataFrame,
      cfg: DedupeConfig): Seq[Predicate] = {
    val cands = candidates(cfg)
    val cover = coverage(matchPairs.where(col("label") === 1.0), cands,
      records)
    val cost = costs(records, cands, cfg.maxBlockSize.toLong)
    val nMatches = cover.length
    if (nMatches == 0) return Nil
    val target = math.ceil(cfg.recall * nMatches).toLong

    val covered = Array.fill(nMatches)(false)
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
    var total = 0L
    var progress = true
    while (total < target && progress) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < cands.length) {
        if (!chosen.contains(i)) {
          var gain = 0
          var m = 0
          while (m < nMatches) {
            if (!covered(m) && cover(m)(i)) gain += 1
            m += 1
          }
          // +1 smoothing: a zero-cost predicate with positive gain wins.
          val score = gain / (cost(i) + 1.0)
          if (gain > 0 && score > bestScore) { bestScore = score; best = i }
        }
        i += 1
      }
      if (best < 0) progress = false
      else {
        chosen += best
        var m = 0
        while (m < nMatches) {
          if (!covered(m) && cover(m)(best)) { covered(m) = true; total += 1 }
          m += 1
        }
      }
    }
    chosen.map(cands(_)).toSeq
  }
}
