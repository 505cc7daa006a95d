package graft.text

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Subword BPE tokenization (Sennrich et al. 2016) — the trainer-prep
  * operator q69's whitespace vocabulary stops short of: learn a merge
  * table from the corpus, then encode documents into subword pieces.
  * Harness extension (the reference has no tokenizer surface).
  *
  * '''Grain.''' Words are whitespace tokens; symbols start as the
  * word's codepoints (`split(w, "")` — an empty word is ONE empty
  * symbol, the corpus family's empty-token grain) and merges never
  * cross a word boundary. One merge step is one LEFT-TO-RIGHT greedy
  * pass: adjacent pair `(l, r)` collapses to `l+r`, and the collapsed
  * symbol immediately becomes the left operand at the next position
  * (`a a a a` → `aa aa` under `(a, a)`), the classic semantics —
  * stated identically by [[graft.functions.BpeEncode]] (compiled
  * per-row encode), [[mergePassCol]] (the higher-order-function column
  * twin the learner's rewrite uses), and the DuckDB oracle's
  * `list_reduce` chain (q73/q74); BpeSpec pins them bit-equal.
  *
  * '''Scale shape.''' Learning runs on the DISTINCT-WORD table — one
  * `(word, count)` aggregation of the corpus (map-side partial, the
  * only pass that ever sees the text), after which every iteration
  * touches vocabulary-sized data only: one narrow
  * `(pair, weighted count)` partial aggregation + a 1-row
  * TakeOrdered collect for the argmax (count DESC, pair ASC — the
  * deterministic q69/q70 tie-break), and one per-row symbol rewrite.
  * The evolving word table is `localCheckpoint`ed each iteration so
  * the plan stays ONE rewrite deep instead of K (on a multi-tenant
  * cluster prefer `spark.sparkContext.setCheckpointDir` + reliable
  * checkpoints every ~20 iterations; the table is vocabulary-sized
  * either way, megabytes at web scale). Words reduced to one symbol
  * can never merge again and are pruned as they appear. The driver
  * holds K merge rows and a 1-row argmax per iteration — never the
  * corpus, never the vocabulary.
  *
  * Encoding is pure per-row compute: the merge table compiles into a
  * single codegen'd expression ([[graft.functions.BpeEncode]]) — zero
  * shuffle, zero join, streaming-safe unchanged, and the document text
  * never enters any exchange (plan-gated in BpeSpec).
  */
object Bpe {

  /** One learned merge: rank is 1-based application order. */
  final case class Merge(rank: Int, l: String, r: String, pairCount: Long)

  /** One left-to-right greedy merge pass of `(l, r)` over a symbol
    * array, as a pure column program (higher-order `aggregate` — no
    * UDF): the learner's rewrite and the spec-level twin of
    * [[graft.functions.BpeEncode]]'s compiled pass.
    */
  def mergePassCol(syms: Column, l: Column, r: Column): Column =
    when(size(syms) < 2, syms).otherwise(
      aggregate(syms, array().cast("array<string>"),
        (acc, x) => when(size(acc) > 0 &&
            element_at(acc, -1) === l && x === r,
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), x))))
          .otherwise(concat(acc, array(x)))))

  /** Learn `numMerges` BPE merges from the corpus. Stops early when no
    * remaining adjacent pair reaches `minPairCount` (total occurrences
    * across the corpus, weighted by word frequency). Deterministic: the
    * argmax tie-break is (count DESC, l ASC, r ASC).
    */
  def learnBpe(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges $numMerges")
    require(minPairCount >= 1L, s"minPairCount $minPairCount")
    // The corpus-sized pass: distinct words + counts, symbolized.
    // Single-symbol words can never merge — pruned here and per pass.
    var words = docs
      .where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("_w"))
      .groupBy("_w").agg(count(lit(1)).as("_n"))
      .select(split(col("_w"), "").as("_syms"), col("_n"))
      .where(size(col("_syms")) >= 2)
      .localCheckpoint()
    val out = ArrayBuffer.empty[Merge]
    var k = 1
    var done = false
    while (k <= numMerges && !done) {
      val best = words
        .select(explode(transform(
          sequence(lit(1), size(col("_syms")) - 1),
          i => struct(element_at(col("_syms"), i).as("_l"),
            element_at(col("_syms"), i + 1).as("_r")))).as("_p"),
          col("_n"))
        .groupBy(col("_p._l").as("_l"), col("_p._r").as("_r"))
        .agg(sum(col("_n")).as("_t"))
        .orderBy(col("_t").desc, col("_l"), col("_r"))
        .limit(1)
        .collect()
      if (best.isEmpty || best(0).getLong(2) < minPairCount) done = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        out += Merge(k, l, r, best(0).getLong(2))
        // Dropping the previous iteration's handle releases its
        // local-checkpoint blocks via the ContextCleaner on GC (a
        // localCheckpoint has no explicit unpersist); the live set is
        // therefore ~one vocabulary-sized table at a time.
        words = words
          .select(mergePassCol(col("_syms"), lit(l), lit(r)).as("_syms"),
            col("_n"))
          .where(size(col("_syms")) >= 2)
          .localCheckpoint()
        k += 1
      }
    }
    out.toSeq
  }

  /** The learned merge table as a (driver-local, K-row) DataFrame —
    * the artifact a trainer ships alongside the encoded corpus:
    * `(merge_rank INT, lhs, rhs, pair_count BIGINT)` in application
    * order.
    */
  def mergesToDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.l, m.r, m.pairCount))
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** Persist a learned merge table as a parquet artifact — the
    * tokenizer a trainer ships alongside its data (the
    * [[graft.model.Settings]] discipline at the tokenizer grain).
    * Written via [[mergesToDf]]'s schema; rank order is the contract.
    */
  def saveMerges(spark: SparkSession, path: String,
      merges: Seq[Merge]): Unit =
    mergesToDf(spark, merges).repartition(1)
      .write.mode("overwrite").parquet(path)

  /** Load a [[saveMerges]] artifact back, in rank order. Fails loudly
    * on a rank sequence with gaps or duplicates — a corrupt artifact
    * must not silently re-rank the tokenizer.
    */
  def loadMerges(spark: SparkSession, path: String): Seq[Merge] = {
    val rows = spark.read.parquet(path)
      .select(col("merge_rank"), col("lhs"), col("rhs"),
        col("pair_count"))
      .orderBy("merge_rank")
      .collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
      .toSeq
    require(rows.map(_.rank) == (1 to rows.size),
      s"merge artifact at $path has a corrupt rank sequence: " +
        rows.map(_.rank).mkString(","))
    rows
  }

  /** Deterministic MD5 of a merge table's semantic content (ranked
    * pairs — counts excluded: two corpora learning the same merges in
    * the same order ARE the same tokenizer). The tokenizer twin of the
    * model-definition hash (P9): encode artifacts stamped with it are
    * mutually compatible iff the hashes match. The canonical form
    * LENGTH-PREFIXES each symbol, so it is injective for ANY symbol
    * content — learnBpe splits only on single spaces, so symbols can
    * legitimately contain newlines/tabs, and a separator-based form
    * would let two distinct tables collide.
    */
  def mergesHash(merges: Seq[Merge]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val canonical = merges
      .map(m => s"${m.rank}|${m.l.length}:${m.l}|${m.r.length}:${m.r}")
      .mkString("\n")
    md.digest(canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Encode documents into BPE pieces with a fixed merge table:
    * `(idCol, pieces ARRAY<STRING>, n_pieces BIGINT)`. Pieces are the
    * per-word symbol arrays flattened in word order (merges never
    * cross word boundaries). Pure per-row compute — the merge table
    * compiles into one codegen'd expression per word, zero shuffle,
    * streaming-safe unchanged. Docs with a null id or null text are
    * excluded; an empty text is one empty word → one empty piece (the
    * family grain).
    */
  def encodeBpe(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String, textCol: String): DataFrame = {
    require(merges.nonEmpty, "empty merge table — encode is split(text)")
    docs
      .where(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol),
        flatten(transform(split(col(textCol), " "),
          w => graft.functions.GraftFunctions.bpeEncode(w, merges)))
          .as("pieces"))
      .select(col(idCol), col("pieces"),
        size(col("pieces")).cast("long").as("n_pieces"))
  }
}
