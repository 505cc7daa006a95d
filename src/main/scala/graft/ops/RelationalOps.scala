package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference's relational pipeline stages as pure DataFrame => DataFrame
  * functions (ref: SURVEY.md §2 / pgdedupe/run.py). Each stage is
  * individually testable (ref: tests/test_reproducibility.py:10 imports the
  * phases directly — the phases ARE the public API, SURVEY.md §3.3).
  */
object RelationalOps {

  /** Dense 1-based surrogate ids in the given total order, without the
    * single-task bottleneck of `row_number()` over an unpartitioned
    * Window: range-repartition + in-partition sort yields the same total
    * order across ordered partitions, then `zipWithIndex` assigns global
    * offsets with O(#partitions) driver work. Equivalent to
    * `row_number() OVER (ORDER BY order...)` whenever the order keys are
    * unique (true for every caller: group-by tuples / distinct keys), and
    * every stage runs on all executors. Partition boundaries come from
    * sampling, but with unique keys they only move rows between ordered
    * partitions — the assigned ids are a pure function of the sort order,
    * so runs are deterministic (reproducibility gate, SURVEY §7.4).
    */
  def denseIds(df: DataFrame, order: Seq[Column], idName: String): DataFrame = {
    val spark = df.sparkSession
    // The `.rdd` seam below deliberately ends Catalyst's view of the plan:
    // AQE + whole-stage codegen cover the upstream exchange and sort, and
    // the numbering needs a FIXED partitioning underneath zipWithIndex
    // (AQE re-planning between the count job and a consumer would shift
    // ids). The seam is materialized ONCE — zipWithIndex's eager
    // per-partition count job computes the exchange, and every downstream
    // action reuses its shuffle files (Spark keeps shuffle output of a
    // live RDD), so no persist handle is needed here. An earlier revision
    // pinned the sorted frame MEMORY_AND_DISK and never released it — a
    // session-lifetime storage leak; the only repeated work without the
    // cache is the in-partition sort above the reused shuffle files.
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(idName, LongType, nullable = false)
    val numbered = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(numbered, schema)
  }

  /** Exact-duplicate pre-merge (A1 + P8, ref pgdedupe/run.py:91-99):
    * filter → GROUP BY all dedup fields → array_agg(key) AS src_ids →
    * dense surrogate `_unique_id`.
    *
    * The reference's SERIAL id is nondeterministic insert order; for the
    * determinism gate (ref tests/test_reproducibility.py:75) we number by
    * the sorted field tuple, which is stable across runs and partitionings
    * — via denseIds, so the sort is range-partitioned across executors
    * rather than a single-task global window.
    */
  def exactDedup(
      entries: DataFrame,
      columns: Seq[String],
      keyCol: String,
      filterCondition: String = "TRUE"): DataFrame = {
    val cols = columns.map(col)
    val grouped = entries
      .where(expr(filterCondition))
      .groupBy(cols: _*)
      .agg(sort_array(collect_list(col(keyCol))).as("src_ids"))
    denseIds(grouped, columns.map(c => col(c).asc_nulls_first), "_unique_id")
  }

  /** Singleton-block elimination + dense block ids (A2, ref
    * pgdedupe/run.py:265-275): block keys covering ≥2 records get a dense
    * `block_id`; singleton blocks admit no comparisons. Ids via denseIds
    * (partition-safe), ordered by block_key.
    */
  def pluralKeys(blockingMap: DataFrame, maxBlockSize: Long = Long.MaxValue): DataFrame = {
    val counts = blockingMap.groupBy("block_key").count()
      .where(col("count") > 1 && col("count") <= maxBlockSize)
      .select("block_key")
    denseIds(counts, Seq(col("block_key").asc), "block_id")
      .select("block_key", "block_id")
  }

  /** blocking_map ⋈ plural_key (J1, ref pgdedupe/run.py:282-285). */
  def pluralBlocks(blockingMap: DataFrame, pluralKey: DataFrame): DataFrame =
    blockingMap.join(pluralKey, "block_key").select("block_id", "_unique_id")

  /** Sorted covered-block list per record (A3, ref pgdedupe/run.py:297-303,
    * Kolb et al. redundant-free comparison scheme).
    */
  def coveredBlocks(pluralBlock: DataFrame): DataFrame =
    pluralBlock.groupBy("_unique_id")
      .agg(sort_array(collect_list("block_id")).as("sorted_ids"))

  /** smaller_coverage (J2 + P5/P6, ref pgdedupe/run.py:314-319): per
    * (record, covering block), the list of this record's block ids
    * strictly smaller than the current block. `array_position` replaces
    * the reference's custom `idx` SQL function (run.py:81-89).
    */
  def smallerCoverage(pluralBlock: DataFrame, covered: DataFrame): DataFrame =
    pluralBlock.join(covered, "_unique_id")
      .select(
        col("_unique_id"),
        col("block_id"),
        slice(
          col("sorted_ids"),
          lit(1),
          (array_position(col("sorted_ids"), col("block_id")) - 1).cast("int")
        ).as("smaller_ids"))

  /** Redundant-free within-block pair generation (J8 + D6, ref
    * pgdedupe/run.py:293-319 + candidates_gen at :325-359): self-join on
    * block_id, keep ordered pairs, and drop any pair whose smaller_ids
    * intersect — that pair is already produced by a common smaller block.
    * Faithful Kolb: no global distinct over the pair set needed, so the
    * only shuffle is the block_id join.
    */
  def kolbPairs(smallerCoverage: DataFrame): DataFrame = {
    val l = smallerCoverage.select(
      col("block_id"),
      col("_unique_id").as("l_id"),
      col("smaller_ids").as("l_smaller"))
    val r = smallerCoverage.select(
      col("block_id"),
      col("_unique_id").as("r_id"),
      col("smaller_ids").as("r_smaller"))
    l.join(r, "block_id")
      .where(col("l_id") < col("r_id"))
      .where(size(array_intersect(col("l_smaller"), col("r_smaller"))) === 0)
      .select("l_id", "r_id")
  }

  /** Simpler semantically-equivalent pair generation (SURVEY.md §4): all
    * within-block ordered pairs, deduplicated globally. One extra shuffle
    * (the distinct) but skew-robust under AQE; benchmark decides.
    */
  def distinctPairs(pluralBlock: DataFrame): DataFrame = {
    val l = pluralBlock.select(col("block_id"), col("_unique_id").as("l_id"))
    val r = pluralBlock.select(col("block_id"), col("_unique_id").as("r_id"))
    l.join(r, "block_id")
      .where(col("l_id") < col("r_id"))
      .select("l_id", "r_id")
      .distinct()
  }

  /** entity_map RIGHT JOIN entries_unique + COALESCE defaults (J4/P3, ref
    * pgdedupe/run.py:441-446): every unique record gets a canon_id
    * (itself if unclustered) and a score (1.0 for singletons).
    */
  def applyClusters(entityMap: DataFrame, entriesUnique: DataFrame): DataFrame =
    entityMap.join(entriesUnique.select("_unique_id", "src_ids"),
        Seq("_unique_id"), "right_outer")
      .select(
        coalesce(col("canon_id"), col("_unique_id")).as("dedupe_id"),
        col("_unique_id"),
        coalesce(col("cluster_score"), lit(1.0)).as("cluster_score"),
        col("src_ids"))

  /** Explode src_ids back to source-record grain (P7, ref
    * pgdedupe/run.py:473-475): `unique_map(dedupe_id, <key>)`.
    */
  def uniqueMap(mapped: DataFrame, keyCol: String): DataFrame =
    mapped.select(col("dedupe_id"),
      explode(col("src_ids")).as(keyCol), col("cluster_score"))
}
