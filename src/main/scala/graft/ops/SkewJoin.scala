package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for heavy key skew — the explicit scale tool for the
  * case AQE's skew-join split cannot reach (it only splits sort-merge
  * partitions AFTER a shuffle has already materialized the hot key into
  * one task's input, and does nothing for the downstream operators that
  * inherit the skewed partitioning).
  *
  * Shape: the fact side's HOT keys (count > hotKeyThreshold, found with
  * one aggregate) are salted into `saltFactor` sub-keys by a
  * deterministic hash of the whole row — no RNG, so the plan is
  * reproducible run-to-run; cold keys keep salt 0. The dim side
  * replicates rows `saltFactor`× for hot keys only (cold rows are not
  * replicated), and the join runs on (key, salt). Replication cost is
  * saltFactor × |dim rows on hot keys|, paid to turn one straggler task
  * into `saltFactor` even ones.
  *
  * The hot-key collect is bounded by construction — at most
  * |fact| / hotKeyThreshold keys can exceed the threshold — and guarded
  * loudly anyway (same contract as the learner's over-cap collect).
  */
object SkewJoin {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Inner equi-join of `fact` with `dim` on `key`, salt-spread over the
    * fact side's hot keys. Output columns = fact ⋈ dim as a plain inner
    * join on `key` (one shared `key` column, then fact payload, then dim
    * payload); row multiset identical to the unsalted join.
    */
  def saltedInner(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int = 16,
      hotKeyThreshold: Long = 1000000L,
      maxHotKeys: Int = 100000): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    val spark = fact.sparkSession

    // Ordered by count desc (the biggest stragglers matter most), then
    // key — so a truncation past the cap keeps a deterministic,
    // maximally useful subset instead of an arbitrary unordered limit()
    // (same contract as the learner's over-cap collect).
    val hotRows = fact.groupBy(key)
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > hotKeyThreshold)
      .orderBy(col("cnt").desc, col(key))
      .select(key)
      .limit(maxHotKeys + 1)
      .collect()
    if (hotRows.length > maxHotKeys)
      log.warn(s"more than $maxHotKeys hot keys above $hotKeyThreshold — " +
        "salting only the first; raise hotKeyThreshold")
    val hotKeys = hotRows.take(maxHotKeys).map(_.get(0)).toSeq

    if (hotKeys.isEmpty) return fact.join(dim, key)

    // Per-value lit (the keys were collected as Any; typedlit cannot
    // infer an array component type from Seq[Any]).
    val hot = array(hotKeys.map(v => lit(v)): _*)
    // Deterministic spread: hash of the whole fact row — distinct
    // payload rows of a hot key scatter across saltFactor sub-keys,
    // identically on every run.
    val factSalted = fact.withColumn("_salt",
      when(array_contains(hot, col(key)),
        pmod(hash(struct(fact.columns.map(col): _*)), lit(saltFactor)))
        .otherwise(lit(0)))
    val dimSalted = dim.withColumn("_salt",
      explode(when(array_contains(hot, col(key)),
        sequence(lit(0), lit(saltFactor - 1)))
        .otherwise(array(lit(0)))))

    factSalted.join(dimSalted, Seq(key, "_salt")).drop("_salt")
  }
}
