package graft.blocking

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skew robustness of blocking (SURVEY §7.4's "Smith problem"): one
  * ubiquitous token covering 30% of records must not send the candidate
  * generation quadratic — the df-cap drops it from the admissible block
  * set before any pair is formed. This spec FAILS if the cap is removed
  * (the hot block alone contributes >1.1M of the ~1.126M uncapped pairs).
  */
class BlockingSkewSpec extends SparkSpec {

  private val n = 5000
  private val hot = 1500 // 30% of records share the token "smith"

  /** Every record carries a pair token p<i/2> (df=2 → 2500 tight blocks
    * of exactly two records); the first 30% additionally carry the hot
    * token. */
  private def records = spark.range(n).select(
    col("id").as("_unique_id"),
    concat(when(col("id") < hot, "smith ").otherwise(""),
      lit("p"), (col("id") / 2).cast("long").cast("string")).as("name"))

  private def candidatePairs(maxDf: Long): Long = {
    val bm = Blocker.tokenBlockingWithDfCap(records, "name", maxDf)
    val l = bm.select(col("block_key"), col("_unique_id").as("l_id"))
    val r = bm.select(col("block_key"), col("_unique_id").as("r_id"))
    l.join(r, "block_key").where(col("l_id") < col("r_id"))
      .select("l_id", "r_id").distinct().count()
  }

  test("df-cap bounds candidate pairs under a pathological hot token") {
    val capped = candidatePairs(maxDf = 120)
    // Exactly the 2500 pair-token blocks survive; the hot token (df=1500
    // > 120) is inadmissible, so its C(1500,2) = 1,124,250 pairs never
    // exist. Pair count stays LINEAR in the record count.
    assert(capped == n / 2, s"expected ${n / 2} capped pairs, got $capped")
  }

  test("without the df-cap the hot token goes quadratic (the failure mode)") {
    val uncapped = candidatePairs(maxDf = Long.MaxValue)
    // C(1500,2) + 2500 pair-blocks − 750 overlaps = 1,126,000: what the
    // cap is protecting against. Documented here so the magnitude of the
    // blow-up is measured, not asserted by construction.
    assert(uncapped == 1126000L, s"got $uncapped")
    assert(uncapped > 200L * (n / 2),
      "hot-token block no longer dominates — test data broken")
  }

  test("pluralKeys maxBlockSize caps oversized blocks the same way") {
    val bm = Blocker.tokenBlockingWithDfCap(records, "name", Long.MaxValue)
    val pk = graft.ops.RelationalOps.pluralKeys(bm, maxBlockSize = 120)
    val admitted = pk.count()
    // 2500 pair blocks admitted; the smith block (1500 members) is not.
    assert(admitted == n / 2, s"expected ${n / 2} plural keys, got $admitted")
  }
}
