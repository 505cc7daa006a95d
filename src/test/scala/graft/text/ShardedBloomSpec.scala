package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for [[CorpusOps.dedupAgainstPartitioned]] — the beyond-driver-
  * Bloom sharded mode — and its two building blocks (the per-bucket
  * BloomAggregator build, the codegen'd sharded membership probe).
  */
class ShardedBloomSpec extends SparkSpec {
  import spark.implicits._

  test("dedupAgainstPartitioned equals the driver-Bloom mode and the " +
      "bare anti-join on the fixture re-crawl split") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val incoming = docs.where(col("doc_id") % 10 >= 4)
    val historical = docs.where(col("doc_id") % 10 < 6)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet
    val driver = ids(CorpusOps.dedupAgainst(incoming, historical, "text",
      expectedItems = 1000L))
    val bare = ids(CorpusOps.dedupAgainst(incoming, historical, "text",
      expectedItems = 1000L, prefilter = false))
    Seq(1, 7, 64).foreach { nBuckets =>
      val sharded = ids(CorpusOps.dedupAgainstPartitioned(
        incoming, historical, "text", nBuckets,
        expectedItemsPerBucket = math.max(1000L / nBuckets, 16L)))
      assert(sharded == driver && sharded == bare,
        s"nBuckets=$nBuckets diverged: sharded ${sharded.size}, " +
          s"driver ${driver.size}, bare ${bare.size}")
    }
  }

  test("sharded confirm mode never keeps a duplicate on a 60%-dup " +
      "batch; Bloom-only drops at most ~fpp of the new rows; empty " +
      "buckets pass their rows through") {
    val historical = (0L until 2000L).map(i => (i, s"hist doc $i"))
      .toDF("doc_id", "text")
    val dup = (0L until 600L).map(i => (10000L + i, s"hist doc $i"))
    val fresh = (0L until 400L).map(i => (20000L + i, s"fresh doc $i"))
    val incoming = (dup ++ fresh).toDF("doc_id", "text")
    val confirmed = CorpusOps.dedupAgainstPartitioned(
        incoming, historical, "text", nBuckets = 16,
        expectedItemsPerBucket = 128L, fpp = 0.01)
      .select("doc_id").as[Long].collect().toSet
    assert(confirmed.forall(_ >= 20000L), "a true duplicate survived")
    assert(confirmed.size == 400, s"confirm mode lost ${
      400 - confirmed.size} genuinely-new rows (must be exact)")
    val bloomOnly = CorpusOps.dedupAgainstPartitioned(
        incoming, historical, "text", nBuckets = 16,
        expectedItemsPerBucket = 128L, fpp = 0.01, confirm = false)
      .select("doc_id").as[Long].collect().toSet
    assert(bloomOnly.forall(_ >= 20000L),
      "Bloom-only must have NO false negatives (no surviving dup)")
    assert(bloomOnly.size >= 380,
      s"Bloom-only dropped ${400 - bloomOnly.size} of 400 new rows — " +
        "far beyond the 1% fpp")
    // Empty buckets: a history so small most of 64 buckets hold
    // nothing — rows hashing to empty buckets must all survive.
    val tinyHist = Seq((1L, "only doc")).toDF("doc_id", "text")
    val out = CorpusOps.dedupAgainstPartitioned(
        incoming, tinyHist, "text", nBuckets = 64,
        expectedItemsPerBucket = 4L)
      .count()
    assert(out == incoming.count(), s"empty-bucket rows vanished: $out")
  }

  test("sharded mode keeps null-text rows and within-batch duplicates " +
      "in both modes; guards refuse bad sizing and column collisions") {
    val historical = Seq((1L, "seen")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, null.asInstanceOf[String]), (11L, null.asInstanceOf[String]),
      (12L, "twin"), (13L, "twin"), (14L, "seen")
    ).toDF("doc_id", "text")
    Seq(true, false).foreach { confirm =>
      val kept = CorpusOps.dedupAgainstPartitioned(
          incoming, historical, "text", nBuckets = 4,
          expectedItemsPerBucket = 8L, confirm = confirm)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(10L, 11L, 12L, 13L),
        s"confirm=$confirm kept $kept")
    }
    intercept[IllegalArgumentException] {
      CorpusOps.dedupAgainstPartitioned(incoming, historical, "text",
        nBuckets = 0, expectedItemsPerBucket = 8L)
    }
    intercept[IllegalArgumentException] {
      CorpusOps.dedupAgainstPartitioned(incoming, historical, "text",
        nBuckets = 4, expectedItemsPerBucket = 0L)
    }
    intercept[IllegalArgumentException] {
      CorpusOps.dedupAgainstPartitioned(
        incoming.withColumn("_graft_dedup_bucket", lit(1)),
        historical, "text", 4, 8L)
    }
  }

  test("sharded probe plans the codegen'd expression (no ScalaUDF on " +
      "the probe path) and exactly one LeftAnti under the union") {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val incoming = docs.where(col("doc_id") % 10 >= 4)
    val historical = docs.where(col("doc_id") % 10 < 6)
    val out = CorpusOps.dedupAgainstPartitioned(
      incoming, historical, "text", nBuckets = 8,
      expectedItemsPerBucket = 64L)
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan
    val ps = plan.toString
    assert(ps.contains("sharded_bloom_might_contain"),
      s"probe expression missing from the plan:\n$ps")
    assert(!ps.contains("ScalaUDF"),
      s"sharded probe must not plan a ScalaUDF:\n$ps")
    // Joins: the probe equi-join appears in BOTH union branches (the
    // two branches each contain the probed subtree) plus exactly one
    // LeftAnti confirm.
    val joins = planNodes(plan).collect { case j: BaseJoinExec => j }
    assert(joins.count(_.joinType ==
        org.apache.spark.sql.catalyst.plans.LeftAnti) == 1,
      s"want exactly one LeftAnti confirm:\n$ps")
    // The BloomAggregator build aggregates per bucket (an
    // ObjectHashAggregate/SortAggregate over the typed buffer).
    assert(ps.contains("bloomaggregator") ||
        ps.toLowerCase.contains("bloomagg"),
      s"per-bucket Bloom build missing from the plan:\n$ps")
  }
}
