package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Gates the bucketed-storage co-location contract (Tables.sinkBucketed /
  * loadTable, demoed by q28): two tables bucketed on their join key at
  * write time must sort-merge-join with ZERO Exchange in the plan — the
  * shuffle is paid once in storage, not per query. At 100 TB this is the
  * difference between every fact⋈dim query re-shuffling both sides and
  * none of them shuffling at all.
  */
class BucketedJoinSpec extends SparkSpec {

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("bucketed tables join with zero Exchange and match the plain join") {
    val wh = java.nio.file.Files
      .createTempDirectory("graft_bucketed_spec").toString
    val customer = Tables.load(spark, sf0001, "customer")
    val orders   = Tables.load(spark, sf0001, "orders")
    Tables.sinkBucketed(customer, "customer_bkt_spec",
      s"$wh/customer_bkt_spec", 8, "c_custkey", "c_custkey")
    Tables.sinkBucketed(orders, "orders_bkt_spec",
      s"$wh/orders_bkt_spec", 8, "o_custkey", "o_custkey")

    // Broadcast would hide the property under a BroadcastExchange (and
    // sf0.001 customer is broadcast-sized), so force the sort-merge path
    // the join would take at scale.
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val joined = Tables.loadTable(spark, "customer_bkt_spec")
        .join(Tables.loadTable(spark, "orders_bkt_spec"),
          col("c_custkey") === col("o_custkey"))
        .select("c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a sort-merge join over bucketed scans:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed co-located join must not shuffle either side:\n$plan")

      // Same answer as the plain (unbucketed) join of the source frames.
      val expected = customer.join(orders,
          col("c_custkey") === col("o_custkey"))
        .select("c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice")
      assert(joined.count() === expected.count())
      assert(joined.exceptAll(expected).isEmpty &&
        expected.exceptAll(joined).isEmpty,
        "bucketed join answer diverged from the plain join")
    }

    spark.sql("DROP TABLE IF EXISTS customer_bkt_spec")
    spark.sql("DROP TABLE IF EXISTS orders_bkt_spec")
  }

  test("bucketed groupBy on the bucket key needs no Exchange either") {
    // Aggregation on the bucket column reuses the storage partitioning
    // too — partial+final agg collapse into one stage per bucket.
    val wh = java.nio.file.Files
      .createTempDirectory("graft_bucketed_spec_agg").toString
    Tables.sinkBucketed(Tables.load(spark, sf0001, "orders"),
      "orders_bkt_agg_spec", s"$wh/orders_bkt_agg_spec",
      8, "o_custkey", "o_custkey")
    val agg = Tables.loadTable(spark, "orders_bkt_agg_spec")
      .groupBy("o_custkey")
      .agg(sum("o_totalprice").as("spend"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"groupBy on the bucket key must reuse storage partitioning:\n$plan")
    // Answer parity with the unbucketed aggregation.
    val expected = Tables.load(spark, sf0001, "orders")
      .groupBy("o_custkey").agg(sum("o_totalprice").as("spend"))
    assert(agg.exceptAll(expected).isEmpty &&
      expected.exceptAll(agg).isEmpty)
    spark.sql("DROP TABLE IF EXISTS orders_bkt_agg_spec")
  }

  test("dedupAgainst confirm against a text-bucketed history plans the " +
      "history side with zero Exchange") {
    // The q62 scaladoc's 100 TB claim, gated: when the historical
    // corpus is stored text-bucketed (the shuffle paid once at
    // ingest), the exact-confirm anti-join re-shuffles ONLY the
    // Bloom-positive sliver of the batch — the history side reads
    // straight from its buckets.
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val wh = java.nio.file.Files
      .createTempDirectory("graft_bucketed_dedup_spec").toString
    val docs = Tables.load(spark, sf0001, "documents")
    val histSlice = docs.where(col("doc_id") % 10 < 6)
    Tables.sinkBucketed(histSlice, "hist_bkt_spec",
      s"$wh/hist_bkt_spec", 8, "text", "text")
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val incoming = docs.where(col("doc_id") % 10 >= 4)
      val out = graft.text.CorpusOps.dedupAgainst(
        incoming, Tables.loadTable(spark, "hist_bkt_spec"), "text",
        expectedItems = 10000L, fpp = 0.01)
      out.queryExecution.toRdd.count() // finalize AQE
      val joins = planNodes(out.queryExecution.executedPlan)
        .collect { case j: BaseJoinExec => j }
      assert(joins.length == 1, s"want the one confirm join:\n$joins")
      val right = planNodes(joins.head.right)
      assert(!right.exists(_.nodeName.contains("Exchange")),
        s"bucketed history side still shuffles for the confirm:\n" +
          joins.head.right)
      assert(right.map(_.toString).exists(s =>
          s.contains("SelectedBucketsCount") || s.contains("Bucketed: true")),
        s"confirm right side is not the bucketed scan:\n${joins.head.right}")
      // Answer parity with the plain (unbucketed) history frame.
      val expected = graft.text.CorpusOps.dedupAgainst(
        incoming, histSlice, "text", expectedItems = 10000L, fpp = 0.01)
      assert(out.select("doc_id").exceptAll(expected.select("doc_id"))
          .isEmpty &&
        expected.select("doc_id").exceptAll(out.select("doc_id")).isEmpty,
        "bucketed-history answer diverged from the plain history")
    }
    spark.sql("DROP TABLE IF EXISTS hist_bkt_spec")
  }
}
