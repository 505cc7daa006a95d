package graft.text

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q72 `bigramLmScore`: hand-computed MLE bigram probabilities with
  * the exact-quantized-sum arithmetic, unscoreable short docs, null
  * exclusion, fixture sanity, and the plan shape (no cartesian/UDF,
  * text never shuffled).
  */
class BigramLmSpec extends SparkSpec {

  test("bigramLmScore: hand-computed MLE probabilities, exact " +
      "quantized mean, NULL score for short docs, null id/text " +
      "excluded") {
    import spark.implicits._
    // Corpus bigrams: d1 (a,b)(b,a)(a,c), d2 (a,b)(b,b).
    // c2: (a,b)=2 (b,a)=1 (a,c)=1 (b,b)=1; prefix c1: a=3, b=2.
    // p: (a,b)=2/3 (b,a)=1/2 (a,c)=1/3 (b,b)=1/2; quantized:
    // 666666667, 500000000, 333333333, 500000000.
    val docs = Seq[(Option[Long], String)](
      (Some(1L), "a b a c"),
      (Some(2L), "a b b"),
      (Some(3L), "x"),  // one token: 0 bigrams, NULL score
      (Some(4L), ""),   // empty text = ONE empty token: same
      (Some(5L), null),
      (None, "y y")).toDF("doc_id", "text")
    val out = CorpusOps.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      (1L, 3L, Some(1500000000d / 3000000000d)),  // = 0.5
      (2L, 2L, Some(1166666667d / 2000000000d)),
      (3L, 0L, None),
      (4L, 0L, None)), out.toString)
    intercept[IllegalArgumentException] {
      CorpusOps.bigramLmScore(docs.withColumn("_w1", lit(1)),
        "doc_id", "text")
    }
    ()
  }

  test("bigramLmScore on the fixture: every doc scored (all have " +
      ">= 2 tokens), scores in (0, 1], and a repeated-text doc " +
      "scores higher than the corpus mean") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val rows = CorpusOps.bigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(rows.size == 500)
    assert(rows.forall(_._2 >= 1), "fixture docs all have bigrams")
    val scores = rows.flatMap(_._3)
    assert(scores.size == 500 &&
      scores.forall(s => s > 0.0 && s <= 1.0), "MLE means live in (0,1]")
    // The LM-filter signal direction: a maximally-predictable doc
    // (one bigram repeated) added to the corpus scores above the
    // fixture mean, because its bigrams are its own evidence.
    val spiked = docs.select(col("doc_id"), col("text"))
      .union(Seq((999999L, Array.fill(50)("zq zz").mkString(" ")))
        .toDF("doc_id", "text"))
    val spikedScore = CorpusOps.bigramLmScore(spiked, "doc_id", "text")
      .where(col("doc_id") === 999999L)
      .as[(Long, Long, Option[Double])].head()._3.get
    val mean = scores.sum / scores.size
    assert(spikedScore > mean,
      s"repeated text should out-predict the mean: $spikedScore vs $mean")
  }

  test("bigramLmScore plan: no cartesian, no UDF, no window, and the " +
      "document text never enters a shuffle") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val out = CorpusOps.bigramLmScore(docs, "doc_id", "text")
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan
    val ps = plan.toString
    assert(!ps.contains("CartesianProduct") &&
      !ps.contains("BroadcastNestedLoop") && !ps.contains("ScalaUDF") &&
      !ps.contains("Window"), ps)
    planNodes(plan).collect { case s: ShuffleExchangeExec => s }
      .foreach { s =>
        assert(!s.child.output.exists(_.name == "text"),
          s"the document text is being SHUFFLED:\n$ps")
      }
  }
}
