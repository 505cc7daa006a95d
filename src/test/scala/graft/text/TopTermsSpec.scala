package graft.text

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q70 `topTerms`: hand-computed linear-idf scores with a tie, k-cut
  * behavior, null/empty handling, equality with the window-ranked twin
  * on the fixture, and the plan shape (no window, narrow shuffles, no
  * cartesian/UDF).
  */
class TopTermsSpec extends SparkSpec {

  test("topTerms ranks by tf/df desc with term-ASC tie-break, cuts at " +
      "k, keeps short docs' partial lists, and excludes null id/text") {
    import spark.implicits._
    val docs = Seq[(Option[Long], String)](
      (Some(1L), "x x y"),
      (Some(2L), "x z"),
      (Some(3L), "y y"),
      (Some(4L), "a b"), // both score 1.0 — the tie-break decides
      (Some(5L), null),
      (None, "zz zz")).toDF("doc_id", "text")
    val out = CorpusOps.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Double, Int)].collect().toSeq
    // df: x→2 docs, y→2, z→1, a→1, b→1 (the null-id doc is excluded
    // BEFORE counting, unlike buildVocab's id-blind counts — df is a
    // per-document statistic, so undocumented rows can't contribute).
    assert(out == Seq(
      (1L, "x", 2L, 1.0, 1), (1L, "y", 1L, 0.5, 2),
      (2L, "z", 1L, 1.0, 1), (2L, "x", 1L, 0.5, 2),
      (3L, "y", 2L, 1.0, 1),
      (4L, "a", 1L, 1.0, 1), (4L, "b", 1L, 1.0, 2)), out.toString)
    // k = 1 keeps exactly the winners.
    val top1 = CorpusOps.topTerms(docs, "doc_id", "text", k = 1)
      .select("doc_id", "term")
      .as[(Long, String)].collect().toSet
    assert(top1 == Set((1L, "x"), (2L, "z"), (3L, "y"), (4L, "a")))
    // Empty text is ONE empty token (family grain): it scores and can
    // rank like any term.
    val withEmpty = Seq((10L, ""), (11L, "w")).toDF("doc_id", "text")
    val e = CorpusOps.topTerms(withEmpty, "doc_id", "text", k = 3)
      .select("doc_id", "term", "score")
      .as[(Long, String, Double)].collect().toSet
    assert(e == Set((10L, "", 1.0), (11L, "w", 1.0)), e.toString)
    intercept[IllegalArgumentException] {
      CorpusOps.topTerms(docs, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      CorpusOps.topTerms(docs.withColumn("_term", lit(1)), "doc_id",
        "text", k = 2)
    }
    ()
  }

  test("topTerms equals the row_number-window twin on the fixture") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val ours = CorpusOps.topTerms(docs, "doc_id", "text", k = 3)
      .as[(Long, String, Long, Double, Int)].collect().toSet
    val tok = docs
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
    val twin = tf.join(dfreq, "term")
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf").cast("double") / col("df")).as("score"))
      .withColumn("rank", row_number().over(Window
        .partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))))
      .where(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("score"),
        col("rank").cast("int"))
      .as[(Long, String, Long, Double, Int)].collect().toSet
    assert(ours == twin)
    assert(ours.size == 1500, s"500 fixture docs x k=3: ${ours.size}")
  }

  test("topTerms plan: no window, no cartesian, no UDF, and the text " +
      "never enters a shuffle") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val out = CorpusOps.topTerms(docs, "doc_id", "text", k = 3)
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan
    val ps = plan.toString
    assert(!ps.contains("CartesianProduct") &&
      !ps.contains("BroadcastNestedLoop") && !ps.contains("ScalaUDF"),
      ps)
    assert(!planNodes(plan).exists(_.isInstanceOf[WindowExec]),
      s"top-k must not plan a window:\n$ps")
    planNodes(plan).collect { case s: ShuffleExchangeExec => s }
      .foreach { s =>
        assert(!s.child.output.exists(_.name == "text"),
          s"the document text is being SHUFFLED:\n$ps")
      }
  }
}
