package graft

import org.apache.spark.sql.functions._

/** The synthesis invariants SCALE_r16.json's validity rests on: if any
  * of these drift, the measured scale slopes stop being attributable to
  * the engine (see ScaleBench's class doc for the reasoning).
  */
class ScaleCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("document replication preserves per-replica structure with zero " +
      "cross-replica token overlap and unique ids") {
    val base = Tables.load(spark, sf0001, "documents")
    val n = base.count()
    val rep = ScaleBench.replicateDocuments(spark, sf0001, factor = 3)
    assert(rep.count() == 3 * n)
    assert(rep.select("doc_id").distinct().count() == 3 * n)
    // Replica 0 is the base corpus verbatim.
    val r0 = rep.where(col("doc_id") < n).select("doc_id", "text")
    assert(r0.exceptAll(base.select("doc_id", "text")).count() == 0)
    // Token vocabularies are pairwise DISJOINT across replicas — the
    // property that makes true candidate volume scale exactly linearly.
    val vocab = rep
      .withColumn("replica", (col("doc_id") / n).cast("int"))
      .select(col("replica"), explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(countDistinct("replica").as("nr"))
    assert(vocab.where(col("nr") > 1).count() == 0,
      "a token appears in more than one replica")
    // Within-replica dup structure is EXACT: replica 2's distinct-text
    // count equals the base corpus's.
    val baseDistinct = base.select("text").distinct().count()
    val r2Distinct = rep.where(col("doc_id") >= 2 * n)
      .select("text").distinct().count()
    assert(r2Distinct == baseDistinct)
  }

  test("customer replication offsets keys uniquely and keeps every " +
      "other column") {
    val base = Tables.load(spark, sf0001, "customer")
    val n = base.count()
    val rep = ScaleBench.replicateCustomer(spark, sf0001, factor = 3)
    assert(rep.count() == 3 * n)
    assert(rep.select("c_custkey").distinct().count() == 3 * n)
    assert(rep.columns.toSeq == base.columns.toSeq)
    assert(rep.agg(max("c_custkey")).head().getLong(0) ==
      base.agg(max("c_custkey")).head().getLong(0) + 2 * n)
  }

  test("generated embeddings plant exactly n/5 near-dups above 0.85 " +
      "and nothing else, deterministically") {
    val n = 500
    val emb = ScaleBench.genEmbeddings(spark, n, seed = 20260813L)
    assert(emb.count() == n)
    val rows = emb.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum // unit vectors
    // Planted pairs: (id-1, id) for id % 5 == 4, all above threshold.
    val planted = (0L until n).filter(_ % 5 == 4)
    assert(planted.forall(id => cos(rows(id - 1), rows(id)) > 0.85))
    // No other pair crosses it (the random tail at 0.85 is ~6.8 sigma).
    val ids = (0L until n).toArray
    var spurious = 0
    for (i <- ids; j <- ids if i < j && !(j == i + 1 && j % 5 == 4))
      if (cos(rows(i), rows(j)) > 0.85) spurious += 1
    assert(spurious == 0, s"$spurious spurious pairs above 0.85")
    // Deterministic: regeneration is bit-identical.
    val again = ScaleBench.genEmbeddings(spark, n, seed = 20260813L)
      .as[(Long, Array[Float])].collect().toMap
    assert(ids.forall(id => rows(id).sameElements(again(id))))
  }
}
