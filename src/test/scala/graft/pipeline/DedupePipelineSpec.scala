package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.{DedupeConfig, FieldSpec}
import graft.testgen.FakePersons

/** Mirrors the reference's integration + reproducibility gates
  * (ref: tests/test_integration.py:27-30 — a 2,000-person population must
  * resolve to < 4,000 distinct entities; tests/test_reproducibility.py:75
  * — identical clusters across same-seed runs).
  */
class DedupePipelineSpec extends SparkSpec {

  private val cfg = DedupeConfig(
    key = "entry_id",
    fields = Seq(
      FieldSpec("first_name", "String"),
      FieldSpec("last_name", "String"),
      FieldSpec("ssn", "String", hasMissing = true),
      FieldSpec("sex", "Categorical", Seq("M", "F"), hasMissing = true),
      FieldSpec("dob", "String", hasMissing = true)),
    interactions = Seq(Seq("first_name", "last_name")),
    filterCondition = "first_name IS NOT NULL",
    mergeExact = Seq(Seq("ssn")),
    threshold = 0.5)

  private val nPersons = 400

  test("integration quality gate: entities < 2x persons") {
    val entries = FakePersons.population(spark, nPersons, seed = 123L)
    val result = DedupePipeline.run(entries, cfg)
    val nEntries = entries.count()
    val assigned = result.uniqueMap.count()
    assert(assigned == entries.where(col("first_name").isNotNull).count(),
      "every filtered source row must receive a dedupe_id")
    val entities = result.uniqueMap.select("dedupe_id").distinct().count()
    // Reference gate: < 2x unique persons (incl. twins ~2.5%).
    assert(entities < 2L * nPersons * 2,
      s"merged too little: $entities entities from $nEntries entries " +
        s"of ~$nPersons persons")
    assert(entities > nPersons / 2,
      s"merged too much: $entities entities for ~$nPersons persons")
  }

  test("reproducibility: same seed, identical cluster assignment") {
    val e1 = FakePersons.population(spark, 150, seed = 7L)
    val e2 = FakePersons.population(spark, 150, seed = 7L)
    val r1 = DedupePipeline.run(e1, cfg).uniqueMap
      .select("entry_id", "dedupe_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val r2 = DedupePipeline.run(e2, cfg).uniqueMap
      .select("entry_id", "dedupe_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(r1 == r2)
  }

  test("quality: plurality-cluster agreement against ground truth") {
    val entries = FakePersons.population(spark, nPersons, seed = 42L)
    val result = DedupePipeline.run(entries, cfg)
    val withTruth = result.uniqueMap
      .join(entries.select("entry_id", "uuid"), "entry_id")
    // Accuracy = fraction of entries whose cluster's plurality uuid
    // matches their own (ref validation notebook cell 7: 98.25%).
    val plurality = withTruth.groupBy("dedupe_id", "uuid").count()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("dedupe_id")
          .orderBy(col("count").desc, col("uuid"))))
      .where(col("rn") === 1)
      .select(col("dedupe_id"), col("uuid").as("cluster_uuid"))
    val agree = withTruth.join(plurality, "dedupe_id")
      .where(col("uuid") === col("cluster_uuid")).count()
    val total = withTruth.count()
    val accuracy = agree.toDouble / total
    assert(accuracy > 0.9, f"accuracy $accuracy%.3f below 0.9")
  }
}
