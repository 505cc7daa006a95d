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

  test("release() frees every pinned frontier — no storage growth per run") {
    import org.apache.spark.storage.StorageLevel
    val entries = FakePersons.population(spark, 100, seed = 31L)
    val result = DedupePipeline.run(entries, cfg)
    // run() pins 7 frontiers (src, eu, pb, sc, scored, em, um) and every
    // handle must be tracked — a persist() outside Result.cached is a
    // session-lifetime leak (the round-7 TextDedup defect class).
    assert(result.cached.size == 7)
    assert(result.cached.forall(_.storageLevel != StorageLevel.NONE),
      "run() should have pinned its frontiers")
    result.release(result.uniqueMap)
    assert(result.cached.filter(_ ne result.uniqueMap)
        .forall(_.storageLevel == StorageLevel.NONE),
      "release() left a frontier pinned")
    assert(result.uniqueMap.storageLevel != StorageLevel.NONE,
      "release(keep) must not unpersist the kept frame")
    result.release()
    assert(result.cached.forall(_.storageLevel == StorageLevel.NONE))
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

  test("trained pipeline: training file drives model + predicates, " +
      "settings round-trip") {
    import spark.implicits._
    val entries = FakePersons.population(spark, 200, seed = 99L)
    // Labeled pairs in the reference JSON format, derived from ground
    // truth: same-uuid rows are matches, cross-uuid rows distinct.
    val rows = entries.orderBy("entry_id").collect().take(60)
    val byUuid = rows.groupBy(_.getAs[String]("uuid"))
    def rec(r: org.apache.spark.sql.Row): String =
      cfg.columns.map { c =>
        val v = r.getAs[String](c)
        "\"" + c + "\": " + (if (v == null) "null" else "\"" + v + "\"")
      }.mkString("{", ", ", "}")
    def tup(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row) =
      s"""{"__class__": "tuple", "__value__": [${rec(a)}, ${rec(b)}]}"""
    val matches = byUuid.values.filter(_.length >= 2).take(10)
      .map(g => tup(g(0), g(1)))
    val sorted = rows.sortBy(_.getAs[Long]("entry_id"))
    val distincts = byUuid.values.toSeq.sortBy(_.head.getAs[Long]("entry_id"))
      .sliding(2).collect { case Seq(a, b) => tup(a.head, b.head) }
      .take(15)
    val json = s"""{"match": [${matches.mkString(",")}],
      "distinct": [${distincts.mkString(",")}]}"""
    val dir = java.nio.file.Files.createTempDirectory("graft-train")
    val tf = dir.resolve("training.json").toString
    val sf = dir.resolve("settings.json").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(tf), json)

    val trainedCfg = cfg.copy(
      trainingFile = Some(tf), settingsFile = Some(sf))
    val result = DedupePipeline.run(entries, trainedCfg)
    val entities = result.uniqueMap.select("dedupe_id").distinct().count()
    assert(entities > 0 && entities < entries.count())
    // Settings were persisted (ref run.py:180-181) and reload to the
    // same model + predicates the training produced.
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(sf)))
    val s = graft.model.Settings.load(sf)
    assert(s.predicates.nonEmpty)
    // Re-run from the saved settings (use_saved_model path) —
    // identical assignments.
    val savedCfg = trainedCfg.copy(useSavedModel = true)
    val r1 = result.uniqueMap.select("entry_id", "dedupe_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val r2 = DedupePipeline.run(entries, savedCfg).uniqueMap
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
