package graft.model

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.{DedupeConfig, FieldSpec}

class TrainingSpec extends SparkSpec {

  private val cfg = DedupeConfig(
    key = "_unique_id",
    fields = Seq(
      FieldSpec("first_name", "String"),
      FieldSpec("last_name", "String"),
      FieldSpec("sex", "Categorical", Seq("M", "F"))))

  // Reference training-file format (tests/dedup_postgres_training.json).
  private val trainingJson =
    """{"match": [
      {"__class__": "tuple", "__value__": [
        {"first_name": "Rick", "last_name": "Jones", "sex": "M"},
        {"first_name": "Rich", "last_name": "Jones", "sex": "M"}]},
      {"__class__": "tuple", "__value__": [
        {"first_name": "Anna", "last_name": "Smith", "sex": "F"},
        {"first_name": "Ana", "last_name": "Smith", "sex": "F"}]},
      {"__class__": "tuple", "__value__": [
        {"first_name": "John", "last_name": "Doe", "sex": "M"},
        {"first_name": "John", "last_name": "Doe", "sex": null}]}
    ],
    "distinct": [
      {"__class__": "tuple", "__value__": [
        {"first_name": "Rick", "last_name": "Jones", "sex": "M"},
        {"first_name": "Anna", "last_name": "Smith", "sex": "F"}]},
      {"__class__": "tuple", "__value__": [
        {"first_name": "Zoe", "last_name": "Quinn", "sex": "F"},
        {"first_name": "Mark", "last_name": "Oliver", "sex": "M"}]},
      {"__class__": "tuple", "__value__": [
        {"first_name": "Ben", "last_name": "Avery", "sex": "M"},
        {"first_name": "Tess", "last_name": "Irwin", "sex": "F"}]}
    ]}"""

  test("parses the reference training-file JSON format") {
    val df = Training.parseTrainingJson(spark, trainingJson, cfg)
    assert(df.count() == 6)
    assert(df.where(col("label") === 1.0).count() == 3)
    assert(df.columns.toSet ==
      Set("l_first_name", "l_last_name", "l_sex",
        "r_first_name", "r_last_name", "r_sex", "label"))
    // null field value survives as SQL NULL
    assert(df.where(col("r_sex").isNull).count() == 1)
  }

  test("trained model separates matches from distinct pairs") {
    val labeled = Training.parseTrainingJson(spark, trainingJson, cfg)
    val model = Training.train(cfg, labeled)
    val scored = model.scorePairs(cfg, labeled)
      .select(col("label"), col("score")).collect()
    val matchScores = scored.filter(_.getDouble(0) == 1.0).map(_.getDouble(1))
    val distinctScores =
      scored.filter(_.getDouble(0) == 0.0).map(_.getDouble(1))
    assert(matchScores.min > distinctScores.max,
      s"match ${matchScores.toSeq} vs distinct ${distinctScores.toSeq}")
    assert(matchScores.forall(_ > 0.5))
    assert(distinctScores.forall(_ < 0.5))
  }

  test("training is deterministic") {
    val labeled = Training.parseTrainingJson(spark, trainingJson, cfg)
    val m1 = Training.train(cfg, labeled)
    val m2 = Training.train(cfg, labeled)
    assert(m1 == m2)
  }

  test("settings round-trip preserves model and predicates") {
    val labeled = Training.parseTrainingJson(spark, trainingJson, cfg)
    val model = Training.train(cfg, labeled)
    val preds = Seq(
      graft.blocking.WholeField("last_name"),
      graft.blocking.FirstChars("first_name", 4),
      graft.blocking.NGrams("first_name", 3),
      graft.blocking.TfIdfCanopy("first_name", 0.6))
    val s = Settings(model, preds)
    val parsed = Settings.fromJson(s.toJson)
    assert(parsed == s)
  }

  test("uncertainPairs surfaces scores nearest 0.5, most-uncertain first") {
    import spark.implicits._
    val scored = Seq(
      (1L, 2L, 0.97), (3L, 4L, 0.52), (5L, 6L, 0.04),
      (7L, 8L, 0.46), (9L, 10L, 0.71), (11L, 12L, 0.50))
      .toDF("l_id", "r_id", "score")
    val top = Training.uncertainPairs(scored, 3)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.toSeq == Seq((11L, 12L), (3L, 4L), (7L, 8L)),
      s"got ${top.toSeq}")
  }

  test("training JSON round-trips through toTrainingJson") {
    val labeled = Training.parseTrainingJson(spark, trainingJson, cfg)
    val reparsed = Training.parseTrainingJson(
      spark, Training.toTrainingJson(labeled, cfg), cfg)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(v => Option(v).map(_.toString).orNull))
        .map(_.mkString("|")).sorted.toSeq
    assert(canon(reparsed) == canon(labeled))
    // And the re-read pairs train to the identical model.
    assert(Training.train(cfg, reparsed) == Training.train(cfg, labeled))
  }

  test("toTrainingJson round-trips hostile field values (control chars, " +
      "quotes, YAML look-alikes)") {
    // The reference's json.dump escapes U+0000–U+001F; a writer that
    // doesn't emits invalid JSON a reader cannot parse back. Exercise
    // every control character, JSON metacharacters, YAML-dangerous
    // scalars (parseTrainingJson reads JSON through a YAML parser), and
    // seeded random unicode.
    val nasty: Seq[String] =
      (0 until 0x20).map(c => s"x${c.toChar}y") ++ Seq(
        "", " ", "  padded  ", "\"quoted\"", "back\\slash", "\\u0041",
        "null", "true", "false", "123", "1.5e3", "0x1f", "~", "-",
        "- item", "{a: b}", "[1, 2]", "# comment", "key: value",
        "line1\nline2\ttab\rcr", "é漢字", "  ", "'single'",
        // Non-characters and LONE surrogates: Files.writeString cannot
        // UTF-8-encode a lone surrogate raw, so an escaper that passes
        // them through crashes the WRITE before any reader runs.
        "non\ufffechar", "last\uffff", "lone-high\ud800tail",
        "lone-low\udc00tail", "pair\ud83d\ude00ok")
    val rnd = new scala.util.Random(42)
    val randoms = Seq.fill(40)(
      (0 until 12).map(_ => rnd.nextInt(0x300).toChar).mkString)
    val values = (nasty ++ randoms) :+ null
    // Pair value i with value i+1, alternating labels, null sex on every
    // third row — all three fields carry hostile payloads.
    val rows = values.zip(values.tail ++ values.headOption).zipWithIndex
      .map { case ((a, b), i) =>
        org.apache.spark.sql.Row(a, b, b, a,
          if (i % 3 == 0) null else a, b,
          if (i % 2 == 0) 1.0 else 0.0)
      }
    val schema = org.apache.spark.sql.types.StructType(
      (cfg.columns.map(c =>
        org.apache.spark.sql.types.StructField(s"l_$c",
          org.apache.spark.sql.types.StringType)) ++
        cfg.columns.map(c =>
          org.apache.spark.sql.types.StructField(s"r_$c",
            org.apache.spark.sql.types.StringType))) :+
        org.apache.spark.sql.types.StructField("label",
          org.apache.spark.sql.types.DoubleType, nullable = false))
    val labeled = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val reparsed = Training.parseTrainingJson(
      spark, Training.toTrainingJson(labeled, cfg), cfg)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      df.collect().toSeq
        .map(_.toSeq.map(v => Option(v).map(_.toString).orNull))
        .sortBy(_.mkString("\u0001"))
    assert(canon(reparsed) == canon(labeled))
  }

  test("model hash is stable and config-sensitive") {
    val labeled = Training.parseTrainingJson(spark, trainingJson, cfg)
    val model = Training.train(cfg, labeled)
    val h1 = Settings.modelHash(cfg, model)
    val h2 = Settings.modelHash(cfg, model)
    assert(h1 == h2 && h1.length == 32)
    val h3 = Settings.modelHash(cfg.copy(threshold = 0.9), model)
    assert(h1 != h3)
  }

  test("JsonStr escapes lone surrogates so artifact writes cannot fail " +
      "to encode (and pairs pass through)") {
    // Files.writeString throws on a raw lone surrogate before any
    // reader is involved; DataFrame-carried values get laundered by
    // UTF8String, so this pins the DIRECT writer path (Settings
    // predicate ids, model feature names never cross a DataFrame).
    assert(graft.JsonStr.escape("a\ud800b") == "\"a\\ud800b\"")
    assert(graft.JsonStr.escape("a\udc00b") == "\"a\\udc00b\"")
    assert(graft.JsonStr.escape("ok\ud83d\ude00") == "\"ok\ud83d\ude00\"")
    assert(graft.JsonStr.escape("x\uffff") == "\"x\\uffff\"")
    val tmp = java.nio.file.Files.createTempFile("graft_jsonstr", ".json")
    java.nio.file.Files.writeString(tmp,
      graft.JsonStr.escape("payload\ud800with lone surrogate"))
    val back = new org.yaml.snakeyaml.Yaml()
      .load[String](java.nio.file.Files.readString(tmp))
    assert(back == "payload\ud800with lone surrogate",
      "escaped lone surrogate must round-trip through the YAML reader")
  }

  test("JsonStr escapes every Unicode non-character (BMP FDD0 block + " +
      "supplementary-plane nFFFE/nFFFF) and leaves ordinary text raw") {
    // BMP non-characters U+FDD0–U+FDEF.
    assert(graft.JsonStr.escape("a\ufdd0b") == "\"a\\ufdd0b\"")
    assert(graft.JsonStr.escape("\ufdef") == "\"\\ufdef\"")
    // U+FDCF / U+FDF0 border the block and are ordinary characters.
    assert(graft.JsonStr.escape("\ufdcf\ufdf0") == "\"\ufdcf\ufdf0\"")
    // Supplementary non-character U+1FFFE = surrogates D83F DFFE —
    // escaped as the pair, while the ordinary U+1FFFD passes raw.
    assert(graft.JsonStr.escape("x\ud83f\udffe") == "\"x\\ud83f\\udffe\"")
    assert(graft.JsonStr.escape("x\ud83f\udfff") == "\"x\\ud83f\\udfff\"")
    assert(graft.JsonStr.escape("x\ud83f\udffd") == "\"x\ud83f\udffd\"")
    // Plane-16 non-character U+10FFFF = DBFF DFFF.
    assert(graft.JsonStr.escape("\udbff\udfff") == "\"\\udbff\\udfff\"")
  }
}
