package graft.model

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.blocking.Predicate
import graft.config.DedupeConfig

/** Learned-state persistence: classifier weights + learned blocking
  * predicates, round-tripped as JSON (ref: S8 — the reference pickles a
  * StaticDedupe settings file at pgdedupe/run.py:180-181 and reloads it
  * at run.py:126-129; predicates serialize by their namespaced id, which
  * is already the blocker's stable contract).
  */
final case class Settings(model: LogisticModel, predicates: Seq[Predicate]) {

  def toJson: String = {
    // JsonStr (the ONE escaper): predicate ids embed config-authored
    // field names, and a stray control char / non-character / lone
    // surrogate must round-trip, not produce a settings file the
    // snakeyaml reader rejects — the private copy that used to live
    // here had already dropped the non-character escapes the
    // training-file writer carried.
    s"""{"model":${model.toJson},""" +
      s""""predicates":[${
        predicates.map(p => graft.JsonStr.escape(p.id)).mkString(",")}]}"""
  }

  def save(path: String): Unit =
    Files.writeString(Paths.get(path), toJson)
}

object Settings {

  def load(path: String): Settings =
    fromJson(Files.readString(Paths.get(path)))

  def fromJson(json: String): Settings = {
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](json).asScala
    val model = LogisticModel.fromParsed(
      root("model").asInstanceOf[java.util.Map[String, Object]])
    val preds = root("predicates").asInstanceOf[java.util.List[Object]]
      .asScala.toSeq.map(o => Predicate.fromId(o.toString))
    Settings(model, preds)
  }

  /** Canonical model-definition string for reproducibility hashing
    * (ref: pgdedupe/utils.py:31-44 `create_model_definition` — seed,
    * classifier config, fields, filter, interactions, recall; gate at
    * tests/test_reproducibility.py:63-65). Keys are sorted, values
    * rendered canonically, so equal configurations hash equal across
    * runs and hosts.
    */
  def modelDefinition(cfg: DedupeConfig, model: LogisticModel): String = {
    // JsonStr: this string is only ever HASHED, but a consistent
    // canonical form matters — and for the ASCII names real configs use
    // the bytes (and therefore every pinned model hash) are unchanged.
    val q = graft.JsonStr.escape _
    val fields = cfg.fields.map { f =>
      val entries = Seq(
        "categories" -> (if (f.categories.isEmpty) None
          else Some(f.categories.map(q).mkString("[", ",", "]"))),
        "field" -> Some(q(f.field)),
        "has_missing" -> Some(f.hasMissing.toString),
        "type" -> Some(q(f.ftype)),
        "variable_name" -> Some(q(f.varName)))
      entries.collect { case (k, Some(v)) => s"${q(k)}:$v" }
        .mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val inter = cfg.interactions
      .map(_.map(q).mkString("[", ",", "]")).mkString("[", ",", "]")
    val weights = model.featureNames.zip(model.weights).sortBy(_._1)
      .map { case (n, w) => s"${q(n)}:$w" }.mkString("{", ",", "}")
    // Keys in sorted order (ref json.dumps(sort_keys=True)).
    Seq(
      "bias" -> model.bias.toString,
      "fields" -> fields,
      "filter_condition" -> q(cfg.filterCondition),
      "interactions" -> inter,
      "recall" -> cfg.recall.toString,
      "seed" -> cfg.seed.toString,
      "threshold" -> cfg.threshold.toString,
      "weights" -> weights
    ).map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
  }

  /** md5 hex of the canonical model definition — the filename-friendly
    * model hash (ref: pgdedupe/utils.py:20-28, used at cli.py:96-104).
    */
  def modelHash(cfg: DedupeConfig, model: LogisticModel): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(modelDefinition(cfg, model).getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
  }
}
