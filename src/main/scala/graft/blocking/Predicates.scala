package graft.blocking

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocking predicate algebra (ref: SURVEY.md D5).
  *
  * Each predicate maps one record to 0..n block-key strings (ref: the
  * learned predicate set applied at pgdedupe/run.py:217-231). Predicate
  * keys are namespaced `"<id>:<raw>"` so keys from different predicates
  * never collide (dedupe does the same with predicate-tuple keys).
  *
  * All simple predicates are pure column expressions (codegen'd, no UDF):
  * at 100 TB the blocking pass is a single projection + explode over the
  * scan, so keeping it inside whole-stage codegen matters.
  */
sealed trait Predicate {
  def id: String
  def field: String
  /** Array of raw key strings for this record (empty/null-safe). */
  def rawKeys(c: Column): Column
  /** Namespaced keys. */
  def keys(c: Column): Column =
    transform(rawKeys(c), k => concat_ws(":", lit(id), k))
}

object Predicate {

  /** Inverse of `id` — the settings-file round trip for learned
    * predicate sets (ref pgdedupe/run.py:180-181).
    */
  def fromId(id: String): Predicate = {
    val sep = id.indexOf(':')
    require(sep > 0, s"malformed predicate id: $id")
    val (kind, field) = (id.substring(0, sep), id.substring(sep + 1))
    kind match {
      case "whole"                          => WholeField(field)
      case "token"                          => TokenField(field)
      case "firsttok"                       => FirstToken(field)
      case "digits"                         => DigitsOnly(field)
      case "sorted"                         => SortedTokens(field)
      case k if k.startsWith("first")       =>
        FirstChars(field, k.stripPrefix("first").toInt)
      case k if k.startsWith("ngram")       =>
        NGrams(field, k.stripPrefix("ngram").toInt)
      case other =>
        throw new IllegalArgumentException(s"unknown predicate kind: $other")
    }
  }
}

/** Whole-field equality block (dedupe's wholeFieldPredicate). */
final case class WholeField(field: String) extends Predicate {
  val id = s"whole:$field"
  def rawKeys(c: Column): Column =
    when(c.isNull || c === "", array().cast("array<string>"))
      .otherwise(array(c.cast("string")))
}

/** One block per whitespace token (dedupe's tokenFieldPredicate). */
final case class TokenField(field: String) extends Predicate {
  val id = s"token:$field"
  def rawKeys(c: Column): Column =
    when(c.isNull, array().cast("array<string>"))
      .otherwise(array_distinct(filter(split(c, "\\s+"), t => t =!= "")))
}

/** First N characters (dedupe's firstNCharsPredicate family). */
final case class FirstChars(field: String, n: Int) extends Predicate {
  val id = s"first$n:$field"
  def rawKeys(c: Column): Column =
    when(c.isNull || length(c) < n, array().cast("array<string>"))
      .otherwise(array(substring(c, 1, n)))
}

/** First whitespace token (dedupe's firstTokenPredicate). */
final case class FirstToken(field: String) extends Predicate {
  val id = s"firsttok:$field"
  def rawKeys(c: Column): Column =
    when(c.isNull || c === "", array().cast("array<string>"))
      .otherwise(array(element_at(split(c, "\\s+"), 1)))
}

/** Character n-grams (dedupe's ngramsTokens / commonNGramsPredicate). */
final case class NGrams(field: String, n: Int) extends Predicate {
  val id = s"ngram$n:$field"
  def rawKeys(c: Column): Column =
    when(c.isNull || length(c) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), length(c) - (n - 1)),
          i => c.substr(i, lit(n)))))
}

/** Digits-only normalization block (dedupe's commonIntegerPredicate-ish:
  * strips non-digits so "123-45-6789" and "123456789" share a key).
  */
final case class DigitsOnly(field: String) extends Predicate {
  val id = s"digits:$field"
  def rawKeys(c: Column): Column = {
    val d = regexp_replace(c, "[^0-9]", "")
    when(c.isNull || d === "", array().cast("array<string>"))
      .otherwise(array(d))
  }
}

/** Sorted-token fingerprint: order-insensitive whole-value key
  * (dedupe's sortedAcronym/fingerprint family).
  */
final case class SortedTokens(field: String) extends Predicate {
  val id = s"sorted:$field"
  def rawKeys(c: Column): Column =
    when(c.isNull || c === "", array().cast("array<string>"))
      .otherwise(array(concat_ws(" ",
        sort_array(array_distinct(filter(split(c, "\\s+"), t => t =!= ""))))))
}

object Blocker {

  /** Build the blocking map: one `(block_key, _unique_id)` row per
    * (record, predicate key) (ref: blocking_map at pgdedupe/run.py:210-245,
    * there via a Python generator + CSV COPY round-trip; here a single
    * codegen'd projection + explode, no data egress).
    */
  def blockingMap(
      records: DataFrame,
      predicates: Seq[Predicate],
      idCol: String = "_unique_id"): DataFrame = {
    val allKeys = flatten(array(predicates.map(p => p.keys(col(p.field))): _*))
    records
      .select(explode(array_distinct(allKeys)).as("block_key"), col(idCol))
  }

  /** TF-capped variant of a token predicate ("index predicate" stand-in,
    * ref run.py:213-222): only tokens whose document frequency is within
    * [2, maxDf] block — singleton tokens can't match anything and
    * ubiquitous tokens create quadratic blocks. Two-pass: a df-count
    * aggregation, then a semi-join filter. No broadcast hint: at 100 TB
    * the admissible token set is itself huge, so the join strategy is
    * left to the optimizer/AQE (which still broadcasts when the set is
    * small enough).
    */
  def tokenBlockingWithDfCap(
      records: DataFrame,
      field: String,
      maxDf: Long,
      idCol: String = "_unique_id"): DataFrame = {
    val p = TokenField(field)
    val keyed = records.select(explode(p.keys(col(field))).as("block_key"),
      col(idCol))
    val admissible = keyed.groupBy("block_key").count()
      .where(col("count") >= 2 && col("count") <= maxDf)
      .select("block_key")
    keyed.join(admissible, "block_key")
  }
}
