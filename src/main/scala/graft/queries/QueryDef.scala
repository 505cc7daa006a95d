package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One verifiable operator demo: a Spark DataFrame program plus (when
  * SQL-expressible) the equivalent ANSI SQL for the DuckDB oracle.
  * Column names/types must agree exactly (driver hashes after sorting
  * columns by name).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {

  /** Exact cross-engine money aggregation: quantize per row to a long
    * (deterministic IEEE double ops), sum exactly in integer space, and
    * scale back. Avoids sum-order-dependent double drift that would break
    * the oracle hash (and is the right pattern for reproducible pipelines
    * at any scale).
    */
  def exactSum(c: Column, scale: Int): Column =
    sum(round(c * scale, 0).cast("long"))

  def descale(c: Column, scale: Int): Column =
    c.cast("double") / scale.toDouble

  /** SQL twin of exactSum/descale for the oracle. */
  def sqlExactSum(expr: String, scale: Int): String =
    s"CAST(sum(CAST(round(($expr) * $scale, 0) AS BIGINT)) AS DOUBLE) / $scale.0"
}
