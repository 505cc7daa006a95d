package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are defined in graft.queries.* as QueryDef (Spark program +
  * DuckDB oracle SQL where the semantics are SQL-expressible).
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ AnalyticsQueries.defs ++
      DedupQueries.defs ++ PipelineQueries.defs ++ TextAnnQueries.defs ++
      CorpusQueries.defs

  /** Flagship: full record-linkage pipeline (ref pgdedupe/cli.py:46-62)
    * on sf0.001-derived person records; rows = source-grain dedupe ids.
    */
  def entry(spark: SparkSession): DataFrame = {
    val result = graft.pipeline.DedupePipeline.run(
      PipelineQueries.personEntries(spark, "/root/testdata/sf0.001"),
      PipelineQueries.personConfig)
    result.release(result.uniqueMap) // uniqueMap cache is materialized
    result.uniqueMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(sql => d.name -> sql)).toMap
}
