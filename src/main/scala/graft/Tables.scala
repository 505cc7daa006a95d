package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Harness table loader (TESTDATA.md): one parquet file per table under a
  * scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads via
    // spark.sql.legacy.parquet.nanosAsLong (set in Verify/Bench); convert
    // the long nanos back to a micros timestamp. DuckDB truncates ns→µs
    // the same way, so oracle comparisons stay exact.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    else df
  }

  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** CSV bulk ingest (S3 — the Spark stand-in for the reference's COPY
    * surface, pgdedupe/run.py:234-245): header CSV with an EXPLICIT
    * schema. Schema inference would scan the data twice and guess types
    * per-run — never acceptable at 100 TB, so there is deliberately no
    * inferring overload.
    */
  def loadCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)

  /** CSV sink (S4): header CSV. Partition count is the caller's lineage
    * (one file per partition) — coalesce upstream if a single file is
    * required.
    */
  def sinkCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** JDBC partitioned ingest (S1 alternate mapping — the reference reads
    * its entries table straight from a Postgres connection,
    * pgdedupe/run.py:138-144). Partitioning is REQUIRED, not optional: a
    * numeric `partitionColumn` with bounds and `numPartitions` makes the
    * scan issue that many parallel range queries; the no-partitioning
    * overload Spark also offers is a single serial cursor, unusable at
    * scale, so this loader deliberately doesn't expose it. Filters and
    * column pruning push down into the generated SQL (JDBCScan shows
    * PushedFilters), so a projected/filtered read ships only what it
    * needs.
    */
  def loadJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .options(options)
      .load()
}
