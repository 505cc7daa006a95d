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
}
