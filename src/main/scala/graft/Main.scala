package graft
import org.apache.spark.sql.SparkSession

import graft.config.DedupeConfig
import graft.model.Settings
import graft.pipeline.DedupePipeline

/** CLI entry point: config-file-in → parquet-out (ref: `pgdedupe --config
  * X --db Y`, pgdedupe/cli.py:26-67 — the Postgres connection is replaced
  * by parquet paths; everything else is config-driven).
  *
  * Usage: graft.Main --config <yaml|json> [--input <parquet>]
  *        [--output <dir>]
  * Config keys `input`/`output` supply defaults for the flags. Writes
  * `unique_map/` (source-key grain: dedupe_id, <key>, cluster_score) and
  * `entries_unique/` (deduped-record grain) under the output dir, and
  * prints the reproducibility model hash (ref cli.py:96-104) and total
  * wall-clock (ref cli.py:67).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val start = System.nanoTime()
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
    val configPath = opts.getOrElse("config",
      sys.error("usage: graft.Main --config <file> [--input <parquet>] " +
        "[--output <dir>]"))
    val cfg = DedupeConfig.load(configPath)
    val input = opts.get("input").orElse(cfg.input)
      .getOrElse(sys.error("no --input flag and no `input` config key"))
    val output = opts.get("output").orElse(cfg.output)
      .getOrElse(sys.error("no --output flag and no `output` config key"))

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", graft.functions.GraftExtensions.CONF)
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val entries = spark.read.parquet(input)
    val result = DedupePipeline.run(entries, cfg)
    println(s"model hash = ${Settings.modelHash(cfg, result.model)}")
    result.uniqueMap.write.mode("overwrite").parquet(s"$output/unique_map")
    result.mapped.write.mode("overwrite").parquet(s"$output/entries_unique")
    result.release() // both sinks written; free every pinned frontier
    println(f"ran in ${(System.nanoTime() - start) / 1e9}%.1f seconds")
    spark.stop()
  }
}
