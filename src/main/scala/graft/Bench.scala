package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries at SPARK_GRAFT_SF_DIR, one JSON line.
  * Prints total wall-clock like the reference does (pgdedupe/cli.py:67).
  */
object Bench {

  /** Headline workload: scan-agg, join-heavy, window, dedup dataflow,
    * ANN, and the flagship pipeline — the queries whose plans matter at
    * scale (not the micro-operator demos).
    */
  val headline: Seq[String] = Seq(
    "q20_pricing_summary", "q21_top_revenue", "q22_region_volume",
    "q23_event_windows", "q24_sessionize",
    "q13_exact_dedup", "q35_minhash_candidates", "q37_simhash_pairs",
    "q43_fingerprint", "q41_quality_score",
    "q44_knn_bruteforce", "q45_knn_lsh",
    "q50_dedupe_pipeline")

  def main(args: Array[String]): Unit = {
    val start = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries
    // Untimed warmup: JIT + codegen + parquet-footer paths, so the first
    // timed query doesn't absorb session startup (~3 s of noise).
    Tables.load(spark, sfDir, "region")
      .groupBy("r_name").count().count()
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      try { qs(name)(spark, sfDir).count() }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qj = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qj,"sf":"$sfDir"}""")
    System.err.println(f"ran in ${(System.nanoTime() - start) / 1e9}%.1f s")
    spark.stop()
  }
}
