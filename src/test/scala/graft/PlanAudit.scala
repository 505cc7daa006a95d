package graft

import org.apache.spark.sql.SparkSession

/** Prints `explain(formatted)` for selected queries so scan pruning,
  * filter pushdown, join strategies, and codegen spans can be audited
  * by eye (test-scoped tool). Run:
  *   sbt "Test/runMain graft.PlanAudit q01_scan_filter_project ..."
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", graft.functions.GraftExtensions.CONF)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_scan_filter_project", "q06_rowid", "q25_csv_roundtrip",
        "q26_orc_roundtrip", "q28_bucketed_join", "q29_salted_join",
        "q30_blocking_map", "q35_minhash_candidates", "q37_simhash_pairs",
        "q44_knn_bruteforce", "q45_knn_lsh", "q52_embedding_neardup_lsh")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
