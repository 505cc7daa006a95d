package graft
import org.apache.spark.sql.SparkSession

import graft.queries.PipelineQueries
import graft.pipeline.DedupePipeline
import graft.ops.RelationalOps
import graft.cluster.Hierarchical
import graft.model.LogisticModel

/** Developer tool: per-phase wall-clock of the flagship dedupe pipeline
  * (the q50 decomposition), so a regression names the stage, not the
  * query. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", graft.functions.GraftExtensions.CONF)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cfg = PipelineQueries.personConfig
    val entries = PipelineQueries.personEntries(spark, sfDir)
    val model = LogisticModel.default(cfg)
    val predicates = DedupePipeline.defaultPredicates(cfg)

    val eu = DedupePipeline.preprocess(entries, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("preprocess")(println(s"  entries_unique=${eu.count()}"))
    // block() persists bm/sc/pb — track them for release at the end
    // (the session-lifetime cache-pin defect class).
    val (bm, sc, pb) = DedupePipeline.block(eu, cfg, predicates)
    time("blocking_map")(println(s"  bm=${bm.count()}"))
    time("smaller_coverage")(println(s"  sc=${sc.count()}"))
    val (pairs, scored0) = DedupePipeline.scorePairs(eu, sc, cfg, model)
    time("pairs_only")(println(s"  pairs=${pairs.count()}"))
    if (sys.env.contains("PROFILE_EXPLAIN")) scored0.explain("formatted")
    time("score_nopersist")(println(s"  sum=${scored0.select(
      org.apache.spark.sql.functions.sum("score")).collect()(0)}"))
    val scored = scored0.select("l_id", "r_id", "score")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("score_pairs")(println(s"  scored=${scored.count()}"))
    time("above_threshold")(println(
      s"  above=${scored.where(org.apache.spark.sql.functions.col("score") >= cfg.threshold).count()}"))
    val em = DedupePipeline.cluster(scored, cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cluster_hac")(println(s"  entity_map=${em.count()}"))
    val (mapped, um) = DedupePipeline.apply(em, eu, entries, cfg)
    time("apply_merge")(println(s"  unique_map=${um.count()}"))
    Seq(bm, sc, pb, eu, scored, em).foreach(_.unpersist(false))
    spark.stop()
  }
}
