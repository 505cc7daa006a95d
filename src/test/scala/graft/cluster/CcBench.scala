package graft.cluster

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.PipelineQueries
import graft.pipeline.DedupePipeline
import graft.model.LogisticModel

/** One-off comparison of the two CC kernels on the real q50 edge
  * workload at sf0.1 plus an adversarial long chain — decides which
  * kernel is the pipeline default (test-scoped tool, not shipped API).
  * Run: sbt "Test/runMain graft.cluster.CcBench"
  *
  * Kernel selection in production goes through
  * `ConnectedComponents.auto`: a driver union-find below the edge cap
  * (config knob `cc_edge_cap`, default 1M ≈ 16 MB of driver heap),
  * `runStar` above it; the pick is logged and surfaced in the bench
  * JSON's notes map as `cc_kernel`. Re-run this bench when changing
  * the cap default — the crossover sits where the union-find's single
  * collect beats runStar's O(log² n) shuffle rounds on the target
  * cluster.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", graft.functions.GraftExtensions.CONF)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccbench] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // Real workload: q50's above-threshold scored person edges.
    val cfg = PipelineQueries.personConfig
    val eu = DedupePipeline.preprocess(
      PipelineQueries.personEntries(spark, dir), cfg)
      .persist()
    // block() persists bm/sc/pb — release them once `above` is
    // materialized so the CC timings below don't run against pinned
    // pipeline frontiers.
    val (bm, sc, pb) = DedupePipeline.block(eu, cfg,
      DedupePipeline.defaultPredicates(cfg))
    val (_, scored0) = DedupePipeline.scorePairs(eu, sc, cfg,
      LogisticModel.default(cfg))
    val above = scored0.select("l_id", "r_id", "score")
      .where(col("score") >= cfg.threshold)
      .persist()
    println(s"[ccbench] person edges: ${above.count()}")
    Seq(bm, sc, pb).foreach(_.unpersist(false))
    val a = time("person min-label")(
      ConnectedComponents.run(above).collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toMap)
    val b = time("person star")(
      ConnectedComponents.runStar(above).collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toMap)
    println(s"[ccbench] person labels agree: ${a == b} (${a.size} nodes)")

    // Adversarial: one 20k-node path (diameter 20k).
    val chain = spark.range(1, 20000)
      .select(col("id").as("l_id"), (col("id") + 1).as("r_id"))
      .persist()
    chain.count()
    val c = time("chain star")(
      ConnectedComponents.runStar(chain, maxIter = 20).count())
    val d = time("chain min-label (maxIter=50)")(
      ConnectedComponents.run(chain, maxIter = 50).count())
    println(s"[ccbench] chain nodes: star=$c minlabel=$d")
    spark.stop()
  }
}
