package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries at SPARK_GRAFT_SF_DIR, one JSON line.
  * Prints total wall-clock like the reference does (pgdedupe/cli.py:67).
  *
  * Each query runs `SPARK_GRAFT_BENCH_REPS` times (default 3) — single
  * samples on this host swing 2–3× run-to-run, so gate decisions need a
  * median. The JSON line reports the per-query MEDIAN under "queries"
  * (the field the driver reads), plus per-query {min,max} under "spread"
  * and the flagship pipeline's per-phase seconds under "phases".
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
    "q44_knn_bruteforce", "q45_knn_lsh", "q52_embedding_neardup_lsh",
    "q50_dedupe_pipeline")

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val start = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
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
    var phases = Map.empty[String, Double]
    var notes = Map.empty[String, String]
    val results = headline.filter(qs.contains).map { name =>
      val samples = (1 to reps).map { rep =>
        val t0 = System.nanoTime()
        val ok =
          try {
            val df = qs(name)(spark, sfDir)
            df.count()
            // The returned frame may be the query's own cached handle
            // (q50 returns its pinned uniqueMap); drop it so repeated
            // reps don't accumulate storage blocks for the session
            // lifetime. No-op for uncached frames.
            df.unpersist(false)
            true
          } catch {
            case e: Throwable =>
              System.err.println(
                s"[bench] $name rep $rep failed: ${e.getMessage}")
              false
          }
        val secs = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name rep $rep/$reps: $secs%.3f s" +
          (if (ok) "" else " (FAILED)"))
        val ph = graft.pipeline.PhaseLog.drain()
        if (ph.nonEmpty) phases = ph // keep the last recorded rep's phases
        val nt = graft.pipeline.PhaseLog.drainNotes()
        if (nt.nonEmpty) notes = nt
        (secs, ok)
      }
      // Failed reps carry time-to-failure, not query cost — keep them out
      // of every statistic and surface them under "failed" instead, so
      // the driver can't gate on garbage timings.
      val good = samples.filter(_._2).map(_._1)
      // Steady-state spread: the first successful rep absorbs JIT +
      // codegen warmup (observed 0.8–9.3 s swings on q44), so with >= 3
      // clean reps the spread reflects reps 2+ only. The median keeps
      // all clean reps — with the warmup sample as the max it never
      // shifts the middle.
      val steady = if (good.length >= 3) good.drop(1) else good
      (name, good, steady, samples.count(!_._2))
    }
    def fmtMap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val measured = results.filter(_._2.nonEmpty)
    val qj = fmtMap(measured.map { case (k, good, _, _) =>
      k -> f"${median(good)}%.3f" })
    val spreadJ = fmtMap(measured.map { case (k, _, steady, _) =>
      k -> f"""{"min":${steady.min}%.3f,"max":${steady.max}%.3f}"""
    })
    val failedJ = fmtMap(results.filter(_._4 > 0)
      .map { case (k, _, _, nf) => k -> nf.toString })
    val phaseJ = fmtMap(phases.toSeq.sortBy(_._1)
      .map { case (k, v) => k -> f"$v%.3f" })
    val notesJ = fmtMap(notes.toSeq.sortBy(_._1)
      .map { case (k, v) => k -> ("\"" + v.replace("\"", "'") + "\"") })
    val total = measured.map { case (_, good, _, _) => median(good) }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","reps":$reps,"queries":$qj,"spread":$spreadJ,"failed":$failedJ,"phases":$phaseJ,"notes":$notesJ,"sf":"$sfDir"}""")
    System.err.println(f"ran in ${(System.nanoTime() - start) / 1e9}%.1f s")
    spark.stop()
  }
}
