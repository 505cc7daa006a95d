package graft
import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Developer tool (not part of the driver contract): run ONE headline
  * query `reps` times and print every Spark job's wall-clock and
  * description, so the expensive jobs inside a multi-action query (q50
  * pipeline phases, q52's CC kernel actions, BPE learn iterations) are
  * attributable individually. Wall-clock on this host is noisy; the
  * per-job relative shape is the signal.
  *
  * Usage: runMain graft.JobProfile <queryName> [reps]
  */
object JobProfile {

  private final class JobTimer extends SparkListener {
    final case class J(id: Int, desc: String, start: Long,
        var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
        .getOrElse("?")
      jobs(e.jobId) = J(e.jobId, desc.take(90), e.time,
        stages = e.stageIds.length,
        tasks = e.stageInfos.map(_.numTasks).sum)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(e.jobId).foreach(_.end = e.time)
    }
    final case class S(id: Int, name: String, secs: Double, tasks: Int)
    val stages = mutable.ArrayBuffer.empty[S]
    override def onStageCompleted(
        e: SparkListenerStageCompleted): Unit = synchronized {
      val si = e.stageInfo
      val secs = (for {
        s <- si.submissionTime; c <- si.completionTime
      } yield (c - s) / 1e3).getOrElse(-1.0)
      stages += S(si.stageId, si.name.takeWhile(_ != '\n').take(70),
        secs, si.numTasks)
    }
    def reset(): Unit = synchronized { jobs.clear(); stages.clear() }
    def dump(): Unit = synchronized {
      // A job whose end event hasn't drained from the async listener
      // bus yet (end == 0) would print a huge negative duration and
      // corrupt the TOTAL — mark it and keep it out of the sum.
      val (done, running) = jobs.values.partition(_.end > 0)
      done.foreach { j =>
        println(f"[job] ${j.id}%4d ${(j.end - j.start) / 1e3}%8.3f s " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc}")
      }
      running.foreach(j => println(s"[job] ${j.id} STILL RUNNING/undrained"))
      println(f"[job] TOTAL ${done.map(j => j.end - j.start).sum / 1e3}%.3f s across ${done.size} jobs" +
        (if (running.nonEmpty) s" (+${running.size} undrained)" else ""))
      // Slow stages (>= 0.3 s submission→completion): where a
      // multi-stage job's wall-clock actually goes.
      stages.filter(_.secs >= 0.3).sortBy(-_.secs).take(20).foreach { s =>
        println(f"[stage] ${s.id}%4d ${s.secs}%8.3f s tasks=${s.tasks}%4d  ${s.name}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q52_embedding_neardup_lsh")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val timer = new JobTimer
    spark.sparkContext.addSparkListener(timer)
    Tables.load(spark, sfDir, "region").groupBy("r_name").count().count()
    val q = SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      Thread.sleep(300); timer.reset()
      val t0 = System.nanoTime()
      val df = q(spark, sfDir)
      val rows = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      df.unpersist(false)
      Thread.sleep(500)
      println(f"[rep $rep] $name rows=$rows wall=$secs%.3f s " +
        s"(loadavg ${Bench.readLoadAvg()})")
      timer.dump()
    }
    spark.stop()
  }
}
