package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generator-driven differential gate for the streaming family — the
  * last without one. Each streaming operator's contract is an
  * equivalence to a BATCH twin ("matches the batch answer when
  * arrivals respect the watermark"), so the gate replays seeded random
  * event sequences — hostile keys (null, empty, unicode), skewed
  * domains, bounded out-of-order arrival, random micro-batch
  * boundaries, cross-batch redeliveries — through the streaming path
  * and asserts the batch equivalence the scaladocs promise. The
  * fixture-driven IncrementalDedupSpec pins each contract on ONE
  * arrival shape; this suite draws a new one every run.
  *
  * Arrival disorder is generated strictly INSIDE the watermark
  * (disorder bound ≪ delay), because that is the contract's
  * precondition: rows later than the watermark are dropped by design
  * and the batch twin would keep them.
  */
class RandomizedStreamingDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val hostileKeys: Seq[String] =
    Seq(null, "", "ünï🚀", "dup-hot", "k1", "k2", "k3", "x" * 80)

  private val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime

  /** `n` events at ~30 s cadence with ≤3 min bounded disorder; ~60%
    * land on one hot key. Values are small integers (exact in fp, so
    * double sums are arrival-order-independent and comparable).
    */
  private def gen(seed: Long, n: Int): Seq[(Timestamp, String, Double)] = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      val ts = new Timestamp(base + (i + r.nextInt(6)) * 30000L)
      val k = if (r.nextInt(10) < 6) "dup-hot"
        else hostileKeys(r.nextInt(hostileKeys.length))
      (ts, k, (1 + r.nextInt(9)).toDouble)
    }
  }

  /** Random partition of `rows` into 2–6 ordered micro-batches. */
  private def chunks[A](seed: Long, rows: Seq[A]): Seq[Seq[A]] = {
    val r = new scala.util.Random(seed * 31 + 7)
    val k = 2 + r.nextInt(5)
    val cuts = (Seq(0, rows.size) ++ Seq.fill(k - 1)(r.nextInt(rows.size)))
      .distinct.sorted
    cuts.zip(cuts.tail).map { case (a, b) => rows.slice(a, b) }
  }

  test("dedupStream equals batch dropDuplicates over random " +
      "micro-batch splits with hostile keys and cross-batch " +
      "duplicates (3 seeds)") {
    implicit val sqlCtx = spark.sqlContext
    Seq(3L, 41L, 777L).foreach { seed =>
      val rows = gen(seed, 300).map { case (ts, k, _) => (ts, k) }
      val input = MemoryStream[(Timestamp, String)]
      val out = IncrementalDedup.dedupStream(
        input.toDF().toDF("ts", "k"), "ts", Seq("k"))
      val sink = s"rsd_dedup_$seed"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        chunks(seed, rows).foreach { c =>
          input.addData(c: _*)
          q.processAllAvailable()
        }
        val streamed = spark.table(sink).collect()
          .map(r => (r.getTimestamp(0), Option(r.getString(1)))).toSet
        val batch = rows.toDF("ts", "k").dropDuplicates("k", "ts")
          .collect()
          .map(r => (r.getTimestamp(0), Option(r.getString(1)))).toSet
        assert(streamed == batch, s"seed=$seed: streamed ${streamed.size} " +
          s"vs batch ${batch.size}")
      } finally q.stop()
    }
  }

  test("windowedCounts equals the batch window aggregate on every " +
      "window the watermark finalized (3 seeds)") {
    implicit val sqlCtx = spark.sqlContext
    Seq(9L, 55L, 2024L).foreach { seed =>
      val rows = gen(seed, 250)
      // Sentinel 3 h past the last event: advances the watermark far
      // enough that every real window finalizes; its own (never-
      // finalized) window stays out of both sides.
      val maxTs = rows.map(_._1.getTime).max
      val sentinel = (new Timestamp(maxTs + 3 * 3600 * 1000L), "close", 0.0)
      val input = MemoryStream[(Timestamp, String, Double)]
      val out = IncrementalDedup.windowedCounts(
        input.toDF().toDF("ts", "event_type", "value"),
        watermark = "10 minutes", windowLen = "1 hour")
      val sink = s"rsd_win_$seed"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        chunks(seed, rows).foreach { c =>
          input.addData(c: _*)
          q.processAllAvailable()
        }
        input.addData(sentinel)
        q.processAllAvailable()
        def render(df: org.apache.spark.sql.DataFrame) =
          df.select(col("window.start").as("ws"), col("event_type"),
              col("n_events"), col("sum_value"))
            .collect()
            .map(r => (r.getTimestamp(0), Option(r.getString(1)),
              r.getLong(2), r.getDouble(3))).toSet
        val streamed = render(spark.table(sink))
        val batch = render(rows.toDF("ts", "event_type", "value")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value")))
        assert(streamed == batch,
          s"seed=$seed: streamed ${streamed.size} windows vs batch ${
            batch.size}")
      } finally q.stop()
    }
  }

  test("dedupedParquetSink lands each key exactly once under random " +
      "cross-batch redeliveries, null and unicode keys included") {
    implicit val sqlCtx = spark.sqlContext
    val seed = 1861L
    val r = new scala.util.Random(seed)
    val rows = gen(seed, 200)
    val parts = chunks(seed, rows)
    // Redeliver a random slice of every already-sent prefix with each
    // later chunk (at-least-once source / restart replay shape).
    val withRedelivery = parts.zipWithIndex.map { case (c, i) =>
      val seen = parts.take(i).flatten
      c ++ r.shuffle(seen).take(seen.size / 3)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rsd_sink").toString
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = IncrementalDedup.dedupedParquetSink(
      input.toDF().toDF("ts", "k", "value"),
      s"$dir/out", s"$dir/ckpt", keyCols = Seq("k"))
    try {
      withRedelivery.foreach { c =>
        input.addData(c: _*)
        q.processAllAvailable()
      }
      val landed = spark.read.parquet(s"$dir/out")
      val perKey = landed.groupBy("k").count()
        .where(col("count") > 1).count()
      assert(perKey == 0, s"$perKey keys landed more than once")
      val landedKeys = landed.select("k").collect()
        .map(r => Option(r.getString(0))).toSet
      val wantKeys = rows.map(t => Option(t._2)).toSet
      assert(landedKeys == wantKeys,
        s"landed ${landedKeys.size} keys, want ${wantKeys.size}")
    } finally q.stop()
  }
}
