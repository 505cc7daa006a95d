package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.config.{DedupeConfig, FieldSpec}
import graft.testgen.FakePersons

/** The reference's active-learning session (pgdedupe/run.py:161-173)
  * closed non-interactively: uncertainty sampling against a
  * ground-truth label oracle, gated on LABEL EFFICIENCY — the
  * actively-trained model must clear the pool-level quality bar with
  * at most HALF the labels that random sampling needs (the entire
  * point of dedupe's console loop: ask the human only about pairs the
  * model can't already decide).
  */
class ActiveLearningSpec extends SparkSpec {

  private val cfg = DedupeConfig(
    key = "entry_id",
    fields = Seq(
      FieldSpec("first_name", "String"),
      FieldSpec("last_name", "String"),
      FieldSpec("ssn", "String", hasMissing = true),
      FieldSpec("sex", "Categorical", Seq("M", "F"), hasMissing = true),
      FieldSpec("dob", "String", hasMissing = true)),
    interactions = Seq(Seq("first_name", "last_name")),
    filterCondition = "first_name IS NOT NULL",
    threshold = 0.5)

  /** Blocked candidate pool over the FakePersons population with both
    * uuids kept: `l_uuid === r_uuid` IS the ground truth the oracle
    * labels from (twins carry a distinct uuid, so they are genuine hard
    * negatives). COARSE blocking — last-name initial — puts the pool in
    * the regime a real labeling session faces: overwhelmingly easy
    * negatives (~97%), a thin boundary of mutated dups and twins.
    * Random draws are then negative-dominated and rarely show the model
    * a boundary case; uncertainty sampling exists precisely to fix
    * that (dedupe's console loop, run.py:161-173).
    */
  private def pool: DataFrame = {
    val e = FakePersons.population(spark, 400, seed = 42L)
    def side(p: String) = e.select(
      col("entry_id").as(s"${p}_id") +: col("uuid").as(s"${p}_uuid") +:
        cfg.columns.map(c => col(c).as(s"${p}_$c")): _*)
    side("l").join(side("r"),
        substring(col("l_last_name"), 1, 1) ===
          substring(col("r_last_name"), 1, 1))
      .where(col("l_id") < col("r_id"))
  }

  /** The simulated labeler: ground truth from the uuid columns the pool
    * carries (a real session would put a human or a labeling service
    * here).
    */
  private val oracle: DataFrame => DataFrame = df =>
    df.withColumn("label",
      when(col("l_uuid") === col("r_uuid"), 1.0).otherwise(0.0))

  /** Match-class F1 over the whole pool at the config threshold — the
    * pool-level quality bar. Accuracy would be dominated by the easy
    * negatives; F1 is sensitive to exactly the boundary the sampler is
    * supposed to resolve.
    */
  private def matchF1(model: LogisticModel, p: DataFrame): Double = {
    val scored = model.scorePairs(cfg, p).select(
      (col("score") >= cfg.threshold).as("pred"),
      (col("l_uuid") === col("r_uuid")).as("truth"))
    val a = scored.agg(
      sum(when(col("pred") && col("truth"), 1L).otherwise(0L)),
      sum(when(col("pred") && !col("truth"), 1L).otherwise(0L)),
      sum(when(!col("pred") && col("truth"), 1L).otherwise(0L))).head()
    val (tp, fp, fn) = (a.getLong(0), a.getLong(1), a.getLong(2))
    if (tp == 0) 0.0 else 2.0 * tp / (2.0 * tp + fp + fn)
  }

  private def seedPairs(p: DataFrame): DataFrame = {
    val m = p.where(col("l_uuid") === col("r_uuid"))
      .orderBy("l_id", "r_id").limit(1)
    val d = p.where(col("l_uuid") =!= col("r_uuid"))
      .orderBy("l_id", "r_id").limit(1)
    oracle(m.unionByName(d))
  }

  test("active learning converges deterministically with a round log") {
    val p = pool.persist()
    try {
      val r1 = ActiveLearning.run(cfg, p, oracle, seedPairs(p),
        batchSize = 10, labelBudget = 60)
      val r2 = ActiveLearning.run(cfg, p, oracle, seedPairs(p),
        batchSize = 10, labelBudget = 60)
      assert(r1.rounds.nonEmpty)
      assert(Seq("fixpoint", "budget", "rounds", "pool-exhausted")
        .contains(r1.stoppedBy))
      // Label counts strictly increase until the stop round.
      assert(r1.rounds.map(_.totalLabels) ==
        r1.rounds.map(_.totalLabels).sorted)
      // Same pool, same oracle, same seed => identical session.
      assert(r1.rounds == r2.rounds, "active session not deterministic")
      assert(Settings.modelHash(cfg, r1.model) ==
        Settings.modelHash(cfg, r2.model))
    } finally p.unpersist(false)
  }

  test("consoleOracle closes the reference's console loop: y/n labels, " +
      "u drops, f/EOF finish") {
    import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream,
      StringReader}
    def drive(answers: String, batch: DataFrame) = {
      val outBuf = new ByteArrayOutputStream()
      val labeled = ActiveLearning.consoleOracle(cfg,
        new BufferedReader(new StringReader(answers)),
        new PrintStream(outBuf))(batch)
      (labeled, outBuf.toString)
    }
    val b3 = pool.orderBy("l_id", "r_id").limit(3)
    // y → 1.0; x is invalid and re-asks, then n → 0.0; u drops the row.
    val (l1, prompt) = drive("y\nx\nn\nu\n", b3)
    assert(l1.select("label").collect().map(_.getDouble(0)).toSeq ==
      Seq(1.0, 0.0))
    assert(prompt.contains("first_name"),
      "console must show the pair's field values")
    assert(prompt.contains("valid answers"),
      "invalid input must re-prompt")
    // finish drops the remainder of the batch; EOF behaves as finish.
    assert(drive("y\nf\n", b3)._1.count() === 1)
    assert(drive("", b3)._1.count() === 0)
    // End to end: a scripted console session drives the full loop and
    // ends via the reference's finish semantics (EOF after 4 answers
    // → empty batch → pool-exhausted), like `finish` at run.py:161-173.
    val sess = ActiveLearning.run(cfg, pool,
      ActiveLearning.consoleOracle(cfg,
        new BufferedReader(new StringReader("y\nn\ny\nn\n")),
        new PrintStream(new ByteArrayOutputStream())),
      seedPairs(pool), batchSize = 2, labelBudget = 20)
    assert(sess.stoppedBy == "pool-exhausted" ||
      sess.stoppedBy == "fixpoint", s"stopped by ${sess.stoppedBy}")
    assert(sess.model != null)
  }

  test("finish given AFTER labels in a batch still ends the session") {
    import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream,
      StringReader}
    val outBuf = new ByteArrayOutputStream()
    // Batch of 3: y, y, then finish MID-batch. The finish flag must
    // outlive the invocation — a per-batch flag returned the two labels,
    // `run` saw a non-empty batch, and the next round re-prompted (a
    // real TTY session would block forever on a user who already quit).
    val sess = ActiveLearning.run(cfg, pool,
      ActiveLearning.consoleOracle(cfg,
        new BufferedReader(new StringReader("y\ny\nf\n")),
        new PrintStream(outBuf)),
      seedPairs(pool), batchSize = 3, labelBudget = 20)
    assert(sess.stoppedBy == "pool-exhausted",
      s"stopped by ${sess.stoppedBy}")
    val prompts = "\\(y\\)es".r.findAllIn(outBuf.toString).length
    assert(prompts == 3,
      s"$prompts pairs were prompted — finish must silence every pair " +
        "after it, including all later batches")
  }

  test("pairs the oracle drops as unsure are never re-surfaced") {
    val p = pool.persist()
    try {
      val surfaced =
        scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long)]]
      // Labels only pairs with an even id sum; drops the rest as
      // unsure. Excluding only LABELED pairs re-surfaced the dropped
      // ones every round (the model barely moves between rounds, so
      // the same unanswerable pairs stay the most uncertain).
      val picky: DataFrame => DataFrame = df => {
        surfaced += df.select("l_id", "r_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        oracle(df).where((col("l_id") + col("r_id")) % 2 === 0)
      }
      val sess = ActiveLearning.run(cfg, p, picky, seedPairs(p),
        batchSize = 8, labelBudget = 40)
      assert(sess.rounds.nonEmpty)
      val all = surfaced.toSeq.flatten
      assert(all.distinct.length == all.length,
        s"re-surfaced pairs: ${all.diff(all.distinct).distinct}")
    } finally p.unpersist(false)
  }

  test("uncertainty sampling clears the quality bar with <= half the " +
      "labels random sampling needs") {
    val p = pool.persist()
    try {
      val active = ActiveLearning.run(cfg, p, oracle, seedPairs(p),
        batchSize = 10, labelBudget = 100)
      val f1Active = matchF1(active.model, p)
      val nActive = active.totalLabels
      info(s"active: $nActive labels, F1 $f1Active, " +
        s"stopped by ${active.stoppedBy} after ${active.rounds.length} " +
        "rounds")
      // Centered between the deterministic measurements: active reaches
      // F1 0.967 with 100 labels; random at 200 labels reaches 0.889.
      val bar = 0.93
      assert(f1Active >= bar,
        s"active model F1 $f1Active < $bar with $nActive labels")
      // Random baseline at DOUBLE the active label count: a
      // deterministic pseudo-random draw (seeded xxhash order) from the
      // same pool, labeled by the same oracle, trained by the same
      // IRLS. It must still miss the bar — i.e. active reached it with
      // <= half the labels.
      val randomSample = oracle(
        p.orderBy(xxhash64(col("l_id"), col("r_id"), lit(17)))
          .limit(2 * nActive))
      val f1Random = matchF1(Training.train(cfg, randomSample), p)
      info(s"random: ${2 * nActive} labels, F1 $f1Random")
      assert(f1Random < bar,
        s"random sampling at ${2 * nActive} labels already reaches " +
          s"F1 $f1Random >= $bar — active sampling shows no label-" +
          "efficiency advantage on this pool")
    } finally p.unpersist(false)
  }
}
