package graft

import org.apache.spark.sql.DataFrame

/** Suite-wide ANSI gate: the ENTIRE `SparkEntry.queries` battery (all
  * 64 operators, including the q50 trained pipeline) must return
  * bit-identical answers with `spark.sql.ansi.enabled` true and false.
  *
  * Why this exists: ANSI mode (the Spark 4 default posture) turns
  * silent SQL-ish behavior into runtime errors — `element_at` past the
  * end THROWS instead of returning null, `CAST('junk' AS INT)` ABORTS
  * the job instead of producing null, 0/0 in a double division still
  * yields NaN but integer division by zero throws. Round 16 fixed four
  * such hazards found only by hand review (PredicateLearner
  * try_element_at, Predicates try_cast, TextDedup 0/0 jaccard, Knn
  * accessors); this gate makes the class un-reintroducible — any op
  * that harbors an ANSI-throwing expression fails here at sf0.001
  * before review ever sees it, and any op whose ANSWER silently
  * changes under ANSI (a cast returning null vs a value) fails the
  * equality half.
  *
  * Conf mutation: `spark.sql.ansi.enabled` is runtime-mutable and this
  * suite restores it in `finally`; suites run sequentially in this
  * project (same documented posture as PlanSpec's shared-conf note).
  * The cache is cleared between passes so no plan fragment computed in
  * one mode can serve the other.
  */
class AnsiGateSpec extends SparkSpec {

  /** Order-independent canonical form: every row rendered (arrays and
    * nested structs included — Row.toString is deterministic), then
    * sorted. Doubles render via toString, so a single-bit divergence
    * between modes is visible.
    */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("all 76 queries answer identically with ansi.enabled true and " +
      "false (and none throws under ANSI)") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    assert(names.size == 76)
    def battery(): Map[String, Seq[String]] = names.map { n =>
      val rows =
        try canon(SparkEntry.queries(n)(spark, sf0001))
        catch {
          case e: Throwable =>
            fail(s"$n failed under ansi.enabled=" +
              s"${spark.conf.get("spark.sql.ansi.enabled")}: $e")
        }
      n -> rows
    }.toMap
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val plain = battery()
      spark.catalog.clearCache()
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val ansi = battery()
      for (n <- names) {
        assert(ansi(n).size == plain(n).size,
          s"$n row count diverges under ANSI: " +
            s"${ansi(n).size} vs ${plain(n).size}")
        assert(ansi(n) == plain(n),
          s"$n answer diverges under ANSI; first differing row: " +
            ansi(n).zip(plain(n)).collectFirst {
              case (a, p) if a != p => s"ansi=$a plain=$p"
            }.getOrElse("<same rows, different order?>"))
      }
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", prev)
      spark.catalog.clearCache()
    }
  }

  test("GLOBAL plan hygiene: no query plans a CartesianProduct or " +
      "nested-loop join except the declared brute-force oracles, and " +
      "none plans a ScalaUDF") {
    // Piggybacks on the same battery surface: every queries() entry is
    // planned once and its executed plan swept. The allowlist is the
    // DECLARED exactness oracles whose whole point is the N² compare
    // (SURVEY §8); anything else going cartesian means a join key was
    // silently lost, and any ScalaUDF means a codegen fence crept back
    // into a shipped plan (the affine-gap conversion removed the last
    // one in round 19).
    val declaredCartesian = Set(
      "q44_knn_bruteforce", // brute-force KNN: the N² oracle itself
      "q48_embedding_neardup", // exact near-dup over all pairs (oracle)
      // IVF centroid assignment: every vector scores against the
      // BROADCAST centroid table — a bounded nested loop whose inner
      // side is a constant-size (≤ nlist) frame, not an N² join.
      "q46_knn_ivf", "q49_knn_ivf_fullprobe"
    )
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sf0001)
        .queryExecution.executedPlan.toString
      if (!declaredCartesian(n))
        assert(!plan.contains("CartesianProduct") &&
            !plan.contains("BroadcastNestedLoop"),
          s"$n plans a cartesian/nested-loop join:\n$plan")
      assert(!plan.contains("ScalaUDF"),
        s"$n plans a ScalaUDF (codegen fence):\n$plan")
    }
  }
}
