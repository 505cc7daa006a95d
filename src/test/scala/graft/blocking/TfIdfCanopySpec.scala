package graft.blocking

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the TF-IDF sims contract behind the df>=2 diagonal shortcut:
  * every a != b cosine must equal an independent brute-force
  * computation (singleton tokens cannot pair distinct values, so
  * dropping them from the self-join loses nothing), and every value
  * with at least one indexable token must appear on the diagonal with
  * cosine exactly 1.
  */
class TfIdfCanopySpec extends SparkSpec {

  // Mixed shapes on purpose: shared rare token ("smith"), a stop-word
  // candidate ("the" in 3/6 values = exactly the 0.5 ratio bound),
  // singleton-only values ("unique"), repeated tokens within one value.
  private val values = Seq(
    "bob smith", "robert smith", "the bob", "the cat", "the the cat",
    "unique")

  private def bruteCos(maxDfRatio: Double): Map[(String, String), Double] = {
    val n = values.size
    val tf: Map[String, Map[String, Int]] = values.map { v =>
      v -> v.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, ts) => t -> ts.length }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, ts) => t -> ts.size }
    val wts: Map[String, Map[String, Double]] = tf.map { case (v, m) =>
      v -> m.collect {
        case (t, c) if df(t) <= n * maxDfRatio &&
            c * math.log(n.toDouble / df(t)) > 0 =>
          t -> c * math.log(n.toDouble / df(t))
      }
    }
    val pairs = for {
      a <- values; b <- values
      wa = wts(a); wb = wts(b)
      dot = wa.keySet.intersect(wb.keySet).toSeq
        .map(t => wa(t) * wb(t)).sum
      if dot > 0
    } yield {
      val na = math.sqrt(wa.values.map(w => w * w).sum)
      val nb = math.sqrt(wb.values.map(w => w * w).sum)
      (a, b) -> dot / (na * nb)
    }
    pairs.toMap
  }

  test("simsTagged matches brute-force cosine off-diagonal, exact 1 on it") {
    import spark.implicits._
    val got = TfIdfCanopy.sims(values.toDF("value"), maxDfRatio = 0.5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val want = bruteCos(0.5)
    val offDiagWant = want.filter { case ((a, b), _) => a != b }
    val offDiagGot = got.filter { case ((a, b), _) => a != b }
    assert(offDiagGot.keySet === offDiagWant.keySet,
      s"off-diagonal pair set diverged: got=${offDiagGot.keySet}")
    offDiagWant.foreach { case (k, w) =>
      assert(math.abs(offDiagGot(k) - w) < 1e-12,
        s"cos($k): got ${offDiagGot(k)}, want $w")
    }
    // Diagonal: exactly 1.0 (not 1-ulp) for every value that kept at
    // least one token after the df-ratio stop-word cut.
    val diagWant = want.keys.collect { case (a, b) if a == b => a }.toSet
    val diagGot = got.collect { case ((a, b), c) if a == b => (a, c) }
    assert(diagGot.map(_._1).toSet === diagWant)
    diagGot.foreach { case (v, c) =>
      assert(c === 1.0, s"diagonal cos($v) = $c, expected exactly 1.0")
    }
    // The 0.5-ratio bound is inclusive in both implementations: "the"
    // (df 3 of 6) survives, so "the bob" ~ "the cat" must share a pair.
    assert(offDiagGot.contains(("the bob", "the cat")))
  }

  test("singleton-only values still canopy-block with themselves") {
    import spark.implicits._
    val keys = TfIdfCanopy("f", 0.8)
      .keysByValue(values.toDF("value"))
      .where(col("value") === "unique")
      .select(col("keys"))
      .as[Seq[String]].collect()
    assert(keys.length === 1 && keys.head.nonEmpty,
      "a value with only singleton tokens lost its self canopy key")
  }
}
