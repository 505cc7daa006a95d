package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generator-driven differential gate for the ANN family, completing
  * the randomized-twin coverage (curation: text.RandomizedDifferentialSpec;
  * dedup: dedup.RandomizedDedupDifferentialSpec): brute-force KNN, the
  * hyperplane signatures, IVF full-probe, and the LSH pair generator are
  * replayed on seeded hostile vector corpora — null vectors, zero-norm
  * vectors (NaN cosine), exact duplicates, negated copies (cosine −1),
  * ×4-scaled copies (float-exact cosine 1), subnormal-tiny and huge
  * magnitudes, short (dim-mismatched) vectors, null ids.
  *
  * The twins use independent dataflows: cosine as three HOF
  * `aggregate(zip_with(...))` folds (vs the fused single-loop
  * [[graft.functions.CosineSimilarity]] — ascending-index summation on
  * both sides, so agreement is required to the BIT), signatures as a
  * driver-side fold over [[Knn.planeComponent]] from the definition,
  * and IVF at full probe must equal brute force exactly.
  */
class RandomizedAnnDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  /** Hostile random vectors: ~5% null, ~5% zero-norm, ~8% exact dup of
    * an earlier vector, ~5% negated copy, ~5% ×4-scaled copy (float
    * arithmetic keeps its cosine exactly 1), ~4% short (length 5), one
    * subnormal-tiny and one huge band, ~2% null ids.
    */
  private def corpus(seed: Long, n: Int): DataFrame = {
    val r = new scala.util.Random(seed)
    val pool = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    def rand(): Array[Float] =
      Array.fill(Dim)((r.nextGaussian() * (1 + r.nextInt(3))).toFloat)
    val rows = (0 until n).map { i =>
      val id: Option[Long] =
        if (r.nextInt(50) == 0) None else Some(i.toLong * 37L - 1000L)
      val v: Array[Float] = r.nextInt(25) match {
        case 0 => null
        case 1 => Array.fill(Dim)(0.0f)
        case 2 | 3 if pool.nonEmpty => pool(r.nextInt(pool.size))
        case 4 if pool.nonEmpty =>
          pool(r.nextInt(pool.size)).map(x => -x)
        case 5 if pool.nonEmpty =>
          pool(r.nextInt(pool.size)).map(_ * 4.0f)
        case 6 => Array.fill(5)(r.nextGaussian().toFloat) // short
        case 7 => rand().map(_ * 1e-30f)
        case 8 => rand().map(_ * 1e30f)
        case _ => rand()
      }
      if (v != null && pool.size < 100 && v.length == Dim) pool += v
      (id, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  /** Independent cosine: three HOF folds, ascending index, double
    * accumulation — the dataflow the fused expression replaced.
    * try_divide, because the twin runs under the session's ANSI mode
    * where SQL `/` THROWS on a zero divisor; the engine's expression
    * divides in Java and yields NaN there instead. A zero divisor here
    * implies an all-zero vector, whose dot is exactly 0 too — so the
    * engine's 0/0 NaN and the twin's try_divide NULL are both removed
    * by the same defined-cosine filter, and every surviving row is
    * bit-identical.
    */
  private def cosTwin(a: Column, b: Column): Column = {
    def dd(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0d), (acc, v) => acc + v)
    try_divide(dd(a, b), sqrt(dd(a, a)) * sqrt(dd(b, b)))
  }

  private def definedCos(c: Column): Column = c.isNotNull && !isnan(c)

  test("bruteForceTopK matches the HOF-cosine SQL twin bit-for-bit on " +
      "hostile random corpora (NaN/zero-norm/null/short all excluded " +
      "identically)") {
    import org.apache.spark.sql.expressions.Window
    Seq(2L, 41L, 1234L).foreach { seed =>
      val docs = corpus(seed, 150)
      val queries = docs.where(col("vec_id") % 5 === 0)
      val got = Knn.bruteForceTopK(docs, queries, k = 5)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString())
      val w = Window.partitionBy("query_id")
        .orderBy(col("cosine").desc, col("neighbor_id").asc)
      val want = queries
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .crossJoin(docs.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv")))
        .where(col("query_id") =!= col("neighbor_id"))
        .withColumn("cosine", cosTwin(col("qv"), col("cv")))
        .where(definedCos(col("cosine")))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString())
      assert(got == want, s"bruteForceTopK diverged at seed $seed " +
        s"(got ${got.size} rows, want ${want.size})")
    }
  }

  test("tableSignatures matches a driver-side fold over planeComponent " +
      "from the definition (short vectors sign to 0 on every table)") {
    val (np, nt) = (6, 3)
    Seq(9L, 77L).foreach { seed =>
      val docs = corpus(seed, 120)
      val got = Knn.tableSignatures(docs, "vec_id", "embedding",
          numPlanes = np, numTables = nt, dim = Dim)
        .collect()
        .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
          r.getInt(1), r.getLong(2)))
        .toSeq.sortBy(_.toString())
      val want = docs.collect().flatMap { r =>
        val id = if (r.isNullAt(0)) None else Some(r.getLong(0))
        val v = if (r.isNullAt(1)) null
          else r.getSeq[Float](1).toArray
        if (v == null) Seq.empty
        else (0 until nt).map { t =>
          val bits =
            if (v.length < Dim) 0L
            else (0 until np).foldLeft(0L) { (acc, p) =>
              var s = 0.0d
              var d = 0
              while (d < Dim) {
                s += v(d) * Knn.planeComponent(t * np + p, d)
                d += 1
              }
              if (s >= 0) acc | (1L << p) else acc
            }
          (id, t, bits)
        }
      }.toSeq.sortBy(_.toString())
      assert(got == want, s"tableSignatures diverged at seed $seed")
    }
  }

  test("ivfTopK at full probe equals bruteForceTopK exactly on random " +
      "corpora (the q49 claim, re-proven on hostile data every run)") {
    Seq(5L, 303L).foreach { seed =>
      // KMeans needs uniform dimensionality: drop the short vectors but
      // keep nulls, zeros, dups, negations, scaled, tiny, huge.
      val docs = corpus(seed, 150)
        .where(col("embedding").isNull || size(col("embedding")) === Dim)
      val queries = docs.where(col("vec_id") % 5 === 0)
      val brute = Knn.bruteForceTopK(docs, queries, k = 4)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString())
      val ivf = Knn.ivfTopK(docs, queries, k = 4, nlist = 4, nprobe = 4,
          seed = 7L)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString())
      assert(ivf == brute, s"full-probe IVF diverged from brute at " +
        s"seed $seed (ivf ${ivf.size} rows, brute ${brute.size})")
    }
  }

  test("lshSimilarPairs is precision-exact and a subset of the brute " +
      "pair set; no zero-norm vector ever pairs; partitioning-invariant") {
    val threshold = 0.8
    val docs = corpus(321L, 150)
    def run(d: DataFrame): Seq[Seq[Any]] =
      Knn.lshSimilarPairs(d, threshold, numPlanes = 6, numTables = 8,
          knownDim = Dim)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString())
    val got = run(docs)
    // Brute truth: every defined-cosine pair at or above the threshold.
    val brute = docs.select(col("vec_id").as("a_id"),
        col("embedding").as("va"))
      .crossJoin(docs.select(col("vec_id").as("b_id"),
        col("embedding").as("vb")))
      .where(col("a_id") < col("b_id"))
      .withColumn("cosine", cosTwin(col("va"), col("vb")))
      .where(definedCos(col("cosine")) && col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString())
    val bruteKeys = brute.map(r => (r(0), r(1))).toSet
    got.foreach { r =>
      assert(bruteKeys.contains((r(0), r(1))),
        s"LSH emitted a pair brute force rejects: $r")
      assert(!r(2).asInstanceOf[Double].isNaN, s"NaN cosine emitted: $r")
    }
    // Zero-norm vectors share every bucket (all sign bits fire on
    // projection 0) — the verify must drop them all.
    val zeroIds = docs
      .where(col("embedding").isNotNull &&
        coalesce(Knn.l2Norm(col("embedding")), lit(0.0)) === 0.0)
      .select("vec_id").as[java.lang.Long].collect().filter(_ != null)
      .map(Long.unbox(_)).toSet
    got.foreach { r =>
      assert(!zeroIds.contains(r(0).asInstanceOf[Long]) &&
        !zeroIds.contains(r(1).asInstanceOf[Long]),
        s"zero-norm vector paired: $r")
    }
    // Exact duplicates land in identical buckets in every table — the
    // LSH can never miss them, so the random corpus guarantees a
    // non-empty result (dups are generated with p ~ 8%).
    assert(got.nonEmpty, "no pairs found — generator should produce dups")
    // Same answer from 1-partition and 17-partition layouts.
    assert(run(docs.coalesce(1)) == got)
    assert(run(docs.repartition(17)) == got)
  }
}
