package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates the salted skew join: answer parity with the plain join, the
  * hot key actually spreading across all salt sub-keys (the straggler
  * becomes saltFactor even tasks), cold keys staying unreplicated, and
  * determinism across runs.
  */
class SkewJoinSpec extends SparkSpec {

  private def skewed() = {
    import spark.implicits._
    // 10,000 fact rows, 60% on one hot key; 50-key dim.
    val fact = (0 until 10000).map { i =>
      val k = if (i % 10 < 6) 7L else (i % 50).toLong
      (k, i.toLong)
    }.toDF("k", "payload")
    val dim = (0 until 50).map(k => (k.toLong, s"name_$k"))
      .toDF("k", "name")
    (fact, dim)
  }

  test("salted inner join matches the plain join row-for-row") {
    val (fact, dim) = skewed()
    val salted = SkewJoin.saltedInner(fact, dim, "k",
      saltFactor = 8, hotKeyThreshold = 500)
    val plain = fact.join(dim, "k")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty &&
      plain.exceptAll(salted).isEmpty,
      "salted join answer diverged from the plain join")
  }

  test("the hot key spreads across every salt sub-key; cold keys do not") {
    val (fact, dim) = skewed()
    val saltFactor = 8
    // Re-derive the salted fact exactly as saltedInner does, to measure
    // the spread the join actually sees.
    val hot = typedlit(Seq(7L))
    val factSalted = fact.withColumn("_salt",
      when(array_contains(hot, col("k")),
        pmod(hash(struct(fact.columns.map(col): _*)), lit(saltFactor)))
        .otherwise(lit(0)))
    val spread = factSalted.where(col("k") === 7L)
      .groupBy("_salt").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(spread.keySet == (0 until saltFactor).toSet,
      s"hot key missing sub-keys: $spread")
    // 6,000 hot rows over 8 sub-keys: each sub-task within 3x of even.
    assert(spread.values.forall(n => n > 750 / 3 && n < 750 * 3),
      s"hot-key spread badly uneven: $spread")
    // Cold dim rows are not replicated (one salt value), hot dim rows
    // are replicated saltFactor times.
    val dimSalted = dim.withColumn("_salt",
      explode(when(array_contains(hot, col("k")),
        sequence(lit(0), lit(saltFactor - 1)))
        .otherwise(array(lit(0)))))
    val counts = dimSalted.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(7L) === saltFactor.toLong)
    assert(counts.filter(_._1 != 7L).values.forall(_ == 1L))
  }

  test("no hot keys means a plain join (no salt column, no replication)") {
    val (fact, dim) = skewed()
    val out = SkewJoin.saltedInner(fact, dim, "k",
      saltFactor = 8, hotKeyThreshold = 100000)
    assert(!out.columns.contains("_salt"))
    assert(out.count() === fact.join(dim, "k").count())
  }

  test("plan size is O(1) in the number of hot keys") {
    import spark.implicits._
    // 5,000 hot keys vs 10: with the broadcast-tag design the hot-key
    // set rides as LocalRelation DATA, so the optimized plan's printed
    // tree must not grow with |hot| (the old lit-array form embedded
    // one literal node per key — 5,000 keys meant a 5,000-element
    // expression probed per row).
    val dim = (0 until 5000).map(k => (k.toLong, s"name_$k"))
      .toDF("k", "name")
    def factWith(distinctKeys: Int) =
      (0 until 10000).map(i => ((i % distinctKeys).toLong, i.toLong))
        .toDF("k", "payload")
    def planLen(distinctKeys: Int): Int =
      SkewJoin.saltedInner(factWith(distinctKeys), dim, "k",
          saltFactor = 4, hotKeyThreshold = 1)
        .queryExecution.optimizedPlan.toString.length
    val (few, many) = (planLen(10), planLen(5000))
    assert(many < few * 2,
      s"plan grew with hot-key count: $few chars @ 10 keys, " +
        s"$many chars @ 5000 keys")
    // And the 5,000-hot-key join still answers correctly.
    val fact = factWith(5000)
    assert(SkewJoin.saltedInner(fact, dim, "k", saltFactor = 4,
      hotKeyThreshold = 1).count() === fact.join(dim, "k").count())
  }

  test("caller-owned _salt column survives (collision-safe internals)") {
    import spark.implicits._
    val fact = (0 until 1000).map(i => (7L, i.toLong, i % 3))
      .toDF("k", "payload", "_salt")
    val dim = Seq((7L, "seven"), (8L, "eight")).toDF("k", "name")
    val out = SkewJoin.saltedInner(fact, dim, "k",
      saltFactor = 4, hotKeyThreshold = 10)
    assert(out.columns.count(_ == "_salt") === 1,
      "internal salt column collided with the caller's _salt")
    val plain = fact.join(dim, "k")
    assert(out.exceptAll(plain).isEmpty && plain.exceptAll(out).isEmpty,
      "salted join answer diverged when the caller owns _salt")
  }

  test("salting is deterministic across runs") {
    val (fact, dim) = skewed()
    def run() = SkewJoin.saltedInner(fact, dim, "k",
      saltFactor = 8, hotKeyThreshold = 500)
      .orderBy("k", "payload").collect().toSeq
    assert(run() == run())
  }

  test("a map-typed fact column does not break the skewed path") {
    import spark.implicits._
    // hash() rejects MapType at analysis time, and only the SKEWED
    // branch hashes — an unguarded whole-row hash made map-carrying
    // schemas a latent production-only failure that plain join handles
    // fine. Map columns are excluded from the salt derivation instead.
    val (fact0, dim) = skewed()
    val fact = fact0.withColumn("props",
      map(lit("p"), col("payload").cast("string")))
    val salted = SkewJoin.saltedInner(fact, dim, "k",
      saltFactor = 8, hotKeyThreshold = 500)
    val plain = fact.join(dim, "k")
    assert(salted.count() === plain.count())
    assert(salted.select("k", "payload", "name")
        .exceptAll(plain.select("k", "payload", "name")).isEmpty,
      "salted join with a map column diverged from the plain join")
  }

  test("case-variant _Salt caller column and a key named cnt both " +
      "survive (resolver is case-insensitive; aliases are fresh)") {
    import spark.implicits._
    // Spark resolves column names case-insensitively by default, so a
    // case-sensitive freshName check would let withColumn REPLACE the
    // caller's _Salt and drop(saltCol) delete it.
    val fact = (0 until 1000).map(i => (7L, i.toLong, i % 3))
      .toDF("k", "payload", "_Salt")
    val dim = Seq((7L, "seven")).toDF("k", "name")
    val out = SkewJoin.saltedInner(fact, dim, "k",
      saltFactor = 4, hotKeyThreshold = 10)
    assert(out.columns.contains("_Salt"),
      s"caller's _Salt vanished: ${out.columns.mkString(",")}")
    val plain = fact.join(dim, "k")
    assert(out.exceptAll(plain).isEmpty && plain.exceptAll(out).isEmpty)
    // A key literally named "cnt" must not collide with the hot-key
    // count alias.
    val factCnt = (0 until 1000).map(i => (7L, i.toLong)).toDF("cnt", "p")
    val dimCnt = Seq((7L, "seven")).toDF("cnt", "name")
    val outCnt = SkewJoin.saltedInner(factCnt, dimCnt, "cnt",
      saltFactor = 4, hotKeyThreshold = 10)
    assert(outCnt.count() === factCnt.join(dimCnt, "cnt").count())
  }
}
