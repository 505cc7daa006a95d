package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Generator-driven differential gate for the RELATIONAL family
  * (q01–q19) — the last family without one (dedup, ANN, blocking and
  * curation replay on hostile random corpora every run; these demos
  * were fixture-only). Each QueryDef's actual DataFrame program runs
  * over seeded hostile versions of the harness tables written as real
  * parquet (same `Tables.load` ingestion path as production), and is
  * compared against its own ORACLE SQL executed by Spark over the same
  * tables: 16 of the 19 oracles are pure ANSI and run verbatim; the
  * three written in DuckDB dialect (q04 list functions, q05
  * string_split/unnest, q13 list_sort/array_to_string) get hand
  * restatements of the same contract in Spark SQL.
  *
  * The hostile generators pack the historically-breaking inputs: null
  * and empty strings and segments, unicode, quoted commas, skewed
  * domains, negative/huge spread keys, orphan foreign keys on BOTH
  * sides of every join (customers pointing at missing nations, orders
  * at missing customers, null join keys), boundary values sitting
  * exactly on q01/q08's filter thresholds, and exact-duplicate text
  * clusters for q13. What this catches that the fixture gate cannot:
  * a library op (denseIds, mergeEdges, exactByHash, saltedInner)
  * whose Spark composition silently diverges from its declared SQL
  * contract on a shape the fixtures never produce.
  */
class RandomizedRelationalDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val tableNames =
    Seq("region", "nation", "customer", "orders", "lineitem", "documents")

  /** Writes the six hostile tables for `seed` under `dir` as parquet
    * (the exact layout `Tables.load` reads) and registers same-named
    * temp views for the oracle SQL.
    */
  private def writeTables(seed: Long, dir: String): Unit = {
    val r = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(r.nextInt(xs.length))

    val regions = (0L until 3L).map(k => (k, Seq("AMERICA", "亜細亜", "")(k.toInt)))
      .toDF("r_regionkey", "r_name")
    // Nation 6 points at a region that does not exist (orphan FK).
    val nations = (0L until 7L).map { k =>
      (k, Seq("FRANCE", null, "", "日本", "PERU", "KEN YA", "GHOST")(k.toInt),
        if (k == 6L) 9L else k % 3L)
    }.toDF("n_nationkey", "n_name", "n_regionkey")

    val segs = Seq("BUILDING", null, "", "AUTOMOBILE", "ünï™", "MACHINERY")
    val names = Seq("Alice, \"quoted\"", null, "", "字符 name",
      "Bob  double-spaced", "x" * 30)
    val customers = (0 until 300).map { i =>
      val seg = if (r.nextInt(10) < 6) "BUILDING" else pick(segs)
      // c_nationkey up to 8: values 7 and 8 match no nation (orphans).
      (i.toLong * 1000003L - 150000000L, pick(names), seg,
        r.nextInt(9).toLong)
    }.toDF("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
    val custKeys = (0 until 300)
      .map(i => i.toLong * 1000003L - 150000000L)

    val statuses = Seq("O", "F", null, "P")
    val prios = Seq("1-URGENT", "5-LOW", null, "", "3-MEDIUM")
    val orders = (0 until 600).map { i =>
      val ck: java.lang.Long =
        if (r.nextInt(20) == 0) null // null join key
        else if (r.nextInt(10) == 0) 999999999L + i // orphan customer
        else custKeys(r.nextInt(custKeys.length))
      val price = r.nextInt(6) match {
        case 0 => 100000.0 // exactly on q01's > threshold
        case 1 => 0.0
        case 2 => -42.5 // negative money
        case _ => math.round(r.nextDouble() * 50000000.0) / 100.0
      }
      (i.toLong * 7919L - 2000000L, ck, price, pick(statuses), pick(prios))
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
      "o_orderpriority")
    val orderKeys = (0 until 600).map(i => i.toLong * 7919L - 2000000L)

    val flags = Seq("A", "N", "R", null)
    val lineitems = (0 until 800).map { i =>
      // Skew ~40% of rows onto one hot order key.
      val ok = if (r.nextInt(5) < 2) orderKeys.head
        else orderKeys(r.nextInt(orderKeys.length))
      val disc = r.nextInt(5) match {
        case 0 => 0.05 // exactly on q08's > threshold
        case 1 => 0.0
        case _ => r.nextInt(11) * 0.01
      }
      (ok, 1 + r.nextInt(7), r.nextLong() % 100000L, pick(flags), disc)
    }.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag",
      "l_discount")

    val texts = Seq("the cat sat", "", null, "dup cluster body",
      "ünïcode 🚀 text", "dup cluster body", "solo " + "y" * 50)
    val documents = (0 until 250).map { i =>
      (i.toLong * 104729L - 10000000L,
        if (r.nextInt(4) == 0) "dup cluster body" else pick(texts))
    }.toDF("doc_id", "text")

    Seq("region" -> regions, "nation" -> nations, "customer" -> customers,
      "orders" -> orders, "lineitem" -> lineitems,
      "documents" -> documents).foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$n.parquet")
      graft.Tables.load(spark, dir, n).createOrReplaceTempView(n)
    }
  }

  /** Spark-SQL restatements for the three DuckDB-dialect oracles. */
  private val sparkTwins: Map[String, String] = Map(
    "q04_array_agg_slice" ->
      """SELECT l_orderkey,
          array_join(cast(sorted_arr AS array<string>), ',') AS sorted_ids,
          array_join(cast(slice(sorted_arr, 1,
            int(array_position(sorted_arr, element_at(sorted_arr, -1)) - 1))
            AS array<string>), ',') AS smaller_ids
        FROM (SELECT l_orderkey,
            sort_array(collect_set(l_linenumber)) AS sorted_arr
          FROM lineitem GROUP BY l_orderkey)""",
    "q05_unnest" ->
      """SELECT doc_id, tok FROM (
          SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents)
        WHERE tok <> ''""",
    "q13_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
          count(*) AS dup_count,
          array_join(cast(sort_array(collect_list(doc_id))
            AS array<string>), ',') AS member_ids
        FROM documents WHERE text IS NOT NULL GROUP BY md5(text)
        UNION ALL
        SELECT cast(NULL AS string) AS content_hash,
          doc_id AS canonical_id, cast(1 AS bigint) AS dup_count,
          cast(doc_id AS string) AS member_ids
        FROM documents WHERE text IS NULL""")

  private def check(name: String, seed: Long, got: DataFrame,
      want0: DataFrame): Unit = {
    // Align twin column ORDER to the program's (the driver's comparator
    // sorts columns by name; this row-wise one must line them up).
    val want = want0.select(got.columns.map(org.apache.spark.sql.functions.col)
      .toIndexedSeq: _*)
    val g = got.collect().map(_.toSeq).toSeq.sortBy(_.toString())
    val w = want.collect().map(_.toSeq).toSeq.sortBy(_.toString())
    assert(g == w, s"$name diverged from its SQL twin at seed $seed " +
      s"(got ${g.size} rows, want ${w.size})")
  }

  test("q01–q19 DataFrame programs match their oracle SQL on random " +
      "adversarial tables (3 seeds)") {
    val relational = RelationalQueries.defs
      .filter(_.name.matches("q(0[1-9]|1[0-9])_.*"))
    assert(relational.size == 19, relational.map(_.name).mkString(","))
    Seq(17L, 323L, 90210L).foreach { seed =>
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_rrd_" +
        s"${ProcessHandle.current().pid()}/seed_$seed"
      writeTables(seed, dir)
      relational.foreach { d =>
        val twin = sparkTwins.getOrElse(d.name, d.oracle.getOrElse(
          fail(s"${d.name} has neither an ANSI oracle nor a Spark twin")))
        check(d.name, seed, d.run(spark, dir), spark.sql(twin))
      }
    }
  }
}
