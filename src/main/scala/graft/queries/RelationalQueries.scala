package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.cluster.ExactMatches
import graft.ops.RelationalOps
import QueryDef.{descale, exactSum, sqlExactSum}

/** The reference's relational operator surface (SURVEY.md §2.1–2.5/§2.7)
  * demonstrated over the harness tables, each with a DuckDB oracle.
  * Ref rows cited per query.
  */
object RelationalQueries {

  /** Per-process scratch path for the source/sink round-trip demos
    * (q25–q28). A fixed tmpdir path races when two graft JVMs run
    * concurrently on one host (verify alongside bench): both overwrite
    * the same directory and one can read a half-written sibling's
    * output. Keying by pid isolates each JVM; directories are
    * idempotently overwritten within a process, so reruns stay cheap.
    */
  private def demoPath(name: String): String = {
    val pid = ProcessHandle.current().pid()
    s"${System.getProperty("java.io.tmpdir")}/graft_demo_$pid/$name"
  }

  /** Per-process catalog table name for the bucketed demo — the session
    * catalog is JVM-local, but the `path` option is not, so the table
    * name is keyed the same way as [[demoPath]] to keep name and path
    * consistent.
    */
  private def demoTable(name: String): String =
    s"${name}_${ProcessHandle.current().pid()}"

  val defs: Seq[QueryDef] = Seq(

    // S1/P1/P2 — scan + config-driven projection + filter_condition
    // (ref pgdedupe/run.py:138-144, :35, :95).
    QueryDef(
      "q01_scan_filter_project",
      (s, dir) => Tables.load(s, dir, "orders")
        .where(col("o_totalprice") > 100000.0 &&
          col("o_orderstatus").isNotNull &&
          (col("o_orderpriority") === "1-URGENT" ||
            col("o_totalprice") > 400000.0))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("total")),
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        FROM orders
        WHERE o_totalprice > 100000.0 AND o_orderstatus IS NOT NULL
          AND (o_orderpriority = '1-URGENT' OR o_totalprice > 400000.0)""")),

    // S2 — DISTINCT scan feeding index predicates (ref run.py:217-222).
    QueryDef(
      "q02_distinct",
      (s, dir) => Tables.load(s, dir, "customer")
        .select("c_mktsegment").distinct(),
      Some("SELECT DISTINCT c_mktsegment FROM customer")),

    // P3/P4 — COALESCE + string concat (ref run.py:442-444,
    // tests/initialize_db.py:36-37 full_name derivation).
    QueryDef(
      "q03_concat_coalesce",
      (s, dir) => Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          concat_ws(" ", col("c_name"), col("c_mktsegment")).as("full_name"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
            lit("OTHER")).as("seg")),
      Some("""SELECT c_custkey,
          concat_ws(' ', c_name, c_mktsegment) AS full_name,
          coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg
        FROM customer""")),

    // A3/P5/P6 — sorted array_agg + slice up to array_position
    // (ref run.py:297-303, :314-319; array_position replaces the custom
    // idx() SQL function at run.py:81-89). Array outputs are serialized
    // to csv strings for the comparator (the driver's pandas sort cannot
    // hash ndarray cells); the library ops keep real arrays.
    QueryDef(
      "q04_array_agg_slice",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set("l_linenumber")).as("sorted_arr"))
        .select(col("l_orderkey"),
          array_join(col("sorted_arr").cast("array<string>"), ",")
            .as("sorted_ids"),
          array_join(
            slice(col("sorted_arr"), lit(1),
              (array_position(col("sorted_arr"),
                element_at(col("sorted_arr"), -1)) - 1).cast("int"))
              .cast("array<string>"), ",")
            .as("smaller_ids")),
      Some("""SELECT l_orderkey,
          coalesce(array_to_string(sorted_arr, ','), '') AS sorted_ids,
          coalesce(array_to_string(list_slice(sorted_arr, 1,
            list_position(sorted_arr, sorted_arr[-1]) - 1), ','), '')
            AS smaller_ids
        FROM (SELECT l_orderkey,
            list_sort(list_distinct(array_agg(l_linenumber))) AS sorted_arr
          FROM lineitem GROUP BY l_orderkey)""")),

    // P7 — unnest/explode (ref run.py:473-475).
    QueryDef(
      "q05_unnest",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          explode(filter(split(col("text"), " "), t => t =!= ""))
            .as("tok")),
      Some("""SELECT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents) WHERE tok <> ''""")),

    // P8 — dense surrogate row ids (ref SERIAL at run.py:97-98) via
    // RelationalOps.denseIds: range-repartitioned sort + zipWithIndex,
    // NOT row_number() over an unpartitioned window — the global window
    // serializes the whole table through one task, the exact plan denseIds
    // exists to avoid. Numbering is identical for unique keys, so the
    // row_number oracle still hash-matches (SURVEY §7.4 determinism).
    QueryDef(
      "q06_rowid",
      (s, dir) => RelationalOps.denseIds(
        Tables.load(s, dir, "customer").select("c_custkey"),
        Seq(col("c_custkey").asc), "rid"),
      Some("""SELECT c_custkey,
          row_number() OVER (ORDER BY c_custkey) AS rid
        FROM customer""")),

    // P9 — md5 fingerprint (ref pgdedupe/utils.py:20-28 model hash).
    QueryDef(
      "q07_md5",
      (s, dir) => Tables.load(s, dir, "customer")
        .select(col("c_custkey"), md5(col("c_name")).as("name_hash")),
      Some("SELECT c_custkey, md5(c_name) AS name_hash FROM customer")),

    // P10 — cast arithmetic ratios (ref validation notebook cells 7-10).
    QueryDef(
      "q08_cast_ratio",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_discount") > 0.05, 1).otherwise(0)).cast("long")
            .as("n_discounted"),
          count(lit(1)).as("n_total"))
        .select(col("l_returnflag"), col("n_discounted"), col("n_total"),
          round(col("n_discounted").cast("double") /
            col("n_total").cast("double"), 6).as("discount_ratio")),
      Some("""SELECT l_returnflag,
          CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_discounted,
          count(*) AS n_total,
          round(CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
              AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS discount_ratio
        FROM lineitem GROUP BY l_returnflag""")),

    // J1-style chained equi-joins; small dims broadcast (SURVEY §4).
    QueryDef(
      "q09_join_inner",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val n = broadcast(Tables.load(s, dir, "nation"))
        val r = broadcast(Tables.load(s, dir, "region"))
        c.join(n, col("c_nationkey") === col("n_nationkey"))
          .join(r, col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name", "r_name")
          .agg(count(lit(1)).as("n_customers"))
      },
      Some("""SELECT n_name, r_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name, r_name""")),

    // J4/P3 — right outer join + COALESCE defaults (ref run.py:441-446).
    QueryDef(
      "q10_right_join_coalesce",
      (s, dir) => {
        val oa = Tables.load(s, dir, "orders")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        oa.join(Tables.load(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"), "right_outer")
          .select(col("c_custkey"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      },
      Some("""SELECT c_custkey, coalesce(n_orders, 0) AS n_orders
        FROM (SELECT o_custkey, count(*) AS n_orders
              FROM orders GROUP BY o_custkey) oa
        RIGHT JOIN customer ON o_custkey = c_custkey""")),

    // J5 — left outer join keep-all (ref exact_matches.py:71-73).
    QueryDef(
      "q11_left_join_agg",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(descale(exactSum(coalesce(col("o_totalprice"), lit(0.0)),
            100), 100).as("spend"))
      },
      Some(s"""SELECT c_custkey,
          ${sqlExactSum("coalesce(o_totalprice, 0.0)", 100)} AS spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey""")),

    // J6 — exact-subset self-join edge list (ref exact_matches.py:76-83),
    // via the library's ExactMatches.mergeEdges.
    QueryDef(
      "q12_exact_match_edges",
      (s, dir) => ExactMatches.mergeEdges(
        Tables.load(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), "c_custkey"),
      Some("""SELECT DISTINCT t1.c_custkey AS id1, t.id2
        FROM customer t1
        JOIN (SELECT c_nationkey, c_mktsegment, min(c_custkey) AS id2
              FROM customer GROUP BY c_nationkey, c_mktsegment
              HAVING count(*) > 1) t
          USING (c_nationkey, c_mktsegment)
        WHERE t1.c_custkey > t.id2""")),

    // A1 — exact-duplicate merge by content hash (ref run.py:91-99;
    // hash-first so the shuffle carries digests, not payloads).
    QueryDef(
      "q13_exact_dedup",
      (s, dir) => graft.dedup.TextDedup.exactByHash(
          Tables.load(s, dir, "documents"))
        .withColumn("member_ids",
          array_join(col("member_ids").cast("array<string>"), ",")),
      Some("""SELECT md5(text) AS content_hash,
          min(doc_id) AS canonical_id,
          count(*) AS dup_count,
          coalesce(array_to_string(list_sort(array_agg(doc_id)), ','), '')
            AS member_ids
        FROM documents WHERE text IS NOT NULL GROUP BY md5(text)
        UNION ALL
        SELECT NULL AS content_hash, doc_id AS canonical_id,
          1 AS dup_count, CAST(doc_id AS VARCHAR) AS member_ids
        FROM documents WHERE text IS NULL""")),

    // A4 — min + HAVING canonical-target groups (ref exact_matches.py:78).
    QueryDef(
      "q14_min_having",
      (s, dir) => Tables.load(s, dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(min("c_custkey").as("id2"), count(lit(1)).as("cnt"))
        .where(col("cnt") > 1),
      Some("""SELECT c_nationkey, c_mktsegment, min(c_custkey) AS id2,
          count(*) AS cnt
        FROM customer GROUP BY c_nationkey, c_mktsegment
        HAVING count(*) > 1""")),

    // A5 — count / count distinct (ref test_integration.py:29-30).
    QueryDef(
      "q15_count_distinct",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
          count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag""")),

    // A6 — per-group plurality mode with deterministic tie-break
    // (ref validation notebook cell 6's mode() WITHIN GROUP).
    QueryDef(
      "q16_mode",
      (s, dir) => {
        val counts = Tables.load(s, dir, "customer")
          .groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("cnt").desc, col("c_mktsegment").asc)
        counts.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("c_nationkey"), col("c_mktsegment").as("mode_segment"))
      },
      Some("""SELECT c_nationkey, c_mktsegment AS mode_segment FROM (
          SELECT c_nationkey, c_mktsegment,
            row_number() OVER (PARTITION BY c_nationkey
              ORDER BY cnt DESC, c_mktsegment ASC) AS rn
          FROM (SELECT c_nationkey, c_mktsegment, count(*) AS cnt
                FROM customer GROUP BY c_nationkey, c_mktsegment))
        WHERE rn = 1""")),

    // A7 — nested aggregation: max/sum of per-group counts
    // (ref validation notebook cells 10, 26).
    QueryDef(
      "q17_nested_agg",
      (s, dir) => Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("c_nationkey")
        .agg(max("cnt").as("max_orders_per_cust"),
          sum("cnt").cast("long").as("total_orders")),
      Some("""SELECT c_nationkey, max(cnt) AS max_orders_per_cust,
          CAST(sum(cnt) AS BIGINT) AS total_orders
        FROM (SELECT c_custkey, c_nationkey, count(*) AS cnt
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_custkey, c_nationkey)
        GROUP BY c_nationkey""")),

    // SO1 — union + distinct (ref exact_matches.py:29 vertex set).
    QueryDef(
      "q18_union_distinct",
      (s, dir) => Tables.load(s, dir, "orders")
        .select(col("o_custkey").as("id"))
        .union(Tables.load(s, dir, "customer")
          .select(col("c_custkey").as("id")))
        .distinct(),
      Some("""SELECT o_custkey AS id FROM orders
        UNION SELECT c_custkey AS id FROM customer""")),

    // SO2 — LIMIT 0 schema clone (ref exact_matches.py:92-94).
    QueryDef(
      "q19_schema_clone",
      (s, dir) => Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name").limit(0),
      Some("SELECT c_custkey, c_name FROM customer LIMIT 0")),

    // S3/S4 — CSV sink + CSV bulk ingest round-trip (ref COPY surface at
    // pgdedupe/run.py:234-245): write customer to header CSV, read it
    // back with the source's explicit schema, oracle against the ORIGINAL
    // parquet — any quoting/typing/null-fidelity bug in either direction
    // breaks the hash. c_comment carries commas and c_acctbal is a
    // double, so separators, quoting, and float round-trip are all
    // exercised.
    QueryDef(
      "q25_csv_roundtrip",
      (s, dir) => {
        val src = Tables.load(s, dir, "customer")
        val path = demoPath("csv/customer")
        Tables.sinkCsv(src, path)
        Tables.loadCsv(s, path, src.schema)
      },
      Some("SELECT * FROM customer")),

    // S3/S4 alternate columnar format — ORC sink + ingest round-trip.
    // orders carries a timestamp and a double, the two types CSV can
    // mangle; ORC must round-trip both bit-exactly, and the oracle runs
    // against the ORIGINAL parquet so any fidelity loss breaks the hash.
    QueryDef(
      "q26_orc_roundtrip",
      (s, dir) => {
        val src = Tables.load(s, dir, "orders")
        val path = demoPath("orc/orders")
        Tables.sinkOrc(src, path)
        Tables.loadOrc(s, path, src.schema)
      },
      Some("SELECT * FROM orders")),

    // S3/S4 alternate row format — JSON-lines sink + ingest round-trip
    // (the interchange format document corpora arrive in). part mixes
    // int/bigint/double/string; doubles cross the text hop via shortest
    // round-trip decimal, so the oracle hash against the original
    // parquet proves numeric fidelity end to end.
    QueryDef(
      "q27_json_roundtrip",
      (s, dir) => {
        val src = Tables.load(s, dir, "part")
        val path = demoPath("json/part")
        Tables.sinkJson(src, path)
        Tables.loadJson(s, path, src.schema)
      },
      Some("SELECT * FROM part")),

    // S4/J-scale — bucketed sink + co-located join: both sides bucketed
    // on the join key at write time, so the join itself needs no
    // Exchange (the 100 TB pattern: pay the shuffle once in storage,
    // not per query — zero-Exchange property gated in BucketedJoinSpec;
    // this entry proves the bucketed write/catalog-read path yields the
    // same answer as the oracle's plain join).
    QueryDef(
      "q28_bucketed_join",
      (s, dir) => {
        val wh = demoPath("bucketed")
        val (custTbl, ordTbl) =
          (demoTable("customer_bkt"), demoTable("orders_bkt"))
        Tables.sinkBucketed(Tables.load(s, dir, "customer"),
          custTbl, s"$wh/customer_bkt", 8, "c_custkey", "c_custkey")
        Tables.sinkBucketed(Tables.load(s, dir, "orders"),
          ordTbl, s"$wh/orders_bkt", 8, "o_custkey", "o_custkey")
        Tables.loadTable(s, custTbl)
          .join(Tables.loadTable(s, ordTbl),
            col("c_custkey") === col("o_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            // Money sums are oracle-hash-critical: a raw double sum of
            // ~7.5e8 drifts with summation order at the hash's 9th
            // significant digit. Quantize to cents and sum exactly
            // (QueryDef.exactSum), as q20-q22 already do.
            descale(exactSum(col("o_totalprice"), 100), 100)
              .as("sum_price"))
      },
      Some(s"""SELECT c_mktsegment, count(*) AS n_orders,
        ${sqlExactSum("o_totalprice", 100)} AS sum_price
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY 1""")),

    // J-scale — salted skew join (SkewJoin.saltedInner): every events
    // type clears the low hot-key threshold, so the whole join runs
    // through the salt-spread path (fact rows hashed across 8 sub-keys,
    // dim rows replicated 8x) and must still produce the plain-join
    // answer the oracle computes. Deterministic salting makes the hash
    // comparison exact; sub-key spread itself is gated in SkewJoinSpec.
    QueryDef(
      "q29_salted_join",
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
          .select("event_type", "user_id", "value")
        val dim = ev.select("event_type").distinct()
          .withColumn("type_weight",
            length(col("event_type")).cast("double"))
        graft.ops.SkewJoin.saltedInner(ev, dim, "event_type",
            saltFactor = 8, hotKeyThreshold = 100)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            // Same oracle-hash-critical quantization as q28: the raw
            // double sum is order-dependent at the hash's precision.
            descale(exactSum(col("value") * col("type_weight"), 10000),
              10000).as("weighted_value"))
      },
      Some(s"""SELECT e.event_type, count(*) AS n_events,
        ${sqlExactSum("e.value * d.type_weight", 10000)} AS weighted_value
        FROM events e JOIN (SELECT DISTINCT event_type,
          cast(length(event_type) AS double) AS type_weight FROM events) d
        ON e.event_type = d.event_type
        GROUP BY 1""")))
}
