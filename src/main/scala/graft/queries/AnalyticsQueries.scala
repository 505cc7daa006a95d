package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import QueryDef.{descale, exactSum, sqlExactSum}

/** Headline analytical queries: TPC-H-shaped aggregation/join pipelines
  * over the harness star schema plus event-time queries over `events`.
  * These are the bench workload — written to produce the physical plan
  * you'd want at 100 TB (broadcast dims, partial aggregation, pushed
  * filters) and exact-integer money math so the oracle hash is stable.
  */
object AnalyticsQueries {

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1-shaped pricing summary: single scan, hash aggregate with
    // map-side partials; all money sums exact-quantized.
    QueryDef(
      "q20_pricing_summary",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          descale(exactSum(col("l_quantity"), 100), 100).as("sum_qty"),
          descale(exactSum(col("l_extendedprice"), 100), 100)
            .as("sum_base_price"),
          descale(exactSum(col("l_extendedprice") * (lit(1.0) -
            col("l_discount")), 10000), 10000).as("sum_disc_price"),
          descale(exactSum(col("l_extendedprice") * (lit(1.0) -
            col("l_discount")) * (lit(1.0) + col("l_tax")), 10000), 10000)
            .as("sum_charge"),
          round(descale(exactSum(col("l_quantity"), 100), 100) /
            count(lit(1)), 6).as("avg_qty"),
          round(descale(exactSum(col("l_extendedprice"), 100), 100) /
            count(lit(1)), 6).as("avg_price"),
          round(descale(exactSum(col("l_discount"), 1000000), 1000000) /
            count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order")),
      Some(s"""SELECT l_returnflag, l_linestatus,
          ${sqlExactSum("l_quantity", 100)} AS sum_qty,
          ${sqlExactSum("l_extendedprice", 100)} AS sum_base_price,
          ${sqlExactSum("l_extendedprice * (1.0 - l_discount)", 10000)}
            AS sum_disc_price,
          ${sqlExactSum(
          "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 10000)}
            AS sum_charge,
          round(${sqlExactSum("l_quantity", 100)} / count(*), 6) AS avg_qty,
          round(${sqlExactSum("l_extendedprice", 100)} / count(*), 6)
            AS avg_price,
          round(${sqlExactSum("l_discount", 1000000)} / count(*), 6)
            AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")),

    // TPC-H Q3-shaped: segment filter → 3-way join → top-10 revenue.
    // Deterministic top-k: exact-integer revenue, orderkey tiebreak.
    QueryDef(
      "q21_top_revenue",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
          .where(col("c_mktsegment") === "BUILDING")
        val o = Tables.load(s, dir, "orders")
          .where(col("o_orderdate") < lit("1997-01-01"))
        val l = Tables.load(s, dir, "lineitem")
          .where(col("l_shipdate") > lit("1997-01-01"))
        // No broadcast hint on customer: it SCALES with SF (hundreds of
        // GB at 100 TB — over the 8 GB broadcast cap), so the strategy
        // is left to the planner/AQE, which still auto-broadcasts below
        // the threshold (every local SF) and picks a shuffle join at
        // scale. Only fixed-size dimensions (nation: 25 rows, region:
        // 5) keep explicit hints in this file.
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey")
          .agg(descale(exactSum(col("l_extendedprice") *
            (lit(1.0) - col("l_discount")), 10000), 10000).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some(s"""SELECT l_orderkey,
          ${sqlExactSum("l_extendedprice * (1.0 - l_discount)", 10000)}
            AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10""")),

    // TPC-H Q5-shaped: local-supplier volume per nation in one region.
    QueryDef(
      "q22_region_volume",
      (s, dir) => {
        val r = Tables.load(s, dir, "region").where(col("r_name") === "ASIA")
        val n = Tables.load(s, dir, "nation")
        val c = Tables.load(s, dir, "customer")
        val sup = Tables.load(s, dir, "supplier")
        val o = Tables.load(s, dir, "orders")
          .where(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
        val l = Tables.load(s, dir, "lineitem")
        // customer/supplier scale with SF — no broadcast hints (see
        // q21's note); nation/region are fixed-size and keep theirs.
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(descale(exactSum(col("l_extendedprice") *
            (lit(1.0) - col("l_discount")), 10000), 10000).as("revenue"))
      },
      Some(s"""SELECT n_name,
          ${sqlExactSum("l_extendedprice * (1.0 - l_discount)", 10000)}
            AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name""")),

    // Event-time tumbling-window aggregation (the batch shape of the
    // Structured Streaming windowed agg in graft.streaming).
    QueryDef(
      "q23_event_windows",
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH")
            .as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          descale(exactSum(col("value"), 10000), 10000).as("sum_value")),
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H')
            AS hour,
          event_type, count(*) AS n_events,
          ${sqlExactSum("value", 10000)} AS sum_value
        FROM events GROUP BY 1, 2""")),

    // Gap-based sessionization per user (lag + windowed running flag).
    QueryDef(
      "q24_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.load(s, dir, "events")
          .withColumn("prev_ts", lag("ts", 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              expr("ts - prev_ts > INTERVAL '30' MINUTE"), 1).otherwise(0))
          .groupBy("user_id")
          .agg(sum("new_session").cast("long").as("n_sessions"),
            count(lit(1)).as("n_events"))
      },
      Some("""SELECT user_id,
          CAST(sum(CASE WHEN prev_ts IS NULL
            OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sessions,
          count(*) AS n_events
        FROM (SELECT user_id, ts, event_id,
            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS prev_ts
          FROM events)
        GROUP BY user_id""")))
}
