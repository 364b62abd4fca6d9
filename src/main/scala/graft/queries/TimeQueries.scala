package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Aggregates, Calendar}

/** Windowing and time-series family (SURVEY.md §2.6-2.7): ranking and
  * running windows (an extension — the reference emulates everything
  * arithmetically), tumbling bins, dense-calendar zero-fill, top-k. */
object TimeQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // Ranking window: top-3 orders per customer, total tie-break.
    QueryDef(
      "q18_window_rank",
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
          FROM orders) WHERE rn <= 3"""),
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
      }),

    // Running (cumulative) window per key, exact decimal running sum.
    QueryDef(
      "q19_window_running",
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_price
        FROM orders"""),
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
              .cast("double").as("running_price"))
      }),

    // Tumbling 12-minute bins via integer epoch arithmetic
    // (hpc_running_cores_and_corehr.py:206-208). events.ts is epoch-nanos
    // Long on the Spark side; DuckDB sees the same INT64 via epoch_ns.
    QueryDef(
      "q20_time_tumbling",
      Some("""
        SELECT (epoch_ns(ts) // 720000000000) * 720 AS bin,
               count(*) AS n,
               CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1"""),
      (s, d) =>
        t(s, d, "events")
          .groupBy(expr("(ts div 720000000000) * 720").as("bin"))
          .agg(
            count(lit(1)).as("n"),
            Aggregates.decSum(col("value")).as("sum_value"))),

    // Dense calendar scaffold + zero-fill
    // (hpc_running_cores_and_corehr.py:148-168).
    QueryDef(
      "q21_time_calendar",
      Some("""
        WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
                          max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
             days AS (SELECT strftime(CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE), '%Y-%m-%d') AS day FROM b),
             per AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
                            count(*) AS n_orders FROM orders GROUP BY 1)
        SELECT day, CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders
        FROM days LEFT JOIN per USING(day)"""),
      (s, d) => {
        val orders = t(s, d, "orders")
        val perDay = orders
          .groupBy(date_format(to_date(col("o_orderdate")), "yyyy-MM-dd")
            .as("day"))
          .agg(count(lit(1)).as("n_orders"))
        Calendar.scaffold(orders, col("o_orderdate"), perDay, "day",
          Seq("n_orders"))
      }),

    // Top-k via orderBy+limit → TakeOrderedAndProject
    // (reports/aggregate_campaigns.py:203-205), total order.
    QueryDef(
      "q22_topk",
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""),
      (s, d) =>
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)),

    // Calendar-part bucketing (condor_crab_unique_users.py:84-88).
    QueryDef(
      "q23_date_parts",
      Some("""
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY 1, 2"""),
      (s, d) =>
        t(s, d, "orders")
          .groupBy(
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"))
          .agg(
            count(lit(1)).as("n"),
            Aggregates.decSum(col("o_totalprice")).as("sum_price")))
  ,

    // Hopping (sliding) windows in batch: 1-hour windows every 15
    // minutes — Spark's native `window(ts, size, slide)` generator
    // (each event expands to size/slide = 4 window rows map-side, then
    // one hash agg; the same TimeWindow semantics Structured Streaming
    // uses, so batch and streaming agree). Oracle: explicit 4-way
    // window-start expansion — floor-aligned starts, integer µs.
    QueryDef(
      "q127_hopping_window",
      Some("""
        WITH e AS (SELECT epoch_us(ts) AS us, event_type, "value"
                   FROM events),
        x AS (SELECT (us // 900000000 - i.i) * 900000000
                       AS win_start_us,
                     event_type, "value"
              FROM e, (SELECT unnest(range(0, 4)) AS i) i)
        SELECT win_start_us, event_type, count(*) AS n,
               CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_value
        FROM x GROUP BY 1, 2"""),
      (s, d) =>
        t(s, d, "events")
          .select(expr("timestamp_micros(ts div 1000)").as("tsx"),
            col("event_type"), col("value"))
          .groupBy(
            window(col("tsx"), "1 hour", "15 minutes").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            Aggregates.decSum(col("value")).as("sum_value"))
          .select(unix_micros(col("w.start")).as("win_start_us"),
            col("event_type"), col("n"), col("sum_value"))),

    // Per-key forward fill (gap-filled time series): each user's
    // sparse daily value sums become a dense min..max day grid, gaps
    // carrying the most recent present value — the
    // last-observation-carried-forward step before any
    // rolling/trend computation on irregular data. Per-key sequence
    // explode (no global calendar), ignore-nulls last over a growing
    // frame.
    QueryDef(
      "q130_forward_fill",
      Some("""
        WITH v AS (SELECT user_id,
                          epoch_us(ts) // 86400000000 AS day,
                          CAST(sum(CAST("value" AS DECIMAL(18,4)))
                            AS DOUBLE) AS v
                   FROM events GROUP BY 1, 2),
        b AS (SELECT user_id, min(day) lo, max(day) hi
              FROM v GROUP BY 1),
        grid AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day
                 FROM b),
        j AS (SELECT g.user_id, g.day, v.v
              FROM grid g LEFT JOIN v USING (user_id, day))
        SELECT user_id, day,
               last_value(v IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS v_filled,
               v IS NOT NULL AS was_present
        FROM j"""),
      (s, d) =>
        Calendar.forwardFill(
          t(s, d, "events")
            .groupBy(col("user_id"),
              expr("ts div 86400000000000").as("day"))
            .agg(Aggregates.decSum(col("value")).as("v")),
          "user_id", "day", "v")),

    // Top-k per group over an AGGREGATE metric (top-3 suppliers by
    // revenue per nation): aggregate → rank window → filter. Spark
    // plans the rank filter as WindowGroupLimit — a partial top-k
    // BEFORE the exchange, so each map task forwards at most k rows
    // per group instead of the whole aggregate table (the per-group
    // twin of q22's TakeOrderedAndProject). Revenue is the exact
    // DECIMAL sum of per-row double products (identical operands both
    // engines; no decimal half-tie exists for binary doubles at scale
    // 4, the engine's standing analysis).
    QueryDef(
      "q132_topk_per_group",
      Some("""
        WITH r AS (SELECT s.s_nationkey, l.l_suppkey,
                          CAST(sum(CAST(l_extendedprice*(1-l_discount)
                            AS DECIMAL(18,4))) AS DOUBLE) AS revenue
                   FROM lineitem l
                   JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   GROUP BY 1, 2),
        k AS (SELECT s_nationkey, l_suppkey, revenue,
                     row_number() OVER (PARTITION BY s_nationkey
                       ORDER BY revenue DESC, l_suppkey) AS rn
              FROM r)
        SELECT s_nationkey, l_suppkey, revenue,
               CAST(rn AS BIGINT) AS rn
        FROM k WHERE rn <= 3"""),
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"), col("l_suppkey"))
          .agg(Aggregates.decSum(
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("revenue").desc, col("l_suppkey"))
        rev.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
      }),

    // ntile + cume_dist decile table: per-language n_chars deciles
    // with bucket bounds and the bucket's cumulative-distribution
    // ceiling. Both functions are deterministic under the total
    // (n_chars, doc_id) order — ntile emits integer bucket ids and
    // cume_dist is an exact integer ratio in one IEEE division — so
    // the whole decile report hash-matches across engines.
    QueryDef(
      "q191_decile_table",
      Some("""
        WITH d AS (SELECT lang, n_chars,
                          ntile(10) OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS decile,
                          cume_dist() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS cd
                   FROM documents)
        SELECT lang, CAST(decile AS INT) AS decile,
               count(*) AS n_docs,
               min(n_chars) AS lo, max(n_chars) AS hi,
               max(cd) AS cd_hi
        FROM d GROUP BY 1, 2"""),
      (s, d) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("n_chars"), col("doc_id"))
        t(s, d, "documents")
          .select(col("lang"), col("n_chars"),
            ntile(10).over(w).as("decile"),
            cume_dist().over(w).as("cd"))
          .groupBy(col("lang"), col("decile"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"),
            max(col("cd")).as("cd_hi"))
      })
  )
}
