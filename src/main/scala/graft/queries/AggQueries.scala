package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Aggregates._

/** Aggregation operator family (SURVEY.md §2.5): plain sums, conditional
  * aggregates, exact distinct counts, min/max, ratio-of-sums, collect_set,
  * two-level aggregation, pivot, global aggregate, dedup-by-key. */
object AggQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // Dict-style sum aggregation (dbs_events.py:51-59) — TPC-H Q1 shape.
    QueryDef(
      "q01_agg_sum",
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
               CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus"""),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            decSum(col("l_quantity")).as("sum_qty"),
            decSum(col("l_extendedprice")).as("sum_price"),
            decAvg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("n"))),

    // Conditional aggregates: accessed-file-count idiom
    // (rucio_datasets_stats.py:317-319).
    QueryDef(
      "q02_agg_conditional",
      Some("""
        SELECT l_returnflag,
               count(*) FILTER (WHERE l_discount > 0.05) AS n_highdisc,
               count(*) FILTER (WHERE l_quantity < 10)   AS n_lowqty,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag"""),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countIf(col("l_discount") > 0.05).as("n_highdisc"),
            countIf(col("l_quantity") < 10).as("n_lowqty"),
            count(lit(1)).as("n"))),

    // Exact countDistinct (condor_crab_unique_users.py:93).
    QueryDef(
      "q03_agg_countdistinct",
      Some("""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events GROUP BY event_type"""),
      (s, d) =>
        t(s, d, "events")
          .groupBy(col("event_type"))
          .agg(
            countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))),

    // min/max/avg stats incl. timestamp extremes (rucio_ds_summary.py:318-326).
    QueryDef(
      "q04_agg_minmax",
      Some("""
        SELECT l_returnflag,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price,
               CAST(min(l_shipdate) AS VARCHAR) AS first_ship,
               CAST(max(l_shipdate) AS VARCHAR) AS last_ship
        FROM lineitem GROUP BY l_returnflag"""),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            min(col("l_extendedprice")).as("min_price"),
            max(col("l_extendedprice")).as("max_price"),
            date_format(min(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss")
              .as("first_ship"),
            date_format(max(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss")
              .as("last_ship"))),

    // Ratio-of-sums cpu-efficiency idiom (condor_cpu_efficiency.py:394-417).
    QueryDef(
      "q05_agg_ratio",
      Some("""
        SELECT l_returnflag,
               100.0 * CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS qty_per_price
        FROM lineitem GROUP BY l_returnflag"""),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(ratioOfSums(col("l_quantity"), col("l_extendedprice"))
            .as("qty_per_price"))),

    // sort_array(collect_set(...)) deterministic list
    // (rucio_datasets_monitoring.py:275-277), joined dim→fact.
    QueryDef(
      "q06_agg_collectset",
      Some("""
        SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM (SELECT DISTINCT r_name, n_name
              FROM region JOIN nation ON n_regionkey = r_regionkey)
        GROUP BY r_name"""),
      (s, d) => {
        val nation = t(s, d, "nation")
        val region = t(s, d, "region")
        region
          .join(nation, col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(array_join(sort_array(collect_set(col("n_name"))), ",")
            .as("nations"))
      }),

    // Two-level aggregation (rucio_ds_summary.py:292-334): per
    // (supplier,part) sums, then per-supplier stats over those sums.
    QueryDef(
      "q07_agg_twolevel",
      Some("""
        WITH inner_agg AS (
          SELECT l_suppkey, l_partkey,
                 sum(CAST(l_quantity AS DECIMAL(18,4))) AS part_qty
          FROM lineitem GROUP BY l_suppkey, l_partkey)
        SELECT l_suppkey,
               count(*) AS n_parts,
               CAST(min(part_qty) AS DOUBLE) AS min_qty,
               CAST(max(part_qty) AS DOUBLE) AS max_qty,
               CAST(sum(part_qty) AS DOUBLE) AS sum_qty
        FROM inner_agg GROUP BY l_suppkey"""),
      (s, d) => {
        val inner = t(s, d, "lineitem")
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("part_qty"))
        inner
          .groupBy(col("l_suppkey"))
          .agg(
            count(lit(1)).as("n_parts"),
            min(col("part_qty")).cast("double").as("min_qty"),
            max(col("part_qty")).cast("double").as("max_qty"),
            sum(col("part_qty")).cast("double").as("sum_qty"))
      }),

    // Pivot: campaign × site matrix (reports/aggregate_campaigns.py:181-184)
    // with explicit pivot values so column names are static.
    QueryDef(
      "q08_agg_pivot",
      Some("""
        SELECT l_returnflag,
               CAST(coalesce(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'F'), 0) AS DOUBLE) AS qty_F,
               CAST(coalesce(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'O'), 0) AS DOUBLE) AS qty_O
        FROM lineitem GROUP BY l_returnflag"""),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("F", "O"))
          .agg(sum(col("l_quantity").cast("decimal(18,4)")))
          .na.fill(0, Seq("F", "O"))
          .select(
            col("l_returnflag"),
            col("F").cast("double").as("qty_F"),
            col("O").cast("double").as("qty_O"))),

    // Global aggregate, no keys (reports/aggregate_leftovers.py:145-146).
    QueryDef(
      "q09_agg_global",
      Some("""
        SELECT count(*) AS n_rows,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
               count(DISTINCT o_custkey) AS n_customers
        FROM orders"""),
      (s, d) =>
        t(s, d, "orders")
          .agg(
            count(lit(1)).as("n_rows"),
            decSum(col("o_totalprice")).as("total_price"),
            countDistinct(col("o_custkey")).as("n_customers"))),

    // Dedup by key subset before aggregating
    // (hpc_running_cores_and_corehr.py:177; GlobalJobId idiom).
    QueryDef(
      "q10_dedup_exact",
      Some("""
        SELECT event_type, count(*) AS n_user_types
        FROM (SELECT DISTINCT user_id, event_type FROM events)
        GROUP BY event_type"""),
      (s, d) =>
        t(s, d, "events")
          .select(col("user_id"), col("event_type"))
          .dropDuplicates(Seq("user_id", "event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_user_types"))),

    // Multi-granularity ROLLUP report: detail + per-flag subtotal +
    // grand total in ONE aggregation pass (partial aggregation handles
    // all three levels map-side — vs three scans for three GROUP BYs).
    // grouping_id() disambiguates real NULL keys from subtotal rows.
    QueryDef(
      "q106_rollup_report",
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_qty,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT)
                 AS gid
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)"""),
      (s, d) =>
        t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_rows"),
            decSum(col("l_quantity")).as("sum_qty"),
            grouping_id().as("gid"))),

    // Arbitrary GROUPING SETS (not a rollup prefix chain): per-lang
    // totals, per-source totals, and the grand total in one pass —
    // Catalyst's Expand operator replicates each input row once per
    // set, all three aggregates share the partial-agg pipeline.
    // DataFrame API has rollup/cube only, so this goes through
    // spark.sql on a temp view — same Catalyst plan either way.
    QueryDef(
      "q117_grouping_sets",
      Some("""
        SELECT lang, source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_total,
               CAST(GROUPING(lang, source) AS BIGINT) AS gid
        FROM documents
        GROUP BY GROUPING SETS ((lang), (source), ())"""),
      (s, d) => {
        t(s, d, "documents").createOrReplaceTempView("documents_gs")
        s.sql("""
          SELECT lang, source, count(*) AS n_docs,
                 sum(n_chars) AS chars_total,
                 grouping_id() AS gid
          FROM documents_gs
          GROUP BY GROUPING SETS ((lang), (source), ())""")
      }),

    // Per-key mode: each customer's most frequent order priority,
    // ties broken by the smallest value. Two hash aggregations and a
    // struct-min — no window, no per-key sort, so the plan is safe
    // for billion-key cardinality (a row_number window here would
    // sort every (key, value) group; the struct-min folds map-side).
    QueryDef(
      "q122_group_mode",
      Some("""
        WITH c AS (SELECT o_custkey, o_orderpriority, count(*) AS cnt
                   FROM orders GROUP BY 1, 2),
        r AS (SELECT o_custkey, o_orderpriority, cnt,
                     row_number() OVER (PARTITION BY o_custkey
                       ORDER BY cnt DESC, o_orderpriority) AS rn
              FROM c)
        SELECT o_custkey, o_orderpriority AS mode_o_orderpriority,
               cnt AS n_mode
        FROM r WHERE rn = 1"""),
      (s, d) =>
        graft.ops.Aggregates.groupMode(
          t(s, d, "orders"), "o_custkey", "o_orderpriority"))
  ,

    // Equal-width value histogram (20 bins over the observed range):
    // the report-grade complement of q78's log2 buckets. Bounds arrive
    // as a one-row broadcast; bin = floor((x−lo)·20/(hi−lo)) clamped
    // so x = hi lands in the last bin — floor of identical IEEE
    // operands is engine-exact (the q58 floor-vs-CAST precedent).
    QueryDef(
      "q143_value_histogram",
      Some("""
        WITH b AS (SELECT min(o_totalprice) AS lo,
                          max(o_totalprice) AS hi
                   FROM orders),
        x AS (SELECT CASE WHEN hi = lo THEN 0
                          ELSE least(CAST(floor((o_totalprice - lo)
                            * 20.0 / (hi - lo)) AS BIGINT), 19) END
                       AS bin,
                     o_totalprice
              FROM orders, b)
        SELECT bin, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE) AS mass
        FROM x GROUP BY 1"""),
      (s, d) => {
        val b = t(s, d, "orders")
          .agg(min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"))
        t(s, d, "orders").crossJoin(broadcast(b))
          .select(
            // hi = lo (constant column) would divide by zero under
            // ANSI — a one-bin histogram is the defined result there
            when(col("hi") === col("lo"), lit(0L))
              .otherwise(least(
                floor((col("o_totalprice") - col("lo")) * lit(20.0) /
                  (col("hi") - col("lo"))).cast("long"), lit(19L)))
              .as("bin"),
            col("o_totalprice"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            decSum(col("o_totalprice")).as("mass"))
      })
  )
}
