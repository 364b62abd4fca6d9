package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Aggregates._

/** Join operator family (SURVEY.md §2.4): multi-way inner, left/full outer,
  * anti, semi, compound-expression joins. Dimension sides are broadcast —
  * at 100 TB the fact tables (lineitem/orders/events) shuffle-hash-join on
  * their keys while region/nation/supplier/part stay map-side. */
object JoinQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // 3-way inner join + aggregate (data_collection.py:162-164).
    QueryDef(
      "q11_join_3way",
      Some("""
        SELECT n_name,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name"""),
      (s, d) =>
        t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("n_orders"),
            decSum(col("o_totalprice")).as("sum_price"))),

    // 5-way dimension join (degraded/dbs_condor.py:74-83) — TPC-H Q5 shape,
    // revenue per region.
    QueryDef(
      "q12_join_5way",
      Some("""
        SELECT r_name,
               CAST(sum(CAST(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name"""),
      (s, d) =>
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("revenue"),
            count(lit(1)).as("n_lines"))),

    // Left outer join keeping empty groups (rucio_datasets_stats.py:198).
    QueryDef(
      "q13_join_left",
      Some("""
        SELECT c_custkey, c_name,
               count(o_orderkey) AS n_orders,
               CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,4))), 0) AS DOUBLE) AS sum_price
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name"""),
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"),
            "left")
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            coalesce(sum(col("o_totalprice").cast("decimal(18,4)")), lit(0))
              .cast("double").as("sum_price"))),

    // Full outer join (rucio_datasets_stats.py:408-410): classify which
    // side(s) each key exists on.
    QueryDef(
      "q14_join_full",
      Some("""
        WITH e AS (SELECT DISTINCT user_id FROM events),
             c AS (SELECT DISTINCT c_custkey FROM customer)
        SELECT CASE WHEN user_id IS NOT NULL AND c_custkey IS NOT NULL THEN 'both'
                    WHEN user_id IS NOT NULL THEN 'events_only'
                    ELSE 'customer_only' END AS side,
               count(*) AS n
        FROM e FULL OUTER JOIN c ON user_id = c_custkey
        GROUP BY 1"""),
      (s, d) => {
        val e = t(s, d, "events").select(col("user_id")).distinct()
        val c = t(s, d, "customer").select(col("c_custkey")).distinct()
        e.join(c, e("user_id") === c("c_custkey"), "full")
          .select(
            when(e("user_id").isNotNull && c("c_custkey").isNotNull, "both")
              .when(e("user_id").isNotNull, "events_only")
              .otherwise("customer_only").as("side"))
          .groupBy(col("side"))
          .agg(count(lit(1)).as("n"))
      }),

    // Anti join: "leftovers" absent from the other source
    // (reports/aggregate_leftovers.py:127-137).
    QueryDef(
      "q15_join_anti",
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)"""),
      (s, d) =>
        t(s, d, "customer")
          .join(t(s, d, "events"), col("c_custkey") === col("user_id"),
            "left_anti")
          .select(col("c_custkey"), col("c_name"))),

    // Semi join as an EXISTS filter (condor_cpu_efficiency.py:443-445).
    QueryDef(
      "q16_join_semi",
      Some("""
        SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)"""),
      (s, d) =>
        t(s, d, "supplier")
          .join(t(s, d, "lineitem"), col("s_suppkey") === col("l_suppkey"),
            "left_semi")
          .select(col("s_suppkey"), col("s_name"))),

    // Join on a compound expression (rucio_datasets_monitoring.py:426-429):
    // equi key AND an inequality over both sides.
    QueryDef(
      "q17_join_expr",
      Some("""
        SELECT o_orderstatus,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders JOIN customer
          ON o_custkey = c_custkey AND o_totalprice > c_acctbal
        GROUP BY o_orderstatus"""),
      (s, d) => {
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        o.join(c, o("o_custkey") === c("c_custkey") &&
            o("o_totalprice") > c("c_acctbal"))
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            decSum(col("o_totalprice")).as("sum_price"))
      })
  )
}
