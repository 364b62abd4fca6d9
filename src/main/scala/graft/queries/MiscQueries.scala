package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Aggregates, NameAlgebra}

/** Remaining §2 operator rows (SURVEY.md §2.3, §2.4, §2.9, §2.11):
  * X.509 DN parsing, pushdown predicate families, expression joins,
  * dictionary replace, top-2-by-struct-sort ranking (the `get_mss`
  * idiom without UDFs), epoch/calendar formatting, deterministic
  * `first()` replacement. */
object MiscQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // X.509 parse_dn as pure Catalyst (data_aggregation.py:389-397):
    // last /CN= segment containing a letter, numeric CNs skipped.
    QueryDef(
      "q33_parse_dn",
      Some("""
        WITH d AS (SELECT c_custkey,
                          '/DC=ch/OU=users/CN=4711/CN=' || c_name AS dn
                   FROM customer)
        SELECT c_custkey, dn,
               regexp_replace(list_filter(string_split(dn, '/'),
                 x -> starts_with(x, 'CN=') AND regexp_matches(x, '[A-Za-z]')
               )[-1], '^CN=', '') AS cn
        FROM d"""),
      (s, d) =>
        t(s, d, "customer")
          .select(col("c_custkey"),
            concat(lit("/DC=ch/OU=users/CN=4711/CN="), col("c_name"))
              .as("dn"))
          .withColumn("cn", NameAlgebra.parseDn(col("dn")))),

    // Pushdown predicate family on one scan: between on a date, isin,
    // like, rlike, startswith (§2.3) — all reach PushedFilters in the
    // parquet scan except rlike (evaluated post-scan).
    QueryDef(
      "q34_filter_pushdown",
      Some("""
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate BETWEEN '1996-01-01' AND '1997-01-01'
          AND l_returnflag IN ('A', 'R')
          AND p_type LIKE '%O%'
          AND regexp_matches(p_brand, 'Brand#[12]')
          AND starts_with(p_name, 's') = false
        GROUP BY 1"""),
      (s, d) =>
        t(s, d, "lineitem")
          .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
          .filter(col("l_shipdate").between("1996-01-01", "1997-01-01")
            && col("l_returnflag").isin("A", "R")
            && col("p_type").like("%O%")
            && col("p_brand").rlike("Brand#[12]")
            && !col("p_name").startsWith("s"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            Aggregates.decSum(col("l_quantity")).as("qty"))),

    // Join on a computed expression — the `concat('/eos/cms', lfn)`
    // idiom (dbs_hdfs_eos.py:115,161): reconstruct the supplier name
    // from the numeric key and join on it.
    QueryDef(
      "q35_join_concat_expr",
      Some("""
        SELECT s_name, count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        FROM lineitem JOIN supplier
          ON s_name = 'Supplier#' || lpad(CAST(l_suppkey AS VARCHAR), 9, '0')
        GROUP BY 1"""),
      (s, d) =>
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier")),
            col("s_name") === concat(lit("Supplier#"),
              lpad(col("l_suppkey").cast("string"), 9, "0")))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("n"),
            Aggregates.decSum(col("l_quantity")).as("qty"))),

    // Dictionary substitution (na.replace — the rse_id→RSE map idiom,
    // degraded/rucio_datasets_last_access_ts.py:235) + greatest clamp.
    QueryDef(
      "q36_replace_map",
      Some("""
        SELECT CASE c_mktsegment WHEN 'BUILDING' THEN 'BLD'
                                 WHEN 'MACHINERY' THEN 'MCH'
                                 ELSE c_mktsegment END AS segment,
               count(*) AS n,
               -- DuckDB greatest() promotes DECIMAL to DOUBLE; CASE keeps
               -- the exact decimal sum (matches Spark greatest on decimals)
               CAST(sum(CASE WHEN c_acctbal > 0
                             THEN CAST(c_acctbal AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END)
                 AS DOUBLE) AS pos_bal
        FROM customer GROUP BY 1"""),
      (s, d) =>
        t(s, d, "customer")
          .na.replace("c_mktsegment",
            Map("BUILDING" -> "BLD", "MACHINERY" -> "MCH"))
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n"),
            sum(greatest(col("c_acctbal").cast("decimal(18,4)"),
              lit(0).cast("decimal(18,4)"))).cast("double").as("pos_bal"))),

    // Top & 2nd-top status per flag via array_sort over structs —
    // replaces the reference's row-UDF pickers get_mss/get_second_mss
    // (reports/aggregate_campaigns.py:47-65) with pure Catalyst.
    QueryDef(
      "q37_top2_struct_rank",
      Some("""
        WITH per AS (
          SELECT l_returnflag flag, l_linestatus status,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) qty
          FROM lineitem GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY flag
                ORDER BY qty DESC, status) rn FROM per)
        SELECT flag,
               max(CASE WHEN rn = 1 THEN status END) AS top_status,
               max(CASE WHEN rn = 1 THEN qty END) AS top_qty,
               max(CASE WHEN rn = 2 THEN status END) AS second_status
        FROM r GROUP BY flag"""),
      (s, d) => {
        val per = t(s, d, "lineitem")
          .groupBy(col("l_returnflag").as("flag"),
            col("l_linestatus").as("status"))
          .agg(Aggregates.decSum(col("l_quantity")).as("qty"))
        per.groupBy(col("flag"))
          .agg(array_sort(collect_list(struct(negate(col("qty")).as("nq"),
            col("status").as("st")))).as("arr"))
          .select(col("flag"),
            element_at(col("arr"), 1).getField("st").as("top_status"),
            negate(element_at(col("arr"), 1).getField("nq")).as("top_qty"),
            when(size(col("arr")) >= 2,
              element_at(col("arr"), 2).getField("st")).as("second_status"))
      }),

    // Epoch/calendar formatting family (§2.9): from_unixtime under UTC,
    // yyyyMM month key via lpad, format_string bucket tag. events.ts is
    // epoch-nanos Long on the Spark side, TIMESTAMP in DuckDB.
    QueryDef(
      "q38_epoch_formats",
      Some("""
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               strftime(ts, '%Y%m') AS month_key,
               printf('b%03d', event_id % 7) AS id_bucket,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3"""),
      (s, d) => {
        val sec = from_unixtime(expr("ts div 1000000000"))
        t(s, d, "events")
          .groupBy(
            date_format(sec, "yyyy-MM-dd").as("day"),
            concat(date_format(sec, "yyyy"),
              lpad(month(sec).cast("string"), 2, "0")).as("month_key"),
            format_string("b%03d", col("event_id") % 7).as("id_bucket"))
          .agg(count(lit(1)).as("n"))
      }),

    // Deterministic replacement for the reference's non-deterministic
    // first() carry (rucio_datasets_stats.py:320): min over the
    // functionally-dependent column.
    QueryDef(
      "q39_first_carry",
      Some("""
        SELECT o_custkey, min(c_name) AS c_name, count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1"""),
      (s, d) =>
        t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_custkey"))
          .agg(Aggregates.carry(col("c_name")).as("c_name"),
            count(lit(1)).as("n_orders")))
  ) ++ Seq(

    // Source-file provenance: per-row originating file via
    // input_file_name(), path components extracted with
    // substring_index/split — the reference's dump-date-from-path idiom
    // (rucio_daily.py:38-48 derives the snapshot date the same way).
    // input_file_name() is only valid directly above the scan (any
    // shuffle blanks it), so the projection sits on Tables.load, never
    // loadSpread. Oracle note: DuckDB's `filename` virtual column needs
    // parquet_scan(..., filename=true), which a view can't provide, so
    // the oracle names the gate's fixed sf0.01 paths directly (the
    // driver's correctness gate always runs at sf0.01; the local
    // tools/oracle_check.py re-points the literals at whatever corpus
    // dir it is invoked with, so alternate corpora get a real check).
    QueryDef(
      "q61_source_provenance",
      Some("""
        WITH f AS (
          SELECT filename FROM parquet_scan(
            '/root/testdata/sf0.01/documents.parquet', filename=true)
          UNION ALL
          SELECT filename FROM parquet_scan(
            '/root/testdata/sf0.01/events.parquet', filename=true))
        SELECT string_split(filename,'/')[-2] AS snapshot_dir,
               string_split(filename,'/')[-1] AS src_file,
               count(*) AS n_rows
        FROM f GROUP BY 1, 2"""),
      (s, d) => {
        def prov(name: String): DataFrame =
          t(s, d, name).select(input_file_name().as("path"))
        prov("documents").union(prov("events"))
          .select(
            element_at(split(col("path"), "/"), -2).as("snapshot_dir"),
            substring_index(col("path"), "/", -1).as("src_file"))
          .groupBy(col("snapshot_dir"), col("src_file"))
          .agg(count(lit(1)).as("n_rows"))
      }),

    // Whole-row argmax per key: each customer's highest-value order
    // carried as a row, via ONE hash aggregation on a comparable
    // struct (folds map-side at any key cardinality) — the
    // deterministic replacement for max_by/arg_max, whose tie
    // behavior is undefined in both engines; here ties on price break
    // to the larger orderkey by struct comparison, a total order.
    QueryDef(
      "q128_argmax_record",
      Some("""
        WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
                          row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC)
                            AS rn
                   FROM orders)
        SELECT o_custkey, o_orderkey AS top_orderkey,
               o_totalprice AS top_price
        FROM r WHERE rn = 1"""),
      (s, d) =>
        t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(max(struct(col("o_totalprice"), col("o_orderkey")))
            .as("m"))
          .select(col("o_custkey"),
            col("m.o_orderkey").as("top_orderkey"),
            col("m.o_totalprice").as("top_price")))
  )
}
