package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Aggregates, Dedup, NameAlgebra}

/** Row-shaping family (SURVEY.md §2.3, §2.8, §2.9, §2.11): when-chain
  * routing, string/name algebra, JSON field extraction, set operations,
  * explode, hash anonymization. */
object ShapeQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val defs: Seq[QueryDef] = Seq(

    // Multi-branch when().otherwise() routing
    // (hpc_running_cores_and_corehr.py:93-126 site mapping).
    QueryDef(
      "q24_when_chain",
      Some("""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    WHEN o_totalprice < 300000 THEN 'large'
                    ELSE 'huge' END AS bucket,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY 1"""),
      (s, d) =>
        t(s, d, "orders")
          .groupBy(
            when(col("o_totalprice") < 50000, "small")
              .when(col("o_totalprice") < 150000, "medium")
              .when(col("o_totalprice") < 300000, "large")
              .otherwise("huge").as("bucket"))
          .agg(
            count(lit(1)).as("n"),
            Aggregates.decSum(col("o_totalprice")).as("sum_price"))),

    // String algebra: split/getItem, regexp_extract, concat_ws
    // (split_dataset spark_utils.py:727-733; name tokens §2.9).
    QueryDef(
      "q25_string_funcs",
      Some("""
        SELECT p_partkey,
               split_part(p_name, ' ', 1) AS first_token,
               regexp_extract(p_name, '(\w+)$', 1) AS last_token,
               CAST(regexp_extract(p_brand, '#(\d+)', 1) AS INT) AS brand_num,
               concat(p_type, '_', p_brand) AS type_brand,
               upper(p_name) AS uname
        FROM part"""),
      (s, d) =>
        t(s, d, "part")
          .select(
            col("p_partkey"),
            split(col("p_name"), " ").getItem(0).as("first_token"),
            regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_token"),
            regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("int")
              .as("brand_num"),
            concat_ws("_", col("p_type"), col("p_brand")).as("type_brand"),
            upper(col("p_name")).as("uname"))),

    // Dataset-path algebra: build `/primds/procds/tier`-shaped names and
    // split them back (spark_utils.py:727-733) — inverse property.
    QueryDef(
      "q26_dataset_algebra",
      Some("""
        WITH ds AS (SELECT concat('/', r_name, '/', n_name, '/RAW') AS dataset
                    FROM nation JOIN region ON n_regionkey = r_regionkey)
        SELECT dataset,
               split_part(dataset, '/', 2) AS primds,
               split_part(dataset, '/', 3) AS procds,
               split_part(dataset, '/', 4) AS tier
        FROM ds"""),
      (s, d) => {
        val ds = t(s, d, "nation")
          .join(broadcast(t(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .select(concat(lit("/"), col("r_name"), lit("/"), col("n_name"),
            lit("/RAW")).as("dataset"))
        ds.select(
          col("dataset"),
          NameAlgebra.primaryDataset(col("dataset")).as("primds"),
          NameAlgebra.processedDataset(col("dataset")).as("procds"),
          NameAlgebra.dataTier(col("dataset")).as("tier"))
      }),

    // JSON field extraction over the events props column
    // (MONIT JSON envelopes, §1.3 regime 2).
    QueryDef(
      "q27_json_extract",
      Some("""
        SELECT event_type,
               count(*) FILTER (WHERE CAST(props->>'$.k' AS INTEGER) > 50) AS n_high_k,
               CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type"""),
      (s, d) => {
        val k = get_json_object(col("props"), "$.k").cast("int")
        t(s, d, "events")
          .groupBy(col("event_type"))
          .agg(
            Aggregates.countIf(k > 50).as("n_high_k"),
            sum(k.cast("long")).as("sum_k"))
      }),

    // UNION ALL of two per-source aggregates (cross-stream union,
    // data_aggregation.py:525-527) + a deduplicating UNION on top
    // (dbs_event_count_plot.py:188-210 uses SQL UNION = dedup).
    QueryDef(
      "q28_union",
      Some("""
        SELECT src, k, n FROM (
          SELECT 'lineitem' AS src, l_returnflag AS k, count(*) AS n
          FROM lineitem GROUP BY 2
          UNION ALL
          SELECT 'orders' AS src, o_orderstatus AS k, count(*) AS n
          FROM orders GROUP BY 2)"""),
      (s, d) => {
        val a = t(s, d, "lineitem").groupBy(col("l_returnflag").as("k"))
          .agg(count(lit(1)).as("n"))
          .select(lit("lineitem").as("src"), col("k"), col("n"))
        val b = t(s, d, "orders").groupBy(col("o_orderstatus").as("k"))
          .agg(count(lit(1)).as("n"))
          .select(lit("orders").as("src"), col("k"), col("n"))
        a.unionByName(b)
      }),

    // EXCEPT (subtract): keys on one side only
    // (reports/aggregate_leftovers.py:127-137).
    QueryDef(
      "q29_except",
      Some("""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT user_id AS c_custkey FROM events"""),
      (s, d) =>
        t(s, d, "customer").select(col("c_custkey"))
          .except(t(s, d, "events")
            .select(col("user_id").as("c_custkey")))),

    // INTERSECT — unused by the reference (§2.8) but part of a complete
    // set-operation surface.
    QueryDef(
      "q30_intersect",
      Some("""
        SELECT user_id AS custkey FROM events
        INTERSECT
        SELECT c_custkey AS custkey FROM customer"""),
      (s, d) =>
        t(s, d, "events").select(col("user_id").as("custkey"))
          .intersect(t(s, d, "customer")
            .select(col("c_custkey").as("custkey")))),

    // explode/flatMap (UDTF-like WMArchive step expansion, §2.11): words
    // from documents, filtered and counted.
    QueryDef(
      "q31_explode_words",
      Some("""
        SELECT word, count(*) AS n FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> '' GROUP BY word"""),
      (s, d) =>
        t(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("word"))
          .agg(count(lit(1)).as("n"))),

    // MD5 anonymization of PII columns (hdfs_an.py:23-42).
    QueryDef(
      "q32_hash_anonymize",
      Some("""
        SELECT c_custkey, md5(c_name) AS c_name, c_mktsegment
        FROM customer"""),
      (s, d) =>
        Dedup.anonymize(
          t(s, d, "customer")
            .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
          Seq("c_name"))),

    // UNPIVOT (melt): wide per-lang metrics to long (lang, metric,
    // value) rows — the inverse of q08's pivot, via the stack()
    // generator (one Generate node, no join, no shuffle beyond the
    // aggregation). The long form is what report sinks and the
    // reporting tail consume.
    QueryDef(
      "q118_unpivot",
      Some("""
        WITH a AS (SELECT lang, count(*) AS n_docs,
                          CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
                          count(DISTINCT source) AS n_sources
                   FROM documents GROUP BY 1)
        SELECT lang, 'n_docs' AS metric, n_docs AS value FROM a
        UNION ALL
        SELECT lang, 'n_chars_total', n_chars_total FROM a
        UNION ALL
        SELECT lang, 'n_sources', n_sources FROM a"""),
      (s, d) =>
        t(s, d, "documents")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars_total"),
            countDistinct(col("source")).as("n_sources"))
          .selectExpr("lang",
            "stack(3, 'n_docs', n_docs, 'n_chars_total', n_chars_total," +
              " 'n_sources', n_sources) AS (metric, value)"))
  )
}
