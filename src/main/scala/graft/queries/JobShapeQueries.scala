package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.jobs.{PhedexJobs, RucioJobs}

/** Oracle coverage for the round-6 reference job tails: the PhEDEx
  * snapshot-merge family (degraded/phedex.py + src/Go/mergePhedex.go +
  * degraded/phedex_agg.py) and the Rucio last-access report
  * (degraded/rucio_datasets_last_access_ts.py), each run through the
  * REAL job operators over frames shaped out of the testdata tables —
  * the oracle re-derives the same result in DuckDB SQL, including the
  * Go merge's quirky sequential day-fold (a lambda `list_reduce` on
  * the DuckDB side, a SQL higher-order `aggregate` on the Spark side).
  */
object JobShapeQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** lineitem → the phedex-summary contract (date, site, dataset,
    * size, replica_date, groupid); every fourth line number plays the
    * null-gid role so the merge's gid-adoption path is exercised. */
  private def summaryFromLineitem(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select(
      date_format(col("l_shipdate"), "yyyyMMdd").cast("long").as("date"),
      concat_ws("_", col("l_returnflag"), col("l_linestatus")).as("site"),
      (col("l_partkey") % 200).as("dataset"),
      floor(col("l_extendedprice")).cast("long").as("size"),
      (col("l_suppkey") % 5).cast("long").as("replica_date"),
      when(col("l_linenumber") % 4 === 0, lit(null).cast("long"))
        .otherwise((col("l_suppkey") % 3).cast("long")).as("groupid"))

  private val dkSummary =
    """src AS (
      |  SELECT CAST(strftime(l_shipdate, '%Y%m%d') AS BIGINT) AS date,
      |         l_returnflag || '_' || l_linestatus AS site,
      |         l_partkey % 200 AS dataset,
      |         CAST(floor(l_extendedprice) AS BIGINT) AS size,
      |         CAST(l_suppkey % 5 AS BIGINT) AS rdate,
      |         CASE WHEN l_linenumber % 4 = 0 THEN -1
      |              ELSE l_suppkey % 3 END AS gid0
      |  FROM lineitem)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // The mergePhedex.go cross-day replica merge (the reference's one
    // published perf number: 1 yr single-threaded in ~40 min) as a
    // distributed shuffle + ordered per-key fold. The oracle replays
    // the exact Go recurrence — integer division, early-day
    // over-weighting and all — via a DuckDB struct list_reduce.
    QueryDef(
      "q150_phedex_merge",
      Some(s"""
        WITH $dkSummary,
        gidn AS (
          SELECT *, CASE WHEN gid0 = -1
                      THEN coalesce(max(CASE WHEN gid0 <> -1 THEN gid0 END)
                             OVER (PARTITION BY site, dataset, rdate), -1)
                      ELSE gid0 END AS gid
          FROM src),
        days AS (
          SELECT site, dataset, rdate, gid, date,
                 CAST(sum(size) AS BIGINT) AS day_size
          FROM gidn GROUP BY 1, 2, 3, 4, 5),
        agg AS (
          SELECT site, dataset, rdate, gid,
                 min(date) AS min_date, max(date) AS max_date,
                 count(*) AS days, max(day_size) AS max_size,
                 list(day_size ORDER BY date) AS s
          FROM days GROUP BY 1, 2, 3, 4),
        folded AS (
          SELECT *, list_reduce(
            list_transform(s, x ->
              {'a': x, 'd': CAST(1 AS BIGINT), 'last': x}),
            (acc, e) -> {
              'a': CASE WHEN acc.d = 1 THEN acc.last
                        ELSE (acc.a * acc.d + acc.last) // (acc.d + 1) END,
              'd': acc.d + 1,
              'last': e.last}) AS st
          FROM agg)
        SELECT site, dataset, rdate, gid, min_date, max_date,
               CASE WHEN st.d = 1 THEN st.last
                    ELSE (st.a * st.d + st.last) // (st.d + 1)
               END AS ave_size,
               max_size, days
        FROM folded"""),
      (s, d) => PhedexJobs.mergeSnapshots(summaryFromLineitem(s, d))),

    // phedex_agg.py's snapshot-range extremes + days_present span over
    // an orders-shaped snapshot store.
    QueryDef(
      "q151_phedex_span",
      Some("""
        WITH src AS (
          SELECT o_orderpriority AS site,
                 o_custkey % 100 AS dataset,
                 CAST(floor(o_totalprice / 1000) AS BIGINT) AS size,
                 CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) AS date,
                 CAST(strftime(CAST(o_orderdate AS DATE)
                        - CAST(o_orderkey % 40 AS INTEGER),
                      '%Y%m%d') AS BIGINT) AS replica_date
          FROM orders)
        SELECT site, dataset, size,
               min(date) AS min_date, max(date) AS max_date,
               min(replica_date) AS min_rdate,
               max(replica_date) AS max_rdate,
               CAST(date_diff('day',
                 least(strptime(CAST(min(date) AS VARCHAR), '%Y%m%d'),
                       strptime(CAST(min(replica_date) AS VARCHAR),
                                '%Y%m%d')),
                 greatest(strptime(CAST(max(date) AS VARCHAR), '%Y%m%d'),
                          strptime(CAST(max(replica_date) AS VARCHAR),
                                   '%Y%m%d'))) AS INTEGER) AS days
        FROM src GROUP BY 1, 2, 3"""),
      (s, d) => PhedexJobs.snapshotAgg(
        t(s, d, "orders").select(
          col("o_orderpriority").as("site"),
          (col("o_custkey") % 100).as("dataset"),
          floor(col("o_totalprice") / 1000).cast("long").as("size"),
          date_format(col("o_orderdate"), "yyyyMMdd").cast("long")
            .as("date"),
          date_format(
            date_sub(col("o_orderdate"), (col("o_orderkey") % 40)
              .cast("int")), "yyyyMMdd").cast("long")
            .as("replica_date")))),

    // rucio_datasets_last_access_ts's binned size report: events play
    // file-replica rows (one dataset per user; users ≡ 0 mod 10 never
    // read, others pushed back 0-7 years so the report spans real
    // buckets), datasets bucket by the UTC year of their overall last
    // access, TB + counts per bucket. Sizes stay exact longs until the
    // final /1e12, so the double rounding is order-independent.
    QueryDef(
      "q152_last_access_bins",
      Some("""
        WITH files AS (
          SELECT event_id AS f_name, event_type AS rse_id,
                 CAST(floor("value" * 1e9) AS BIGINT) AS f_size,
                 CASE WHEN user_id % 10 = 0 THEN NULL
                      ELSE epoch_ns(ts) // 1000000
                           - (user_id % 8) * 31557600000 END AS accessed_at,
                 epoch_ns(ts) // 1000000 - 1000000 AS created_at
          FROM events),
        f2d AS (SELECT event_id AS f_name, user_id AS dataset
                FROM events),
        acc AS (
          SELECT rse_id, dataset,
                 round(CAST(sum(f_size) AS DOUBLE) / 1e12, 5) AS tb,
                 max(accessed_at) AS last_acc
          FROM files JOIN f2d USING (f_name)
          GROUP BY 1, 2),
        ds AS (SELECT dataset, sum(tb) AS tb, max(last_acc) AS last_access
               FROM acc GROUP BY 1)
        SELECT CASE WHEN last_access IS NULL THEN 'never'
                    ELSE CAST(year(make_timestamp(last_access * 1000))
                              AS VARCHAR) END AS access_year,
               round(sum(tb), 5) AS total_tb,
               count(*) AS n_datasets
        FROM ds GROUP BY 1"""),
      (s, d) => {
        val e = t(s, d, "events")
        val files = e.select(
          col("event_id").as("f_name"),
          col("event_type").as("rse_id"),
          floor(col("value") * lit(1e9)).cast("long").as("f_size"),
          when(col("user_id") % 10 === 0, lit(null).cast("long"))
            .otherwise(expr("ts div 1000000") -
              (col("user_id") % 8) * lit(31557600000L))
            .as("accessed_at"),
          (expr("ts div 1000000") - lit(1000000L)).as("created_at"))
        val f2d = e.select(col("event_id").as("f_name"),
          col("user_id").as("dataset"))
        RucioJobs.lastAccessYearBins(
          RucioJobs.rseDatasetAccess(files, f2d))
      }),

    // reports/aggregate_campaign_tier.py end-to-end under oracle:
    // TWO independently aggregated sides (DBS VALID sizes; PhEDEx
    // replica sizes with tape-zeroed disk bytes) meet on dataset name,
    // roll up to campaign×tier, top-k by the combined size. part plays
    // the DBS dataset dim (name synthesized /P{m}/C{brand}/{tier}),
    // lineitem plays both the DBS file table and — re-joined to part
    // for the name — the PhEDEx replica dump with _MSS/_Buffer/_Export
    // endpoints cut from disk bytes. 75 (campaign,tier) groups < the
    // 100 limit, so the top-k boundary is tie-free by construction.
    QueryDef(
      "q193_campaign_tier_report",
      Some("""
        WITH ddf AS (
          SELECT p_partkey AS did,
                 '/P' || (p_partkey % 10) || '/C' || p_brand || '/' ||
                 (CASE p_partkey % 3 WHEN 0 THEN 'RAW'
                   WHEN 1 THEN 'AOD' ELSE 'MINIAOD' END) AS dataset,
                 CASE WHEN p_size % 3 = 0 THEN 'VALID'
                      WHEN p_size % 3 = 1 THEN 'PRODUCTION'
                      ELSE 'DEPRECATED' END AS access_type
          FROM part),
        dbs AS (
          SELECT dataset,
                 CAST(sum(CAST(floor(l_extendedprice) AS BIGINT))
                      AS DOUBLE) AS dbs_size
          FROM lineitem JOIN ddf ON l_partkey = did
          WHERE access_type = 'VALID' GROUP BY 1),
        phx AS (
          SELECT dataset,
                 CAST(sum(b) AS DOUBLE) AS phedex_size,
                 CAST(sum(CASE WHEN suffix IN ('_MSS','_Buffer','_Export')
                          THEN 0 ELSE b END) AS DOUBLE) AS size_on_disk
          FROM (SELECT dataset,
                       CAST(floor(l_quantity * 100) AS BIGINT) AS b,
                       CASE l_linenumber % 4 WHEN 0 THEN '_MSS'
                         WHEN 1 THEN '_Buffer'
                         WHEN 2 THEN '_Export' ELSE '' END AS suffix
                FROM lineitem JOIN ddf ON l_partkey = did)
          GROUP BY 1)
        SELECT * FROM (
          SELECT split_part(dataset, '/', 3) AS campaign,
                 split_part(dataset, '/', 4) AS tier,
                 CAST(sum(CAST(dbs_size AS DECIMAL(18,0))) AS DOUBLE)
                   AS dbs_size,
                 CAST(sum(CAST(phedex_size AS DECIMAL(18,0))) AS DOUBLE)
                   AS phedex_size,
                 CAST(sum(CAST(size_on_disk AS DECIMAL(18,0))) AS DOUBLE)
                   AS size_on_disk
          FROM phx JOIN dbs USING (dataset)
          GROUP BY 1, 2)
        ORDER BY dbs_size + phedex_size DESC LIMIT 100"""),
      (s, d) => {
        val part = t(s, d, "part")
        val li = t(s, d, "lineitem")
        val name = concat(lit("/P"), col("p_partkey") % 10,
          lit("/C"), col("p_brand"), lit("/"),
          when(col("p_partkey") % 3 === 0, "RAW")
            .when(col("p_partkey") % 3 === 1, "AOD")
            .otherwise("MINIAOD"))
        val ddf = part.select(
          col("p_partkey").as("d_dataset_id"), name.as("d_dataset"),
          (col("p_size") % 3 + 1).as("d_dataset_access_type_id"))
        val daf = part.sparkSession
          .createDataFrame(Seq((1L, "VALID"), (2L, "PRODUCTION"),
            (3L, "DEPRECATED")))
          .toDF("dataset_access_type_id", "dataset_access_type")
        val fdf = li.select(
          col("l_partkey").as("f_dataset_id"),
          floor(col("l_extendedprice")).cast("long").as("f_file_size"))
        val phedex = li
          .join(part, col("l_partkey") === col("p_partkey"))
          .select(
            name.as("dataset_name"),
            floor(col("l_quantity") * 100).cast("long").as("block_bytes"),
            concat(lit("T"), col("l_suppkey") % 3, lit("_X"),
              when(col("l_linenumber") % 4 === 0, "_MSS")
                .when(col("l_linenumber") % 4 === 1, "_Buffer")
                .when(col("l_linenumber") % 4 === 2, "_Export")
                .otherwise("")).as("node_name"))
        graft.jobs.PhedexJobs.campaignTierReport(ddf, fdf, daf, phedex)
      }),

    // degraded/hpc_at_cms.py end-to-end under oracle: the 9-channel
    // site/entry router, GlobalJobId dedup, and the DENSE hourly spine
    // (every hour between the data's extremes × every channel,
    // zero-filled — DuckDB's generate_series plays the spine). Every
    // envelope column derives from the dedup key alone, so duplicate
    // GlobalJobIds are bit-identical rows and drop_duplicates is
    // deterministic on both engines (SELECT DISTINCT in the oracle).
    // Status/JobFailed/entry mismatches exercise every drop path.
    QueryDef(
      "q194_hpc_hourly_resample",
      Some("""
        WITH rows AS (
          SELECT DISTINCT event_id % 500 AS k FROM events),
        env AS (
          SELECT k,
            1700000000000 + (k % 50) * 3711000 AS rt,
            CASE WHEN k % 25 = 0 THEN 'Running'
                 ELSE 'Completed' END AS status,
            CASE WHEN k % 30 = 0 THEN 1 ELSE 0 END AS failed,
            k % 8 AS r,
            CAST(k % 64 + 1 AS DOUBLE) AS cpus
          FROM rows),
        routed AS (
          SELECT (rt // 1000 // 3600) * 3600 AS hour,
            CASE r WHEN 0 THEN 'NERSC_Cori'
                   WHEN 1 THEN 'NERSC_Cori_KNL'
                   WHEN 2 THEN 'PSC_Bridges'
                   WHEN 3 THEN CASE WHEN k % 2 = 1 THEN NULL
                                    ELSE 'SDSC_Comet' END
                   WHEN 4 THEN 'SDSC_Expanse'
                   WHEN 5 THEN 'TACC_Jetstream'
                   WHEN 6 THEN 'TACC_Frontera'
                   -- the Spark side splits k%16 into null-host vs
                   -- marconi-host rows; BOTH satisfy hpcChannel's
                   -- (isNull OR endswith) predicate, so the oracle
                   -- routes them identically
                   ELSE 'CNAF_Marconi' END AS channel,
            cpus
          FROM env WHERE status = 'Completed' AND failed = 0),
        binned AS (
          SELECT hour, channel,
                 CAST(sum(CAST(cpus AS DECIMAL(18,1))) AS DOUBLE)
                   AS request_cpus
          FROM routed WHERE channel IS NOT NULL GROUP BY 1, 2),
        spine AS (
          SELECT unnest(generate_series((SELECT min(hour) FROM binned),
                                        (SELECT max(hour) FROM binned),
                                        3600)) AS hour),
        chans AS (
          SELECT unnest(['NERSC_Cori','NERSC_Cori_KNL','PSC_Bridges',
            'SDSC_Comet','SDSC_Expanse','TACC_Jetstream',
            'TACC_Stampede2','TACC_Frontera','CNAF_Marconi'])
            AS channel)
        SELECT s.hour, c.channel,
               coalesce(b.request_cpus, 0.0) AS request_cpus
        FROM spine s CROSS JOIN chans c
        LEFT JOIN binned b ON b.hour = s.hour AND b.channel = c.channel"""),
      (s, d) => {
        val k = col("event_id") % 500
        val env = t(s, d, "events")
          .select(
            concat(lit("j"), k).as("GlobalJobId"),
            (lit(1700000000000L) + (k % 50) * 3711000L).as("RecordTime"),
            when(k % 25 === 0, "Running").otherwise("Completed")
              .as("Status"),
            when(k % 30 === 0, 1L).otherwise(0L).as("JobFailed"),
            when(k % 8 === 0, "T3_US_NERSC")
              .when(k % 8 === 1, "T3_US_NERSC")
              .when(k % 8 === 2, "T3_US_PSC")
              .when(k % 8 === 3, "T3_US_SDSC")
              .when(k % 8 === 4, "T3_US_SDSC")
              .when(k % 8 === 5, "T3_US_OSG")
              .when(k % 8 === 6, "T3_US_TACC")
              .otherwise("T1_IT_CNAF").as("Site"),
            when(k % 8 === 0, "CMSHTPC_T3_US_NERSC_Cori_SL7")
              .when(k % 8 === 1, "CMSHTPC_T3_US_NERSC_Cori_KNL")
              .when(k % 8 === 2, "whatever")
              .when(k % 8 === 3,
                when(k % 2 === 1, "OTHER") // routes to null -> dropped
                  .otherwise("CMSHTPC_T3_US_SDSC_osg-comet"))
              .when(k % 8 === 4, "CMSHTPC_T3_US_SDSC-Expanse")
              .when(k % 8 === 5, "OSG_US_TACC_JETSTREAM")
              .when(k % 8 === 6, "CMSHTPC_T3_US_TACC_FRONTERA")
              .otherwise("x").as("GLIDEIN_Entry_Name"),
            when(k % 16 < 8, lit(null).cast("string"))
              .otherwise("r1.marconi.cineca.it").as("RemoteHost"),
            (k % 64 + 1).cast("double").as("RequestCpus"))
        graft.jobs.CondorJobs.hpcAtCms(env, 0L, Long.MaxValue)
      }),

    // The FLAGSHIP reference pipeline end-to-end under oracle:
    // rucio_datasets_stats.py's create_main_df (40-transformation DAG,
    // :143-676) as RucioJobs.datasetsStats over rucio-shaped frames
    // derived from the testdata tables — the whole chain is exercised:
    // live-RSE prep with hex-normalized ids, the REPLICAS ⟗ DIDS
    // full-outer file map with size-priority coalesce and null-ignoring
    // greatest on access times, the file→block→container hierarchy
    // join, the broadcast RSE enrichment, and the final per-(rse,
    // dataset) aggregate with conditional accessed counts and UNKNOWN
    // fills. Every gate is populated: dropped replicas (STATE/SCOPE),
    // hidden/deleted DIDs, DID-only and replica-only files, files
    // missing from the hierarchy, and deleted RSEs. The oracle replays
    // the DAG in CTEs; greatest() is expanded to its null-ignoring
    // CASE form (Spark's greatest skips nulls, DuckDB's propagates).
    QueryDef(
      "q241_rucio_dataset_stats",
      Some("""
        WITH rep AS (
          SELECT '/store/f' || l_orderkey || '_' || l_linenumber AS fname,
                 lower(hex('R' || (l_suppkey % 25))) AS rse_id,
                 CAST(floor(l_extendedprice) AS BIGINT) AS rep_bytes,
                 CASE WHEN l_linenumber % 3 = 0 THEN NULL
                      ELSE CAST(date_diff('day', DATE '1992-01-01',
                             CAST(l_shipdate AS DATE)) AS BIGINT)
                           * 86400000 END AS rep_accessed_at
          FROM lineitem
          WHERE l_linenumber % 5 <> 0    -- STATE = 'A'
            AND l_partkey % 11 <> 0),    -- SCOPE = 'cms'
        fdid AS (
          SELECT '/store/f' || l_orderkey || '_' || l_linenumber AS dname,
                 CAST(floor(l_quantity * 1000) AS BIGINT) AS did_bytes,
                 CASE WHEN l_linenumber % 2 = 0 THEN NULL
                      ELSE (CAST(date_diff('day', DATE '1992-01-01',
                              CAST(l_shipdate AS DATE)) AS BIGINT)
                            + l_suppkey % 37) * 86400000
                      END AS did_accessed_at
          FROM lineitem
          WHERE l_linenumber % 7 <> 1    -- DID row exists
            AND l_suppkey % 13 <> 0      -- HIDDEN = 0
            AND l_orderkey % 97 <> 0),   -- DELETED_AT IS NULL
        files AS (
          SELECT coalesce(fname, dname) AS file_name,
                 rse_id,
                 coalesce(rep_bytes, did_bytes) AS fsize,
                 CASE WHEN rep_accessed_at IS NULL THEN did_accessed_at
                      WHEN did_accessed_at IS NULL THEN rep_accessed_at
                      ELSE greatest(rep_accessed_at, did_accessed_at)
                 END AS accessed_at
          FROM rep FULL OUTER JOIN fdid ON fname = dname),
        f2d AS (
          SELECT bf.file_name, db.dataset
          FROM (SELECT '/blk_' || l_orderkey AS block,
                       '/store/f' || l_orderkey || '_' || l_linenumber
                         AS file_name
                FROM lineitem WHERE l_partkey % 13 <> 0) bf
          JOIN (SELECT '/ds_' || (o_custkey % 100) AS dataset,
                       '/blk_' || o_orderkey AS block
                FROM orders) db USING (block)),
        rses AS (
          SELECT lower(hex('R' || n_nationkey)) AS rse_id,
                 'T' || (n_nationkey % 3) || '_' || n_name ||
                   CASE WHEN n_nationkey % 7 = 0 THEN '_Temp'
                        WHEN n_nationkey % 7 = 1 THEN '_Test'
                        ELSE '_Disk' END AS rse
          FROM nation WHERE n_nationkey % 11 <> 3)  -- DELETED_AT IS NULL
        SELECT coalesce(r.rse, 'UNKNOWN') AS rse,
               coalesce(d.dataset, 'UNKNOWN') AS dataset,
               count(*) AS n_files,
               count(*) FILTER (WHERE f.accessed_at IS NOT NULL)
                 AS n_accessed,
               CAST(sum(f.fsize) AS BIGINT) AS total_bytes,
               max(f.accessed_at) AS last_accessed_at
        FROM files f
        LEFT JOIN f2d d USING (file_name)
        LEFT JOIN rses r USING (rse_id)
        GROUP BY 1, 2"""),
      (s, d) => {
        // plain load, not loadSpread: every input feeds straight into
        // a join shuffle or a broadcast, and the projections are
        // cheap — the spread repartition would add one exchange per
        // table (5 here) purely for single-split local files
        val li = Tables.load(s, d, "lineitem")
        val ord = Tables.load(s, d, "orders")
        val nat = Tables.load(s, d, "nation")
        val fname = concat(lit("/store/f"), col("l_orderkey"),
          lit("_"), col("l_linenumber"))
        val shipDays =
          datediff(col("l_shipdate"), lit("1992-01-01")).cast("long")
        val replicas = li.select(
          fname.as("NAME"),
          when(col("l_linenumber") % 5 === 0, "U").otherwise("A")
            .as("STATE"),
          when(col("l_partkey") % 11 === 0, "user").otherwise("cms")
            .as("SCOPE"),
          concat(lit("R"), col("l_suppkey") % 25).as("RSE_ID"),
          floor(col("l_extendedprice")).cast("long").as("BYTES"),
          when(col("l_linenumber") % 3 === 0, lit(null).cast("long"))
            .otherwise(shipDays * 86400000L).as("ACCESSED_AT"))
        val dids = li
          .filter(col("l_linenumber") % 7 =!= 1)
          .select(
            fname.as("NAME"),
            lit("F").as("DID_TYPE"),
            when(col("l_suppkey") % 13 === 0, 1).otherwise(0)
              .as("HIDDEN"),
            when(col("l_orderkey") % 97 === 0, lit(123L))
              .otherwise(lit(null).cast("long")).as("DELETED_AT"),
            floor(col("l_quantity") * 1000).cast("long").as("BYTES"),
            when(col("l_linenumber") % 2 === 0, lit(null).cast("long"))
              .otherwise((shipDays + col("l_suppkey") % 37)
                * 86400000L).as("ACCESSED_AT"))
        val blockFile = li
          .filter(col("l_partkey") % 13 =!= 0)
          .select(
            lit("D").as("DID_TYPE"), lit("F").as("CHILD_TYPE"),
            concat(lit("/blk_"), col("l_orderkey")).as("NAME"),
            fname.as("CHILD_NAME"))
        val dsBlock = ord.select(
          lit("C").as("DID_TYPE"), lit("D").as("CHILD_TYPE"),
          concat(lit("/ds_"), col("o_custkey") % 100).as("NAME"),
          concat(lit("/blk_"), col("o_orderkey")).as("CHILD_NAME"))
        val rses = nat.select(
          concat(lit("R"), col("n_nationkey")).as("ID"),
          concat(lit("T"), col("n_nationkey") % 3, lit("_"),
            col("n_name"),
            when(col("n_nationkey") % 7 === 0, "_Temp")
              .when(col("n_nationkey") % 7 === 1, "_Test")
              .otherwise("_Disk")).as("RSE"),
          when(col("n_nationkey") % 2 === 0, "DISK").otherwise("TAPE")
            .as("RSE_TYPE"),
          when(col("n_nationkey") % 11 === 3, lit(1L))
            .otherwise(lit(null).cast("long")).as("DELETED_AT"))
        RucioJobs.datasetsStats(replicas, dids,
          blockFile.unionByName(dsBlock), rses)
      }))
}
