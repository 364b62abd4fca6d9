package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Aggregates

/** Rucio-family jobs (rucio_datasets_stats.py, rucio_ds_summary.py)
  * re-expressed Spark-first. Naming note (the reference's trap, kept
  * here): Rucio "dataset" = DBS block, Rucio "container" = DBS dataset
  * (rucio_datasets_stats.py:171-194).
  */
object RucioJobs {

  /** RSE dimension prep (rucio_datasets_stats.py:150-169): live RSEs,
    * hex-normalized id, kind classification (temp/test/prod) and
    * tier/country from the `T2_US_FNAL`-style name. Small dim —
    * broadcast at the join sites. */
  def prepRses(rses: DataFrame): DataFrame =
    rses
      .filter(col("DELETED_AT").isNull)
      .select(
        lower(hex(col("ID"))).as("rse_id"),
        col("RSE").as("rse"),
        col("RSE_TYPE").as("rse_type"),
        when(col("RSE").contains("Temp"), "temp")
          .when(col("RSE").contains("Test"), "test")
          .otherwise("prod").as("rse_kind"),
        split(col("RSE"), "_").getItem(0).as("rse_tier"),
        get(split(col("RSE"), "_"), lit(1)).as("rse_country"))

  /** File-level map: available replicas ⟗ file DIDs, size by priority
    * (replica bytes, else DID bytes) and access time from either side —
    * the full-outer + coalesce core of rucio_datasets_stats.py:238-274,
    * 408-410. */
  def fileMap(replicas: DataFrame, dids: DataFrame): DataFrame = {
    val rep = replicas
      .filter(col("STATE") === "A" && col("SCOPE") === "cms")
      .select(col("NAME").as("fname"),
        lower(hex(col("RSE_ID"))).as("rse_id"),
        col("BYTES").as("rep_bytes"),
        col("ACCESSED_AT").as("rep_accessed_at"))
    val fdids = dids
      .filter(col("DID_TYPE") === "F" && col("HIDDEN") === 0 &&
        col("DELETED_AT").isNull)
      .select(col("NAME").as("dname"), col("BYTES").as("did_bytes"),
        col("ACCESSED_AT").as("did_accessed_at"))
    rep.join(fdids, rep("fname") === fdids("dname"), "full")
      .select(
        coalesce(col("fname"), col("dname")).as("file_name"),
        col("rse_id"),
        Aggregates.coalescePriority(col("rep_bytes"), col("did_bytes"))
          .as("fsize"),
        greatest(col("rep_accessed_at"), col("did_accessed_at"))
          .as("accessed_at"))
  }

  /** Contents hierarchy: file → block → container(dataset)
    * (rucio_datasets_stats.py:171-194). */
  def fileToDataset(contents: DataFrame): DataFrame = {
    val blockFile = contents
      .filter(col("DID_TYPE") === "D" && col("CHILD_TYPE") === "F")
      .select(col("NAME").as("block"), col("CHILD_NAME").as("file_name"))
    val dsBlock = contents
      .filter(col("DID_TYPE") === "C" && col("CHILD_TYPE") === "D")
      .select(col("NAME").as("dataset"), col("CHILD_NAME").as("block"))
    blockFile.join(dsBlock, Seq("block"))
      .select(col("file_name"), col("dataset"))
  }

  /** Flagship per-(RSE, dataset) stats (create_main_df,
    * rucio_datasets_stats.py:143-676 condensed): file map enriched with
    * the dataset hierarchy and the RSE dim, then one hash aggregation
    * with conditional accessed-file counts. At 100 TB the only wide
    * exchanges are the full-outer file map and this final groupBy —
    * both keyed well; RSEs broadcast. */
  def datasetsStats(replicas: DataFrame, dids: DataFrame,
      contents: DataFrame, rses: DataFrame): DataFrame = {
    val files = fileMap(replicas, dids)
    val f2d = fileToDataset(contents)
    val enriched = files
      .join(f2d, Seq("file_name"), "left")
      .join(broadcast(prepRses(rses)), Seq("rse_id"), "left")
    enriched
      .groupBy(col("rse"), col("dataset"))
      .agg(
        count(lit(1)).as("n_files"),
        Aggregates.countIf(col("accessed_at").isNotNull).as("n_accessed"),
        sum(col("fsize")).as("total_bytes"),
        max(col("accessed_at")).as("last_accessed_at"))
      .na.fill("UNKNOWN", Seq("rse", "dataset"))
  }

  /** Dataset monitoring (rucio_datasets_monitoring.py:239-439): lock
    * accounts per (dataset, RSE) via the compound-key locks join,
    * deterministic account list (sort_array(collect_set)), and the
    * DecimalType(6,2) FilePercentage column of the reference. */
  def datasetsMonitoring(perRseStats: DataFrame,
      locks: DataFrame): DataFrame = {
    val l = locks
      .filter(col("STATE") === "O")
      .select(lower(hex(col("RSE_ID"))).as("rse_id"),
        col("NAME").as("dataset"), col("ACCOUNT").as("account"))
      .groupBy(col("rse_id"), col("dataset"))
      .agg(array_join(sort_array(collect_set(col("account"))), ",")
        .as("lock_accounts"),
        count(lit(1)).as("n_locks"))
    perRseStats
      .join(l, perRseStats("rse_id") === l("rse_id")
        && perRseStats("dataset") === l("dataset"), "left")
      .select(perRseStats("rse_id"), perRseStats("dataset"),
        col("n_files"), col("n_accessed"), col("total_bytes"),
        coalesce(col("n_locks"), lit(0L)).as("n_locks"),
        coalesce(col("lock_accounts"), lit("")).as("lock_accounts"),
        (col("n_accessed") * lit(100.0) / col("n_files"))
          .cast(DecimalType(6, 2)).as("file_percentage"))
  }

  /** Two-level summary (rucio_ds_summary.py:292-334): per-(dataset,RSE)
    * sizes, then per-dataset Max/Min/Avg/Sum over its RSE copies. */
  def dsSummary(perRseStats: DataFrame): DataFrame =
    perRseStats
      .groupBy(col("dataset"))
      .agg(
        count(lit(1)).as("n_rses"),
        max(col("total_bytes")).as("max_size"),
        min(col("total_bytes")).as("min_size"),
        avg(col("total_bytes")).as("avg_size"),
        sum(col("total_bytes")).as("sum_size"),
        max(col("last_accessed_at")).as("last_access"))

  /** File × RSE × timestamps × size combine
    * (degraded/rucio_datasets_last_access_ts.py:106-195): available
    * cms-scope replicas (backfill paths excluded) LEFT-joined to file
    * DIDs on name; size by REPLICAS-first priority, access and create
    * times as the greatest of the two sides' values. One shuffle on
    * file name; everything else is narrow. */
  def fileRseTsSize(replicas: DataFrame, dids: DataFrame,
      backfillPrefix: String = "/store/backfill/"): DataFrame = {
    val rep = replicas
      .filter(col("SCOPE") === "cms" &&
        !col("NAME").startsWith(backfillPrefix))
      .select(col("NAME").as("f_name"),
        lower(hex(col("RSE_ID"))).as("rse_id"),
        col("BYTES").as("f_size_replicas"),
        col("ACCESSED_AT").as("rep_accessed_at"),
        col("CREATED_AT").as("rep_created_at"))
    val fd = dids
      .filter(col("DID_TYPE") === "F" && col("HIDDEN") === 0 &&
        col("DELETED_AT").isNull && col("SCOPE") === "cms")
      .select(col("NAME").as("f_name"), col("BYTES").as("f_size_dids"),
        col("ACCESSED_AT").as("dids_accessed_at"),
        col("CREATED_AT").as("dids_created_at"))
    rep.join(fd, Seq("f_name"), "left")
      .select(col("f_name"), col("rse_id"),
        Aggregates.coalescePriority(col("f_size_replicas"),
          col("f_size_dids")).as("f_size"),
        greatest(col("dids_accessed_at"), col("rep_accessed_at"))
          .as("accessed_at"),
        greatest(col("dids_created_at"), col("rep_created_at"))
          .as("created_at"))
  }

  /** Per-(RSE, dataset) access profile — the shared aggregate beneath
    * both report families (rucio_datasets_last_access_ts.py:223-319):
    * TB size (10^12 denominator, round 5), last access/create, file
    * counts incl. how many files were EVER accessed (a dataset with
    * even one never-accessed file is suspect for the not-read report).
    * Input rows are [[fileRseTsSize]] output joined to a (f_name →
    * dataset) map with dataset null rows dropped (the reference's
    * get_df_dataset_file_rse_ts_size). */
  def rseDatasetAccess(files: DataFrame, f2d: DataFrame): DataFrame =
    files
      .join(f2d, Seq("f_name"), "left")
      .filter(col("dataset").isNotNull)
      .groupBy(col("rse_id"), col("dataset"))
      .agg(
        round(sum(col("f_size")) / lit(1e12), 5)
          .as("dataset_size_in_rse_tb"),
        max(col("accessed_at")).as("last_access_of_dataset_in_rse"),
        max(col("created_at")).as("last_create_of_dataset_in_rse"),
        Aggregates.countIf(col("accessed_at").isNotNull)
          .as("n_accessed_files"),
        count(lit(1)).as("n_files"))

  /** Datasets not read since the cutoff
    * (rucio_datasets_last_access_ts.py:258-319): accessed at least
    * once, last access older than `cutoffEpochMs`, bigger than
    * `minTb`. RSE names land via the broadcast dim. */
  def notReadSince(access: DataFrame, rses: DataFrame, minTb: Double,
      cutoffEpochMs: Long): DataFrame =
    access
      .filter(col("last_access_of_dataset_in_rse").isNotNull &&
        col("last_access_of_dataset_in_rse") < cutoffEpochMs &&
        col("dataset_size_in_rse_tb") > minTb)
      .join(broadcast(prepRses(rses)), Seq("rse_id"), "left")
      .select(col("rse").as("rse_name"), col("dataset"),
        col("dataset_size_in_rse_tb"),
        col("last_access_of_dataset_in_rse"), col("n_files"),
        col("n_accessed_files"))

  /** Datasets NEVER read (rucio_datasets_last_access_ts.py:223-255):
    * no file of the dataset in that RSE was ever accessed. */
  def neverRead(access: DataFrame, rses: DataFrame,
      minTb: Double): DataFrame =
    access
      .filter(col("last_access_of_dataset_in_rse").isNull &&
        col("dataset_size_in_rse_tb") > minTb)
      .join(broadcast(prepRses(rses)), Seq("rse_id"), "left")
      .select(col("rse").as("rse_name"), col("dataset"),
        col("dataset_size_in_rse_tb"),
        col("last_create_of_dataset_in_rse"), col("n_files"))

  /** Cross-RSE dataset rollup for the main report
    * (rucio_datasets_last_access_ts.py:322-336): size spread across
    * copies, overall last access, deterministic RSE list (the
    * reference's collect_list order is undefined; sort_array makes it
    * reproducible). */
  def datasetMainSummary(sub: DataFrame): DataFrame =
    sub
      .groupBy(col("dataset"))
      .agg(
        max(col("dataset_size_in_rse_tb")).as("max_size_tb"),
        min(col("dataset_size_in_rse_tb")).as("min_size_tb"),
        avg(col("dataset_size_in_rse_tb")).as("avg_size_tb"),
        sum(col("dataset_size_in_rse_tb")).as("sum_size_tb"),
        max(col("last_access_of_dataset_in_rse")).as("last_access"),
        array_join(sort_array(collect_set(col("rse_name"))), ", ")
          .as("rses"))

  /** Access-recency histogram — the binned size report the reference
    * renders as its last-access HTML (src/html/
    * rucio_datasets_last_access_ts): datasets bucketed by the UTC
    * YEAR of their overall last access (epoch-millis), never-read
    * datasets in a `never` bucket, TB and dataset counts per bucket.
    * Two hash aggregations; the year domain is bounded, so the second
    * is a few dozen groups at any scale. */
  def lastAccessYearBins(access: DataFrame): DataFrame =
    access
      .groupBy(col("dataset"))
      .agg(sum(col("dataset_size_in_rse_tb")).as("tb"),
        max(col("last_access_of_dataset_in_rse")).as("last_access"))
      .groupBy(
        // session TZ is pinned UTC (Sessions), so year() is the UTC year
        when(col("last_access").isNull, lit("never"))
          .otherwise(year(timestamp_millis(col("last_access")))
            .cast("string"))
          .as("access_year"))
      .agg(round(sum(col("tb")), 5).as("total_tb"),
        count(lit(1)).as("n_datasets"))

  /** Daily replica tally (rucio_daily.py:30-63): the source-file
    * provenance consumer — the dump date ("tally day") is parsed out of
    * each replica row's ORIGINATING FILE PATH via `input_file_name()` +
    * two substring_index hops (`.../rucio/2024-01-05/part.avro` →
    * `20240105`), the replica creation day out of the epoch-millis
    * CREATED_AT, then replicas join DBS files on LFN and aggregate
    * bytes per (RSE, dataset, scope, tally day, create day).
    *
    * `replicas` must sit DIRECTLY on its scan — any shuffle between
    * scan and this projection blanks input_file_name (q61 scaladoc). */
  def dailyTally(replicas: DataFrame, dbsFiles: DataFrame): DataFrame = {
    val dated = replicas
      .withColumn("filename", input_file_name())
      .withColumn("tally_date",
        substring_index(substring_index(col("filename"), "/rucio/", -1),
          "/", 1))
      .select(
        col("RSE_ID"), col("BYTES"), col("NAME"), col("SCOPE"),
        date_format(to_date(col("tally_date"), "yyyy-MM-dd"), "yyyyMMdd")
          .as("tally_day"),
        date_format(
          to_date((col("CREATED_AT") / 1000).cast("long")
            .cast("timestamp")), "yyyyMMdd").as("create_day"))
    dated
      .join(dbsFiles.select(col("f_logical_file_name"),
        col("f_dataset_id")),
        dated("NAME") === col("f_logical_file_name"))
      .groupBy(col("RSE_ID"), col("f_dataset_id"), col("SCOPE"),
        col("tally_day"), col("create_day"))
      .agg(sum(col("BYTES")).as("rep_size"))
  }
}
