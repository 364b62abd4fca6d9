package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{Aggregates, Calendar}

/** HTCondor-stream jobs (degraded/condor_cpu_efficiency.py,
  * condor_crab_unique_users.py, hpc_running_cores_and_corehr.py).
  * Inputs are the pruned-envelope frame (`Schemas.condorEnvelope`)
  * flattened to `data.*` columns.
  */
object CondorJobs {

  /** Flatten the MONIT envelope: `select("data.*")` + metadata ts
    * (spark_utils.py:391). */
  def flatten(envelope: DataFrame): DataFrame =
    envelope.select(col("data.*"), col("metadata.timestamp").as("meta_ts"))

  /** CPU efficiency per workflow/site — the ratio-of-sums idiom
    * `100*sum(CpuTimeHr)/sum(CoreHr)` over completed jobs at T1/T2
    * sites (degraded/condor_cpu_efficiency.py:369-417). */
  def cpuEfficiency(condor: DataFrame,
      sitePattern: String = "^T(1|2)_"): DataFrame =
    condor
      .filter(col("Status") === "Completed"
        && col("Site").rlike(sitePattern)
        && col("CoreHr") > 0)
      .groupBy(col("Workflow").as("workflow"), col("Site").as("site"),
        col("Type").as("job_type"))
      .agg(
        Aggregates.ratioOfSums(col("CpuTimeHr"), col("CoreHr"))
          .as("cpu_eff_pct"),
        Aggregates.decSum(col("CoreHr")).as("total_core_hr"),
        count(lit(1)).as("n_jobs"))

  /** Unique CRAB users per calendar month — dedup on GlobalJobId
    * against multi-day re-reads, then exact countDistinct
    * (condor_crab_unique_users.py:75-93). */
  def crabUniqueUsers(condor: DataFrame): DataFrame =
    condor
      .filter(col("Status") === "Completed" && col("Type") === "analysis"
        && col("CRAB_UserHN").isNotNull)
      .dropDuplicates(Seq("GlobalJobId"))
      .groupBy(
        year(from_unixtime(col("RecordTime") / 1000)).as("yr"),
        month(from_unixtime(col("RecordTime") / 1000)).as("mo"))
      .agg(
        countDistinct(col("CRAB_UserHN")).as("n_users"),
        count(lit(1)).as("n_jobs"))

  /** The 13-branch HPC site router
    * (hpc_running_cores_and_corehr.py:93-126), condensed to its shape:
    * (Site, SubSite) → effective site via a when-chain. */
  def hpcSite(site: Column, subSite: Column): Column =
    when(site === "T3_US_NERSC" && subSite.isNotNull,
      concat(site, lit("_"), subSite))
      .when(site === "T3_US_NERSC", site)
      .when(site.startsWith("T3_US_ANL"), lit("ANL"))
      .when(site.startsWith("T3_US_OSG"), lit("OSG"))
      .when(site.startsWith("T3_US_PSC"), lit("PSC"))
      .when(site.startsWith("T3_US_SDSC"), lit("SDSC"))
      .when(site.startsWith("T3_US_TACC"), lit("TACC"))
      .otherwise(site)

  /** Running cores per 12-minute bin: per-(bin, job) max cores first
    * (dedup against producer re-sends), then per-bin sum — the
    * two-stage groupBy of hpc_running_cores_and_corehr.py:206-221.
    * RecordTime is epoch millis. */
  def runningCores(condor: DataFrame): DataFrame = {
    val binned = condor
      .filter(col("Status") === "Running")
      .select(
        Calendar.tumblingBinSeconds(expr("RecordTime div 1000"), 720L)
          .as("bin"),
        hpcSite(col("Site"), col("MachineAttrCMSSubSiteName0"))
          .as("site"),
        col("GlobalJobId"), col("RequestCpus"))
    binned
      .groupBy(col("bin"), col("site"), col("GlobalJobId"))
      .agg(max(col("RequestCpus")).as("cores"))
      .groupBy(col("bin"), col("site"))
      .agg(Aggregates.decSum(col("cores"), 0).as("running_cores"),
        count(lit(1)).as("n_jobs"))
  }

  /** HS06 CPU hours per calendar period (condor_hs06coreHrPlot
    * .py:53-92): completed jobs at sites matching `includeRe` minus
    * `excludeRe`, windowed on RecordTime, deduped on GlobalJobId, then
    * HS06CpuTimeHr summed by (year, month|weekofyear). `byWeek` flips
    * the period column exactly like the reference's `--by` option.
    * Input needs (GlobalJobId, RecordTime, HS06CpuTimeHr, Status,
    * Site) — the reference reads its own pruned schema for this app. */
  def hs06CpuHours(condor: DataFrame, startMs: Long, endMs: Long,
      byWeek: Boolean = false, includeRe: String = "^T2_.*$",
      excludeRe: String = ".*_CERN.*"): DataFrame = {
    val period: Column => Column =
      if (byWeek) weekofyear else month
    val periodName = if (byWeek) "weekofyear" else "month"
    condor
      .filter(col("Status") === "Completed"
        && col("Site").rlike(includeRe)
        && !col("Site").rlike(excludeRe)
        && col("RecordTime") >= startMs && col("RecordTime") < endMs)
      .withColumn("RecordDate", from_unixtime(col("RecordTime") / 1000))
      .dropDuplicates(Seq("GlobalJobId"))
      .groupBy(year(col("RecordDate")).as("year"),
        period(col("RecordDate")).as(periodName))
      .agg(sum(col("HS06CpuTimeHr")).as("sum_HS06CpuTimeHr"))
  }

  /** CRAB dataset popularity from the condor stream
    * (dbs_hdfs_crab.py:74-103): completed/removed CRAB jobs in the
    * window, deduped on GlobalJobId, dataset/datatier split out of the
    * block name by regexp, per-dataset job/workflow/read stats.
    *
    * The reference does `.repartition("CRAB_DataBlock")
    * .drop_duplicates(["GlobalJobId"])` (dbs_hdfs_crab.py:87-90) —
    * but dropDuplicates shuffles on ITS key regardless, so that
    * repartition is a wasted full shuffle; here the dedup's own
    * exchange on GlobalJobId is the only one before the aggregate. */
  def crabPopularity(condor: DataFrame, startMs: Long, endMs: Long)
      : DataFrame = {
    val blockRe = "^(.*)/([^/]*)#.*$"
    val win = condor
      .filter(col("Status").isin("Completed", "Removed")
        && col("CRAB_DataBlock").isNotNull
        && col("meta_ts") >= startMs && col("meta_ts") <= endMs)
      .dropDuplicates(Seq("GlobalJobId"))
      .select(
        col("CMSPrimaryPrimaryDataset").as("PrimaryDataset"),
        regexp_extract(col("CRAB_DataBlock"), blockRe, 1).as("Dataset"),
        regexp_extract(col("CRAB_DataBlock"), blockRe, 2).as("Datatier"),
        col("RecordTime"), col("CRAB_Workflow"),
        col("ChirpCMSSWReadBytes"))
    win
      .groupBy(col("Datatier"), col("PrimaryDataset"), col("Dataset"))
      .agg(
        max(col("RecordTime")).as("max_RecordTime"),
        min(col("RecordTime")).as("min_RecordTime"),
        count(lit(1)).as("job_count"),
        countDistinct(col("CRAB_Workflow")).as("workflow_count"),
        sum(col("ChirpCMSSWReadBytes")).as("ChirpCMSSWReadBytes"))
      .na.fill("Unknown", Seq("Datatier", "PrimaryDataset", "Dataset"))
  }

  /** The nine HPC accounting channels of degraded/hpc_at_cms.py:84-108
    * (the CMSMONIT-341 site/entry routing), as a when-cascade over
    * (Site, GLIDEIN_Entry_Name, RemoteHost). The conditions partition
    * the eligible rows (each is keyed on a disjoint entry-name set),
    * so the cascade order only mirrors the reference's d1..d9 listing;
    * rows matching no channel route to null and are dropped. */
  def hpcChannel(site: Column, entry: Column, host: Column): Column = {
    val nersc1 = Seq("CMSHTPC_T3_US_NERSC_Cori_SL7", "CMSHTPC_T3_US_NERSC_Cori",
      "CMSHTPC_T3_US_NERSC_Cori_SL7_PREM", "CMSHTPC_T3_US_NERSC_Cori_SL6_PREM")
    val nersc2 = Seq("CMSHTPC_T3_US_NERSC_Cori_KNL_SL7",
      "CMSHTPC_T3_US_NERSC_Cori_KNL")
    val tacc7 = Seq("CMSHTPC_T3_US_TACC-Stampede2", "CMSHTPC_T3_US_TACC")
    when(site === "T3_US_NERSC" && entry.isin(nersc1: _*), "NERSC_Cori")
      .when(site === "T3_US_NERSC" && entry.isin(nersc2: _*), "NERSC_Cori_KNL")
      .when(site === "T3_US_PSC", "PSC_Bridges")
      .when(site === "T3_US_SDSC" && entry === "CMSHTPC_T3_US_SDSC_osg-comet",
        "SDSC_Comet")
      .when(site === "T3_US_SDSC" && entry === "CMSHTPC_T3_US_SDSC-Expanse",
        "SDSC_Expanse")
      .when((site === "T3_US_TACC" || site === "T3_US_OSG")
        && entry === "OSG_US_TACC_JETSTREAM", "TACC_Jetstream")
      .when(site === "T3_US_TACC" && entry.isin(tacc7: _*), "TACC_Stampede2")
      .when(site === "T3_US_TACC" && entry === "CMSHTPC_T3_US_TACC_FRONTERA",
        "TACC_Frontera")
      .when(site === "T1_IT_CNAF"
        && (host.isNull || host.endsWith("marconi.cineca.it")), "CNAF_Marconi")
  }

  /** HPC-at-CMS hourly core-hour series (degraded/hpc_at_cms.py:
    * 53-160): completed non-failed jobs at the six HPC sites in
    * [startMs, endMs), deduped on GlobalJobId, routed to a channel by
    * [[hpcChannel]], then RequestCpus summed per (hour, channel) over
    * a DENSE hourly spine — every hour of the window appears for every
    * channel, zero-filled, like the reference's `pd.Grouper(freq='1H')`
    * resample concat'd against the full `date_list` index.
    *
    * The reference computes this by `toPandas()` on the driver — nine
    * boolean-mask copies of the whole window — then resamples each;
    * here it is one distributed pass: filter → dedup (shuffle on
    * GlobalJobId) → single map-side-partial aggregate, and the spine
    * is `spark.range(hours) × 9 channels` (driver-size arithmetic
    * only, no collect). Long (hour, channel, request_cpus) output —
    * the plot layer pivots; note the reference's final concat drops
    * its d4 (SDSC_Comet) column, a plotting bug we do not reproduce.
    * RecordTime is epoch millis; RequestCpus is double (the envelope
    * schema, hpc_at_cms.py:44). */
  def hpcAtCms(condor: DataFrame, startMs: Long, endMs: Long): DataFrame = {
    val hpcSites = Seq("T3_US_NERSC", "T3_US_PSC", "T3_US_SDSC",
      "T3_US_TACC", "T3_US_OSG", "T1_IT_CNAF")
    val binned = condor
      .filter(col("Status") === "Completed" && col("JobFailed") === 0
        && col("RecordTime") >= startMs && col("RecordTime") < endMs
        && col("Site").isin(hpcSites: _*))
      .dropDuplicates(Seq("GlobalJobId"))
      .withColumn("channel", hpcChannel(col("Site"),
        col("GLIDEIN_Entry_Name"), col("RemoteHost")))
      .filter(col("channel").isNotNull)
      .groupBy(
        Calendar.tumblingBinSeconds(expr("RecordTime div 1000"), 3600L)
          .as("hour"),
        col("channel"))
      // RequestCpus is double in the envelope but integral in practice;
      // decimal(18,1) addition is order-independent (hash-stable) while
      // keeping any fractional-cpu rows exact
      .agg(Aggregates.decSum(col("RequestCpus"), 1).as("request_cpus"))
    val spark = condor.sparkSession
    val channels = Seq("NERSC_Cori", "NERSC_Cori_KNL", "PSC_Bridges",
      "SDSC_Comet", "SDSC_Expanse", "TACC_Jetstream", "TACC_Stampede2",
      "TACC_Frontera", "CNAF_Marconi")
    // Spine bounds stay in-plan: explicit window bounds when the
    // caller gave finite ones (zero rows for silent hours, like the
    // reference's date_list), the data's own hour extremes otherwise
    // (the wide-open CLI form — a literal spine over (0, MaxValue)
    // would be astronomically long). `binned` feeds both the bounds
    // aggregate and the fill join → one materialization barrier.
    val b = graft.core.Checkpoints.barrier(binned)
    val startHour = startMs / 1000 / 3600 * 3600
    val endHour = (endMs / 1000 - 1) / 3600 * 3600
    val h0 = if (startMs > 0L) lit(startHour)
      else coalesce(min(col("hour")), lit(0L))
    val h1 = if (endMs < Long.MaxValue) lit(endHour)
      else coalesce(max(col("hour")), lit(-3600L))
    val spine = b
      .agg(h0.as("h0"), h1.as("h1"))
      .select(explode(when(col("h1") >= col("h0"),
        sequence(col("h0"), col("h1"), lit(3600L)))
        .otherwise(array())).as("hour"))
      .crossJoin(spark.createDataFrame(channels.map(Tuple1(_)))
        .toDF("channel"))
    spine
      .join(b, Seq("hour", "channel"), "left")
      .na.fill(0L, Seq("request_cpus"))
  }

  /** The DBS×Condor merge report (degraded/dbs_condor.py:42-190): one
    * long-format frame holding the reference's four rollups —
    * `dataset` and `campaign` aggregated over the RAW condor stream,
    * `release` and `era` over condor joined to the DBS dimension
    * closure (ddf⋈fdf⋈daf⋈aef⋈pef for VALID datasets, then
    * mcf⋈ocf⋈rvf for the release; dbs_condor.py:76-104) restricted to
    * `KEvents > 0` rows (py:110-117). Group keys per rollup are the
    * reference's: (scope value, user, ExitCode, Type, TaskType,
    * RecordTime); measures `sum_evts`/`sum_chr`; `rate` is the
    * reference's guarded events-per-core-hour UDF (py:124-129: -1
    * when either sum is NULL or 0 — here a `when` expression, not a
    * UDF); `tier` = 4th '/'-component of the dataset name, only
    * meaningful in the `dataset` scope.
    *
    * Deliberately NOT ported: the reference's two-pass
    * ExitCode∈{0,≠0} split (py:133-144) exists only to dodge its
    * engine's Integer.MAX_VALUE partition limit — the ExitCode is
    * already a full group key, so the split is a union of disjoint
    * group subsets computed twice. One hash aggregation per rollup
    * produces the identical row set (JobsSpec pins the exit-0 /
    * exit-≠0 subsets against hand-computed frames); `exit_ok`
    * materializes the split label for consumers of the old layout.
    * Scale: each rollup is one shuffle on its group key; the DBS
    * closure is dimension-sized and AQE broadcasts it under the
    * condor fact stream. */
  def dbsCondor(condor: DataFrame, ddf: DataFrame, fdf: DataFrame,
      daf: DataFrame, aef: DataFrame, pef: DataFrame, mcf: DataFrame,
      ocf: DataFrame, rvf: DataFrame, date: String): DataFrame = {
    // dbs_condor.py:76-95 — dataset closure + per-dataset stats
    val fjoin = ddf
      .join(fdf, col("d_dataset_id") === col("f_dataset_id"))
      .join(daf,
        col("d_dataset_access_type_id") === col("dataset_access_type_id"))
      .join(aef, col("d_acquisition_era_id") === col("acquisition_era_id"))
      .join(pef, col("d_processing_era_id") === col("processing_era_id"))
      .filter(col("dataset_access_type") === "VALID"
        && col("d_is_dataset_valid") === 1)
      .select(col("d_dataset_id"), col("d_dataset"),
        col("d_creation_date"), col("f_event_count"), col("f_file_size"),
        col("dataset_access_type"), col("acquisition_era_name"),
        col("processing_version"))
      .distinct()
    val newdf = fjoin
      .groupBy(col("d_dataset"), col("d_dataset_id"),
        col("dataset_access_type"), col("acquisition_era_name"),
        col("processing_version"))
      .agg(sum(col("f_event_count")).as("evts"),
        sum(col("f_file_size")).as("size"),
        max(col("d_creation_date")).as("dbs_date"))
    // py:98-104 — release-version closure. Deliberately NO distinct,
    // matching the reference's plain JOIN chain: a dataset with two
    // output-mod-configs on the same release yields two closure rows
    // there too, so the downstream rollups double-count identically.
    // Reference-parity over dedup is the contract for this job (a
    // cleaned variant would be a different report than the one the
    // reference's consumers reconcile against).
    val aggDbs = newdf
      .join(mcf, col("d_dataset_id") === col("mc_dataset_id"))
      .join(ocf,
        col("mc_output_mod_config_id") === col("oc_output_mod_config_id"))
      .join(rvf, col("oc_release_version_id") === col("r_release_version_id"))
      .select(col("d_dataset"), col("acquisition_era_name"),
        col("r_release_version"))
    // py:106-117 — the merge; KEvents>0 guards the fact side
    val merged = condor.filter(col("KEvents") > 0)
      .join(aggDbs, col("d_dataset") === col("DESIRED_CMSDataset"))

    val rate = when(
      col("sum_evts").isNotNull && col("sum_evts") =!= 0.0 &&
        col("sum_chr").isNotNull && col("sum_chr") =!= 0.0,
      col("sum_evts") / col("sum_chr")).otherwise(lit(-1.0))
    def rollup(src: DataFrame, scope: String, keyCol: Column,
        tier: Column): DataFrame =
      src
        .groupBy(keyCol.as("key"), col("CRAB_UserHN").as("user"),
          col("ExitCode").as("exit_code"), col("Type").as("job_type"),
          col("TaskType").as("task_type"),
          col("RecordTime").as("rec_time"))
        .agg(Aggregates.decSum(col("KEvents")).as("sum_evts"),
          Aggregates.decSum(col("CoreHr")).as("sum_chr"))
        .select(lit(scope).as("scope"), col("key"), tier.as("tier"),
          col("user"), (col("exit_code") === 0L).as("exit_ok"),
          col("exit_code"), col("job_type"), col("task_type"),
          col("rec_time"), lit(date).as("date"),
          col("sum_evts"), col("sum_chr"), rate.as("rate"))
    rollup(condor, "dataset", col("DESIRED_CMSDataset"),
        split(col("key"), "/").getItem(3))
      .unionByName(rollup(condor, "campaign", col("Campaign"),
        lit(null).cast("string")))
      .unionByName(rollup(merged, "release", col("r_release_version"),
        lit(null).cast("string")))
      .unionByName(rollup(merged, "era", col("acquisition_era_name"),
        lit(null).cast("string")))
  }
}
