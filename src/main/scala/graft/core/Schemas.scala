package graft.core

import org.apache.spark.sql.types._

/** Schema registry mirroring the reference's `schemas.py` (FIXTURES.md
  * §B): fixed schemas for the RDBMS CSV dumps (DBS), the Rucio Avro
  * dumps, and the pruned JSON envelopes of the MONIT streams. Explicit
  * schemas are a scale feature, not bookkeeping: they skip inference
  * passes and let the scan read exactly the declared columns
  * (SURVEY.md §4 "manual column pruning").
  *
  * Column-name prefixes (`d_`, `f_`, `b_`, `fl_`) encode table
  * provenance and are load-bearing in every join, as in the reference
  * (schemas.py:100-386).
  */
object Schemas {

  private def s(name: String, t: DataType) = StructField(name, t)

  // ---- DBS CSV dumps (schemas.py:13-386) ----

  /** DATASETS (`ddf`) — schemas.py:100-139. */
  val dbsDatasets: StructType = StructType(Seq(
    s("d_dataset_id", LongType), s("d_dataset", StringType),
    s("d_is_dataset_valid", IntegerType), s("d_primary_ds_id", LongType),
    s("d_processed_ds_id", LongType), s("d_data_tier_id", IntegerType),
    s("d_dataset_access_type_id", IntegerType),
    s("d_acquisition_era_id", IntegerType),
    s("d_processing_era_id", IntegerType),
    s("d_physics_group_id", IntegerType), s("d_xtcrosssection", DoubleType),
    s("d_prep_id", StringType), s("d_creation_date", DoubleType),
    s("d_create_by", StringType), s("d_last_modification_date", DoubleType),
    s("d_last_modified_by", StringType)))

  /** FILES (`fdf`) — schemas.py:248-289. */
  val dbsFiles: StructType = StructType(Seq(
    s("f_file_id", LongType), s("f_logical_file_name", StringType),
    s("f_is_file_valid", IntegerType), s("f_dataset_id", LongType),
    s("f_block_id", LongType), s("f_file_type_id", IntegerType),
    s("f_check_sum", StringType), s("f_event_count", LongType),
    s("f_file_size", DoubleType), s("f_branch_hash_id", IntegerType),
    s("f_adler32", StringType), s("f_md5", StringType),
    s("f_auto_cross_section", DoubleType), s("f_creation_date", DoubleType),
    s("f_create_by", StringType), s("f_last_modification_date", DoubleType),
    s("f_last_modified_by", StringType)))

  /** BLOCKS (`bdf`) — schemas.py:184-213. */
  val dbsBlocks: StructType = StructType(Seq(
    s("b_block_id", LongType), s("b_block_name", StringType),
    s("b_dataset_id", LongType), s("b_open_for_writing", IntegerType),
    s("b_origin_site_name", StringType), s("b_block_size", DoubleType),
    s("b_file_count", IntegerType), s("b_creation_date", DoubleType),
    s("b_create_by", StringType), s("b_last_modification_date", DoubleType),
    s("b_last_modified_by", StringType)))

  /** FILE_LUMIS (`flf`) — schemas.py:377-386. */
  val dbsFileLumis: StructType = StructType(Seq(
    s("fl_run_num", IntegerType), s("fl_lumi_section_num", StringType),
    s("fl_file_id", LongType)))

  /** DATA_TIERS (`dtf`) — schemas.py:82-97. */
  val dbsDataTiers: StructType = StructType(Seq(
    s("data_tier_id", IntegerType), s("data_tier_name", StringType),
    s("data_tier_creation_date", DoubleType),
    s("data_tier_create_by", StringType)))

  /** DATASET_ACCESS_TYPES (`daf`) — schemas.py:68-79. */
  val dbsAccessTypes: StructType = StructType(Seq(
    s("dataset_access_type_id", IntegerType),
    s("dataset_access_type", StringType)))

  /** ACQUISITION_ERAS (`aef`) — schemas.py:44-65. */
  val dbsAcquisitionEras: StructType = StructType(Seq(
    s("acquisition_era_id", IntegerType),
    s("acquisition_era_name", StringType), s("start_date", IntegerType),
    s("end_date", IntegerType), s("creation_date", IntegerType),
    s("create_by", StringType), s("description", StringType)))

  /** PROCESSING_ERAS (`pef`) — schemas.py:13-30. */
  val dbsProcessingEras: StructType = StructType(Seq(
    s("processing_era_id", IntegerType),
    s("processing_version", DoubleType), s("creation_date", IntegerType),
    s("create_by", StringType), s("description", StringType)))

  /** PHYSICS_GROUPS (`pgf`) — schemas.py:33-41. */
  val dbsPhysicsGroups: StructType = StructType(Seq(
    s("physics_group_id", IntegerType),
    s("physics_group_name", StringType)))

  /** DATASET_OUTPUT_MOD_CONFIGS (`mcf`) — schemas.py:336-345. */
  val dbsModConfigs: StructType = StructType(Seq(
    s("mc_ds_output_mod_config_id", IntegerType),
    s("mc_dataset_id", IntegerType),
    s("mc_output_mod_config_id", IntegerType)))

  /** OUTPUT_MODULE_CONFIGS (`ocf`) — schemas.py:348-363. */
  val dbsOutConfigs: StructType = StructType(Seq(
    s("oc_output_mod_config_id", IntegerType),
    s("oc_app_exec_id", IntegerType),
    s("oc_release_version_id", IntegerType),
    s("oc_parameter_set_hash_id", IntegerType),
    s("oc_output_module_label", StringType), s("oc_global_tag", StringType),
    s("oc_scenario", StringType), s("oc_creation_date", IntegerType),
    s("oc_create_by", StringType)))

  /** RELEASE_VERSIONS (`rvf`) — schemas.py:366-374. */
  val dbsRelVersions: StructType = StructType(Seq(
    s("r_release_version_id", IntegerType),
    s("r_release_version", StringType)))

  // ---- `_dm` uppercase variants (schemas.py:142,216,292) ----
  // Same tables dumped by a different pipeline: column names are the
  // prefix-less uppercase originals, and two counters are declared
  // wider (NUMBER(38) read as Long where the prefixed variant used
  // Integer) — preserved via explicit overrides.

  private def dmVariant(base: StructType, prefix: String,
      widen: Map[String, DataType] = Map.empty): StructType =
    StructType(base.fields.map { f =>
      val name = f.name.stripPrefix(prefix).toUpperCase
      StructField(name, widen.getOrElse(name, f.dataType))
    })

  /** DATASETS uppercase — schemas.py:142-181. */
  val dbsDatasetsDm: StructType = dmVariant(dbsDatasets, "d_")

  /** BLOCKS uppercase — schemas.py:216-245 (FILE_COUNT widens to Long). */
  val dbsBlocksDm: StructType =
    dmVariant(dbsBlocks, "b_", Map("FILE_COUNT" -> LongType))

  /** FILES uppercase — schemas.py:292-333 (BRANCH_HASH_ID widens to
    * Long). */
  val dbsFilesDm: StructType =
    dmVariant(dbsFiles, "f_", Map("BRANCH_HASH_ID" -> LongType))

  // ---- PhEDEx / JobMonitoring / ASO dumps (schemas.py:389-664) ----

  /** PhEDEx block-replica dump — schemas.py:405-437. */
  val phedex: StructType = StructType(Seq(
    s("now_sec", DoubleType), s("dataset_name", StringType),
    s("dataset_id", IntegerType), s("dataset_is_open", StringType),
    s("dataset_time_create", DoubleType),
    s("dataset_time_update", DoubleType),
    s("block_name", StringType), s("block_id", IntegerType),
    s("block_files", IntegerType), s("block_bytes", LongType),
    s("block_is_open", StringType), s("block_time_create", DoubleType),
    s("block_time_update", DoubleType), s("node_name", StringType),
    s("node_id", IntegerType), s("br_is_active", StringType),
    s("br_src_files", LongType), s("br_src_bytes", LongType),
    s("br_dest_files", LongType), s("br_dest_bytes", LongType),
    s("br_node_files", LongType), s("br_node_bytes", LongType),
    s("br_xfer_files", LongType), s("br_xfer_bytes", LongType),
    s("br_is_custodial", StringType), s("br_user_group_id", IntegerType),
    s("replica_time_create", DoubleType),
    s("replica_time_updater", DoubleType)))

  /** PhEDEx summary rows — schemas.py:389-402. Note: the reference's
    * declared schema is stale — degraded/phedex.py:84 WRITES six
    * columns (groupid appended) and mergePhedex.go:112-121 READS six;
    * [[phedexSummaryGid]] below is the schema the files actually
    * carry, this one is kept for schema-registry parity. */
  val phedexSummary: StructType = StructType(Seq(
    s("date", LongType), s("site", StringType), s("dataset", StringType),
    s("size", LongType), s("replica_date", LongType)))

  /** PhEDEx summary rows as actually written/read by the snapshot +
    * merge pipeline (degraded/phedex.py:84, mergePhedex.go:112-121):
    * the five [[phedexSummary]] columns plus the owning group id
    * (null in CSV → -1 downstream). */
  val phedexSummaryGid: StructType = StructType(
    phedexSummary.fields.toSeq :+ s("groupid", LongType))

  /** DBS+PhEDEx aggregation output — schemas.py:440-458. */
  val dbsPhedex: StructType = StructType(Seq(
    s("dataset_name", StringType), s("evts", IntegerType),
    s("size", DoubleType), s("date", DoubleType),
    s("dataset_access_type", StringType),
    s("acquisition_era_name", StringType),
    s("r_release_version", StringType), s("node_name", StringType),
    s("pbr_size", DoubleType), s("dataset_is_open", StringType),
    s("max_replica_time", DoubleType)))

  /** CMSSW popularity avro record (all-string envelope except the
    * date longs) — schemas.py:461-509. */
  val cmssw: StructType = StructType(
    (Seq("UNIQUE_ID", "FILE_LFN", "FILE_SIZE", "CLIENT_DOMAIN",
      "CLIENT_HOST", "SERVER_DOMAIN", "SERVER_HOST", "SITE_NAME",
      "READ_BYTES_AT_CLOSE", "READ_BYTES", "READ_SINGLE_BYTES",
      "READ_SINGLE_OPERATIONS", "READ_SINGLE_AVERAGE",
      "READ_SINGLE_SIGMA", "READ_VECTOR_BYTES", "READ_VECTOR_OPERATIONS",
      "READ_VECTOR_AVERAGE", "READ_VECTOR_SIGMA",
      "READ_VECTOR_COUNT_AVERAGE", "READ_VECTOR_COUNT_SIGMA", "USER_DN",
      "APP_INFO", "START_TIME", "END_TIME").map(n => s(n, StringType)) ++
      Seq(s("START_DATE", LongType), s("END_DATE", LongType),
        s("INSERT_DATE", LongType))))

  /** JobMonitoring record (all-string except the three timestamp
    * longs) — schemas.py:512-561. */
  val jobMonitoring: StructType = StructType(
    (Seq("JobId", "FileName", "IsParentFile", "ProtocolUsed",
      "SuccessFlag", "FileType", "LumiRanges", "StrippedFiles",
      "BlockId", "StrippedBlocks", "BlockName", "InputCollection",
      "Application", "ApplicationVersion", "Type", "GenericType",
      "NewGenericType", "NewType", "SubmissionTool", "InputSE",
      "TargetCE", "SiteName", "SchedulerName", "JobMonitorId",
      "TaskJobId", "SchedulerJobIdV2", "TaskId", "TaskMonitorId",
      "NEventsPerJob", "NTaskSteps", "JobExecExitCode")
      .map(n => s(n, StringType)) ++
      Seq(s("JobExecExitTimeStamp", LongType),
        s("StartedRunningTimeStamp", LongType),
        s("FinishedTimeStamp", LongType)) ++
      Seq("WrapWC", "WrapCPU", "ExeCPU", "NCores", "NEvProc", "NEvReq",
        "WNHostName", "JobType", "UserId", "GridName")
        .map(n => s(n, StringType))))

  /** ASO (CRAB transfer db) dump — schemas.py:564-631. */
  val aso: StructType = StructType(Seq(
    s("tm_id", StringType), s("tm_username", StringType),
    s("tm_taskname", StringType), s("tm_destination", StringType),
    s("tm_destination_lfn", StringType), s("tm_source", StringType),
    s("tm_source_lfn", StringType), s("tm_filesize", DoubleType),
    s("tm_publish", DoubleType), s("tm_jobid", IntegerType),
    s("tm_job_retry_count", IntegerType), s("tm_type", StringType),
    s("tm_aso_worker", StringType),
    s("tm_transfer_retry_count", IntegerType),
    s("tm_transfer_max_retry_count", IntegerType),
    s("tm_publication_retry_count", IntegerType),
    s("tm_publication_max_retry_count", IntegerType),
    s("tm_rest_host", StringType), s("tm_rest_uri", StringType),
    s("tm_transfer_state", IntegerType),
    s("tm_publication_state", IntegerType),
    s("tm_transfer_failure_reason", StringType),
    s("tm_publication_failure_reason", StringType),
    s("tm_fts_id", StringType), s("tm_fts_instance", StringType),
    s("tm_last_update", DoubleType), s("tm_start_time", DoubleType),
    s("tm_end_time", DoubleType)))

  // ---- AAA / EOS empty-relation envelopes (schemas.py:669-709) ----
  // The reference materializes these when a day's directory is absent
  // (spark_utils.py:481-671): the empty DataFrame must still carry the
  // downstream-joined columns.

  /** AAA (XRootD) empty-relation schema — schemas.py:669-680. */
  val aaaEmpty: StructType = StructType(Seq(
    s("src_experiment_site", StringType), s("user_dn", StringType),
    s("file_lfn", StringType)))

  /** EOS report empty-relation schema — schemas.py:682-709. */
  val eosEmpty: StructType = StructType(Seq(
    s("file_lfn", StringType), s("user_dn", StringType),
    s("session", StringType), s("host", StringType),
    s("application", StringType), s("csize", IntegerType),
    s("rb", IntegerType), s("rb_max", IntegerType), s("wb", IntegerType),
    s("rt", IntegerType), s("wt", IntegerType), s("timestamp", LongType),
    s("day", LongType)))

  /** AAA (XRootD) pruned data envelope — the fields the jobs actually
    * read out of the gled record (spark_utils.py:481-514 example
    * record; consumers select data.* then these). */
  val aaaEnvelope: StructType = StructType(Seq(
    s("data", StructType(Seq(
      s("activity", StringType), s("app_info", StringType),
      s("client_domain", StringType), s("client_host", StringType),
      s("end_time", LongType), s("file_lfn", StringType),
      s("file_size", LongType), s("is_transfer", BooleanType),
      s("operation_time", LongType), s("read_bytes", LongType),
      s("read_bytes_at_close", LongType), s("remote_access", BooleanType),
      s("server_domain", StringType), s("server_host", StringType),
      s("start_time", LongType), s("throughput", DoubleType),
      s("unique_id", StringType), s("user_dn", StringType),
      s("vo", StringType)))),
    s("metadata", StructType(Seq(s("timestamp", LongType))))))

  /** EOS report envelope, post-2020 shape: data is ONE string of
    * `k=v&k=v` pairs plus metadata (spark_utils.py:550-671) —
    * field extraction happens with str_to_map, not the JSON reader. */
  val eosEnvelope: StructType = StructType(Seq(
    s("data", StringType),
    s("metadata", StructType(Seq(s("timestamp", LongType))))))

  // ---- Rucio Avro dumps (FIXTURES.md §B.2) ----

  /** REPLICAS — rucio_datasets_stats.py:238-260. RSE_ID is RAW(16)
    * binary, normalized with lower(hex()). */
  val rucioReplicas: StructType = StructType(Seq(
    s("NAME", StringType), s("RSE_ID", BinaryType), s("BYTES", LongType),
    s("STATE", StringType), s("SCOPE", StringType),
    s("ACCESSED_AT", LongType), s("CREATED_AT", LongType),
    s("LOCK_CNT", LongType)))

  /** DIDS — rucio_ds_summary.py:102-126. */
  val rucioDids: StructType = StructType(Seq(
    s("NAME", StringType), s("SCOPE", StringType), s("DID_TYPE", StringType),
    s("HIDDEN", IntegerType), s("DELETED_AT", LongType),
    s("BYTES", LongType), s("ACCESSED_AT", LongType),
    s("CREATED_AT", LongType)))

  /** CONTENTS — rucio_datasets_stats.py:171-194. D→F = block→file,
    * C→D = container(dataset)→block. */
  val rucioContents: StructType = StructType(Seq(
    s("SCOPE", StringType), s("NAME", StringType),
    s("CHILD_NAME", StringType), s("DID_TYPE", StringType),
    s("CHILD_TYPE", StringType)))

  /** RSES — rucio_datasets_stats.py:150-169. */
  val rucioRses: StructType = StructType(Seq(
    s("ID", BinaryType), s("RSE", StringType), s("RSE_TYPE", StringType),
    s("DELETED_AT", LongType)))

  /** DATASET_LOCKS — rucio_datasets_monitoring.py:239-255. */
  val rucioDatasetLocks: StructType = StructType(Seq(
    s("SCOPE", StringType), s("NAME", StringType), s("RSE_ID", BinaryType),
    s("RULE_ID", BinaryType), s("ACCOUNT", StringType),
    s("STATE", StringType)))

  // ---- MONIT JSON envelopes (FIXTURES.md §B.3) ----

  /** Pruned HTCondor metric envelope — the "7 of ~200 fields" pattern
    * (hpc_running_cores_and_corehr.py:57-76 ∪ condor_crab_unique_users
    * .py:28-50 ∪ degraded/condor_cpu_efficiency.py:122-149). */
  val condorEnvelope: StructType = StructType(Seq(
    s("data", StructType(Seq(
      s("GlobalJobId", StringType), s("RecordTime", LongType),
      s("Status", StringType), s("Site", StringType),
      s("Tier", StringType), s("Type", StringType),
      s("JobFailed", LongType), s("WallClockHr", DoubleType),
      s("CpuTimeHr", DoubleType), s("CoreHr", DoubleType),
      s("CpuEff", DoubleType), s("RequestCpus", DoubleType),
      s("CRAB_UserHN", StringType), s("CRAB_Workflow", StringType),
      s("CRAB_DataBlock", StringType),
      s("CMSPrimaryPrimaryDataset", StringType),
      s("Workflow", StringType), s("WMAgent_RequestName", StringType),
      s("ScheddName", StringType), s("WMAgent_JobID", StringType),
      s("MachineAttrCMSSubSiteName0", StringType),
      s("ExitCode", LongType), s("CpuEffOutlier", IntegerType),
      s("DESIRED_CMSDataset", StringType),
      s("ChirpCMSSWReadBytes", LongType)))),
    s("metadata", StructType(Seq(s("timestamp", LongType))))))

  /** HS06 pruned condor envelope — the per-app "own minimal schema"
    * pattern (condor_hs06coreHrPlot.py:29-50). */
  val condorHs06Envelope: StructType = StructType(Seq(
    s("data", StructType(Seq(
      s("GlobalJobId", StringType), s("RecordTime", LongType),
      s("HS06CpuTimeHr", DoubleType), s("Status", StringType),
      s("Site", StringType), s("Type", StringType))))))

  /** Pruned condor envelope for the HPC-at-CMS report — the columns
    * hpc_running_cores_and_corehr.py's channel router actually reads
    * (Site + GLIDEIN entry + remote host drive the 13-branch routing;
    * same per-app minimal-schema pattern as [[condorHs06Envelope]]). */
  val condorHpcEnvelope: StructType = StructType(Seq(
    s("data", StructType(Seq(
      s("GlobalJobId", StringType), s("RecordTime", LongType),
      s("Status", StringType), s("JobFailed", LongType),
      s("Site", StringType), s("GLIDEIN_Entry_Name", StringType),
      s("RemoteHost", StringType), s("RequestCpus", DoubleType)))),
    s("metadata", StructType(Seq(s("timestamp", LongType))))))

  /** Pruned condor envelope for the DBS×Condor merge — the columns
    * degraded/dbs_condor.py:106-180 actually touches (per-app minimal
    * schema, same pattern as [[condorHs06Envelope]]). */
  val condorDbsEnvelope: StructType = StructType(Seq(
    s("data", StructType(Seq(
      s("GlobalJobId", StringType), s("RecordTime", LongType),
      s("KEvents", DoubleType), s("CMSSWKLumis", DoubleType),
      s("CMSSWWallHrs", DoubleType), s("Campaign", StringType),
      s("Workflow", StringType), s("CpuEff", DoubleType),
      s("CoreHr", DoubleType), s("QueueHrs", DoubleType),
      s("CRAB_UserHN", StringType), s("Type", StringType),
      s("ExitCode", LongType), s("TaskType", StringType),
      s("DESIRED_CMSDataset", StringType)))),
    s("metadata", StructType(Seq(s("timestamp", LongType))))))

  /** CMSSW popularity envelope — schema_cmspop_json, schemas.py:712-770. */
  val cmsswPopEnvelope: StructType = StructType(Seq(
    s("data", StructType(Seq(
      s("app_info", StringType), s("site_name", StringType),
      s("file_lfn", StringType), s("file_size", LongType),
      s("read_bytes", LongType), s("read_bytes_at_close", LongType),
      s("start_time", LongType), s("end_time", LongType),
      s("user_dn", StringType), s("fallback", BooleanType),
      s("unique_id", StringType), s("client_host", StringType),
      s("client_domain", StringType), s("server_host", StringType),
      s("server_domain", StringType)))),
    s("metadata", StructType(Seq(s("timestamp", LongType))))))

  /** FTS transfer envelope — spark_utils.py:698-724, aso_stats.py:64-71. */
  val ftsEnvelope: StructType = StructType(Seq(
    s("data", StructType(Seq(
      s("job_id", StringType), s("src_url", StringType),
      s("f_size", LongType), s("t_final_transfer_state", StringType),
      s("tr_timestamp_start", LongType),
      s("tr_timestamp_complete", LongType),
      s("job_metadata", StructType(Seq(s("issuer", StringType)))))))))

  /** WMArchive FWJR with nested steps — wmarchive.py:108-144,
    * degraded/stepchain_cpu_eff.py:66-106. The nested array is what the
    * reference walks with per-record Python; here `explode` does it. */
  val wmarchiveEnvelope: StructType = StructType(Seq(
    s("wmaid", StringType), s("wmats", LongType), s("task", StringType),
    s("meta_data", StructType(Seq(
      s("host", StringType), s("ts", LongType), s("jobstate", StringType),
      s("jobtype", StringType), s("fwjr_id", StringType)))),
    s("steps", ArrayType(StructType(Seq(
      s("name", StringType), s("site", StringType),
      s("performance", StructType(Seq(
        s("cpu", StructType(Seq(
          s("NumberOfStreams", DoubleType),
          s("NumberOfThreads", DoubleType),
          s("TotalJobCPU", DoubleType), s("TotalJobTime", DoubleType),
          s("TotalEventCPU", DoubleType),
          s("EventThroughput", DoubleType)))))))))))))
}
