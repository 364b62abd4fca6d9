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
