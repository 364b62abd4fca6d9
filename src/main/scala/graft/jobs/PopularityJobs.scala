package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.NameAlgebra

/** The full data_aggregation popularity pipeline
  * (degraded/data_aggregation.py): four access streams — CMSSW
  * popularity, AAA (XRootD), EOS, JobMonitoring — each joined to the
  * file→(block, site, dataset) dimension table, aggregated to a COMMON
  * output schema, and unioned into one popularity relation
  * (data_aggregation.py:525-527).
  *
  * All of the reference's Python UDFs in this job run as Catalyst here:
  * parse_dn/dn2uuid via NameAlgebra + the native `dn_uuid` expression,
  * clean_site_name/tier_from_site_name as split/slice chains,
  * stream4app as a when-chain. At scale: the dimension table is built
  * once and reused by all four streams (the reference rebuilds temp
  * views per stream); each stream is scan → broadcast-or-shuffle join
  * on file name → one hash aggregation; the union is plan-level (no
  * materialization between streams).
  */
object PopularityJobs {

  /** `stream4app` (data_aggregation.py:400-407): NULL/empty → cmssw,
    * anything containing "crab" → crab, else pass through. */
  def stream4App(app: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    when(app.isNull || app === "", "cmssw")
      .when(app.contains("crab"), "crab")
      .otherwise(app)

  /** file→(block, site, dataset) dimension:
    * files ⋈ blocks ⋈ datasets ⋈ PhEDEx block replicas, site cleaned
    * to ≤3 tokens, DISTINCT (create_file_block_site_table,
    * data_aggregation.py:335-371). One build, shared by all streams. */
  def fileBlockSite(files: DataFrame, blocks: DataFrame,
      datasets: DataFrame, phedex: DataFrame): DataFrame =
    files
      .join(blocks, files("f_block_id") === blocks("b_block_id"))
      .join(datasets, files("f_dataset_id") === datasets("d_dataset_id"))
      .join(phedex, blocks("b_block_name") === phedex("block_name"))
      .select(
        col("f_logical_file_name").as("file_name"),
        col("b_block_name").as("block_name"),
        NameAlgebra.cleanSiteName(col("node_name")).as("site_name"),
        col("d_dataset").as("dataset_name"))
      .distinct()

  /** The common normalized stream shape every per-stream SELECT maps
    * into: (dn, dataset_name, site_name, app, uid, stream, cpu, wc).
    * `dn`/`site` are dataframe-qualified Columns — several streams
    * carry a SITE_NAME that would resolve ambiguously against the
    * dimension table's site_name under case-insensitive resolution. */
  private def normalized(joined: DataFrame,
      dn: org.apache.spark.sql.Column, site: org.apache.spark.sql.Column,
      app: org.apache.spark.sql.Column, stream: String,
      cpu: org.apache.spark.sql.Column,
      wc: org.apache.spark.sql.Column): DataFrame =
    joined.select(
      NameAlgebra.parseDn(dn).as("dn"),
      col("dataset_name"),
      site.as("site_name"),
      app.as("app"),
      NameAlgebra.dnToUuid(dn).as("uid"),
      lit(stream).as("stream"),
      cpu.as("cpu"), wc.as("wc"))

  /** CMSSW popularity stream (run_agg_cmssw,
    * data_aggregation.py:253-294): join on FILE_LFN, site from the
    * record, app parsed out of APP_INFO. */
  def normalizeCmssw(cmssw: DataFrame, fbs: DataFrame): DataFrame =
    normalized(
      cmssw.join(fbs, cmssw("FILE_LFN") === fbs("file_name")),
      cmssw("USER_DN"), cmssw("SITE_NAME"),
      stream4App(cmssw("APP_INFO")), "cmssw", lit(0.0), lit(0.0))

  /** AAA (XRootD) stream (run_agg_aaa, data_aggregation.py:179-222):
    * join on file_lfn, site from the dimension table. */
  def normalizeAaa(aaa: DataFrame, fbs: DataFrame): DataFrame =
    normalized(
      aaa.join(fbs, aaa("file_lfn") === fbs("file_name")),
      aaa("user_dn"), fbs("site_name"), lit("xrootd"), "aaa",
      lit(0.0), lit(0.0))

  /** EOS stream (run_agg_eos, data_aggregation.py:106-148): join on
    * file_lfn, app from the EOS application field. */
  def normalizeEos(eos: DataFrame, fbs: DataFrame): DataFrame =
    normalized(
      eos.join(fbs, eos("file_lfn") === fbs("file_name")),
      eos("user_dn"), fbs("site_name"),
      coalesce(eos("application"), lit("eos")), "eos",
      lit(0.0), lit(0.0))

  /** JobMonitoring (CRAB) stream (run_agg_jm,
    * data_aggregation.py:33-73): join on FileName, site from the
    * record, wall/cpu seconds carried into the aggregate. The JM dump
    * stores numerics as strings — cast here, once. */
  def normalizeJm(jm: DataFrame, fbs: DataFrame): DataFrame =
    normalized(
      jm.join(fbs, jm("FileName") === fbs("file_name")),
      jm("GridName"), jm("SiteName"), stream4App(jm("SubmissionTool")),
      // try_cast: the JM dump stores numerics as strings and under
      // ANSI a dirty value ("n/a") in a plain cast kills the job
      "crab", expr("try_cast(WrapCPU AS DOUBLE)"),
      expr("try_cast(WrapWC AS DOUBLE)"))

  /** JobMonitoring site summary (jm_stats.py:32-62): the pandas
    * per-site groupby-sum report — per (SiteName, aggregate column:
    * JobExecExitCode / FileType / Type) totals of cpu, exit-code
    * counts and wall clock. The reference loops sites in pandas and
    * renders pies; the aggregation itself is one hash aggregate here,
    * with a total tie-break order so the report is deterministic. */
  def jmStats(summary: DataFrame, aggCol: String): DataFrame =
    summary
      .groupBy(col("SiteName"), col(aggCol))
      .agg(
        sum(col("tot_cpu")).as("tot_cpu"),
        sum(col("ecode_count")).as("ecode_count"),
        sum(col("tot_wc")).as("tot_wc"))
      .orderBy(col("SiteName"), col(aggCol))

  /** Per-stream aggregate to the shared output schema
    * (data_aggregation.py:81-89): group by the full user/dataset/site
    * key, count accesses, derive the site tier, sum cpu/wall time.
    * (`distinct_users` counts rows within the dn-keyed group exactly
    * as the reference's `count(dn)` does.) */
  def aggStream(norm: DataFrame, timestamp: Long): DataFrame =
    norm
      .groupBy(col("dn"), col("dataset_name"), col("site_name"),
        col("app"), col("uid"), col("stream"),
        NameAlgebra.siteTier(col("site_name")).as("site_tier"))
      .agg(
        count(col("dataset_name")).as("nacc"),
        count(col("dn")).as("distinct_users"),
        sum(col("cpu")).as("cpu_time"),
        sum(col("wc")).as("wc_time"))
      .withColumn("timestamp", lit(timestamp))

  /** The full 4-stream union, ordered by access count
    * (data_aggregation.py:519-528). */
  def popularity(cmssw: DataFrame, aaa: DataFrame, eos: DataFrame,
      jm: DataFrame, fbs: DataFrame, timestamp: Long): DataFrame =
    aggStream(normalizeCmssw(cmssw, fbs), timestamp)
      .unionByName(aggStream(normalizeAaa(aaa, fbs), timestamp))
      .unionByName(aggStream(normalizeEos(eos, fbs), timestamp))
      .unionByName(aggStream(normalizeJm(jm, fbs), timestamp))
      .orderBy(desc("nacc"), col("dn"), col("stream"))
}
