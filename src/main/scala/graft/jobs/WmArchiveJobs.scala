package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Aggregates

/** WMArchive FWJR jobs (wmarchive.py:108-154,
  * degraded/stepchain_cpu_eff.py:66-106) — the reference's RDD-of-dicts
  * procedural walks become `explode` over the typed nested schema
  * (`Schemas.wmarchiveEnvelope`), keeping the whole pipeline in
  * Catalyst/codegen instead of per-record Python.
  */
object WmArchiveJobs {

  /** Flatten FWJR records to one row per cmsRun step — the UDTF-like
    * expansion of stepchain_cpu_eff.py:66-106. */
  def stepRows(fwjr: DataFrame): DataFrame =
    fwjr
      .select(col("wmaid"), col("task"), col("meta_data.jobstate"),
        explode(col("steps")).as("step"))
      .filter(col("step.name").startsWith("cmsRun"))
      .select(
        col("wmaid"), col("task"), col("jobstate"),
        col("step.name").as("step_name"),
        col("step.site").as("site"),
        col("step.performance.cpu.TotalJobCPU").as("total_job_cpu"),
        col("step.performance.cpu.TotalJobTime").as("total_job_time"),
        col("step.performance.cpu.NumberOfThreads").as("n_threads"))

  /** Daily agent (host) job counts for the OpenSearch feed
    * (wma_agent_count_to_opensearch.py:130-144): wmaid-deduped records
    * per (day, host) with step stats, site set, and the midday
    * timestamp the dashboard keys on. `first(wmats)` in the reference
    * is non-deterministic under re-partitioning; `min` carries the
    * same midday value (all wmats of a day share day-start) and
    * hash-matches on re-runs.
    *
    * Both `day` and `wmats_midday` derive from the SAME base — UTC
    * epoch arithmetic (`floor(wmats/86400)` days since epoch) — so a
    * non-UTC session timezone cannot group a record into local day D
    * while stamping it with UTC day D±1's midday (the reference
    * pipelines run UTC; this stays correct even when a session
    * doesn't). */
  def agentCounts(fwjr: DataFrame): DataFrame =
    fwjr
      .select(col("wmaid"), col("wmats"), col("meta_data.host"),
        size(col("steps")).as("number_of_steps"),
        get(col("steps"), lit(0)).getField("site").as("site"))
      .dropDuplicates(Seq("wmaid"))
      .withColumn("day", date_format(
        date_add(to_date(lit("1970-01-01")),
          floor(col("wmats") / 86400).cast("int")), "yyyy-MM-dd"))
      .groupBy(col("day"), col("host"))
      .agg(
        count(lit(1)).as("count"),
        avg(col("number_of_steps")).as("avg_steps_count"),
        sort_array(collect_set(col("site"))).as("sites"),
        (min(col("wmats")) - (min(col("wmats")) % 86400) + 43200)
          .as("wmats_midday"))

  /** Per-step CPU efficiency: TotalJobCPU / (TotalJobTime · threads),
    * the stepchain formula (stepchain_cpu_eff.py:88-99), aggregated per
    * (task, site) after wmaid dedup against re-delivered records. */
  def stepchainCpuEff(fwjr: DataFrame): DataFrame =
    stepRows(fwjr)
      .filter(col("jobstate") === "success"
        && col("total_job_time") > 0 && col("n_threads") > 0)
      .dropDuplicates(Seq("wmaid", "step_name"))
      .groupBy(col("task"), col("site"))
      .agg(
        Aggregates.ratioOfSums(col("total_job_cpu"),
          col("total_job_time") * col("n_threads")).as("cpu_eff_pct"),
        count(lit(1)).as("n_steps"))
}
