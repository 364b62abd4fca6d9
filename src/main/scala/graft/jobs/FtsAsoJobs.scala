package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Aggregates

/** FTS/ASO transfer jobs (aso_stats.py, fts_aso.py): the multi-key
  * left-outer join of transfer records to ASO bookkeeping and the
  * latency statistics family. */
object FtsAsoJobs {

  /** Filename from a URL/path — `x.split('/')[-1]`
    * (aso_stats.py:69-78) as pure Catalyst. */
  def fileName(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(split(url, "/"), -1)

  /** Transfer latency stats per (state, issuer): fts ⟕ aso on the
    * compound (filename, job_id) key (aso_stats.py:83), then
    * min/max/avg over the transfer durations (aso_stats.py:85-91).
    * `fts` needs (job_id, src_url, t_final_transfer_state,
    * tr_timestamp_start, tr_timestamp_complete, issuer);
    * `aso` needs (filename, job_id, aso_user). */
  def transferStats(fts: DataFrame, aso: DataFrame): DataFrame = {
    val f = fts.withColumn("filename", fileName(col("src_url")))
    val joined = f.join(aso, Seq("filename", "job_id"), "left_outer")
    joined
      .withColumn("duration_s",
        (col("tr_timestamp_complete") - col("tr_timestamp_start")) / 1000.0)
      .groupBy(col("t_final_transfer_state").as("state"),
        coalesce(col("aso_user"), lit("UNKNOWN")).as("user"))
      .agg(
        count(lit(1)).as("n_transfers"),
        min(col("duration_s")).as("min_duration_s"),
        max(col("duration_s")).as("max_duration_s"),
        // unrounded, per the engine-wide determinism contract: round()
        // on a decimal half-tie breaks differently across engines
        avg(col("duration_s")).as("avg_duration_s"),
        Aggregates.countIf(col("aso_user").isNotNull).as("n_matched"))
  }
}
