package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time bucketing and dense-calendar scaffolding (SURVEY.md §2.6).
  *
  * The reference emulates time windows arithmetically —
  * `from_unixtime(ts - ts % 720)` 12-minute bins
  * (hpc_running_cores_and_corehr.py:206-208) and builds dense calendars
  * with `sequence(min,max,interval 1 day)` + explode + left join + fillna(0)
  * (hpc_running_cores_and_corehr.py:148-168).
  */
object Calendar {

  /** Tumbling bin over an epoch-seconds Long column; returns the bin start
    * in epoch seconds. Integer arithmetic only (safe for 64-bit epochs). */
  def tumblingBinSeconds(tsSec: Column, widthSec: Long): Column =
    (tsSec - pmod(tsSec, lit(widthSec))).cast("long")

  /** Tumbling bin over an epoch-nanoseconds Long column (the testdata
    * events table); returns the bin start in epoch seconds. */
  def tumblingBinNanos(tsNanos: Column, widthSec: Long): Column = {
    val widthNanos = widthSec * 1000000000L
    ((tsNanos - pmod(tsNanos, lit(widthNanos))) / lit(1000000000L))
      .cast("long")
  }

  /** Partition-gap report: per key, which integer time bins between
    * that key's first and last observed bin are MISSING — the "did the
    * feed skip snapshots" audit behind the reference's day_delta /
    * candidateDirs fallback logic, generalized to any bin width.
    * Returns first/last bin, expected/present/missing counts, and the
    * longest consecutive run of missing bins.
    *
    * Shape: one distinct-(key,bin) aggregation, then ONE window (lead
    * over the per-key bin order) over the distinct frame — the window
    * input is bounded by #present bins, never by raw event volume, so
    * the audit costs one shuffle however hot the stream is. The gap
    * arithmetic is pure integers (`next - bin - 1`). */
  def missingBins(df: DataFrame, keyCol: String, binCol: Column)
      : DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__bin"))
    df.select(col(keyCol), binCol.cast("long").as("__bin"))
      .distinct()
      .withColumn("__gap",
        coalesce(lead(col("__bin"), 1).over(w) - col("__bin") - 1,
          lit(0L)))
      .groupBy(col(keyCol))
      .agg(
        min(col("__bin")).as("first_bin"),
        max(col("__bin")).as("last_bin"),
        (max(col("__bin")) - min(col("__bin")) + 1).as("n_expected"),
        count(lit(1)).as("n_present"),
        (max(col("__bin")) - min(col("__bin")) + 1 - count(lit(1)))
          .as("n_missing"),
        max(col("__gap")).as("longest_gap"))
  }

  /** Dense day scaffold: one row per day between the min and max of
    * `dateCol` in `df`, left-joined with `perDay` (keyed by `dayKey`) and
    * zero-filled on `fillCols`. Day is emitted as a 'yyyy-MM-dd' string for
    * engine-neutral comparison. The bounds aggregate collapses to a single
    * row, so the generated calendar is a broadcastable one-row explode —
    * no shuffle added beyond the per-day aggregation itself. */
  def scaffold(df: DataFrame, dateCol: Column, perDay: DataFrame,
      dayKey: String, fillCols: Seq[String]): DataFrame = {
    val bounds = df.agg(min(to_date(dateCol)).as("lo"),
      max(to_date(dateCol)).as("hi"))
    val days = bounds
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as(dayKey))
    days.join(perDay, Seq(dayKey), "left").na.fill(0, fillCols)
  }

  /** Per-key forward fill over a dense integer-day grid: each key gets
    * its own min..max day scaffold (per-key sequence explode — bounded
    * by the key's span, never a global calendar join), missing days
    * take the most recent present value (ignore-nulls `last` over a
    * growing frame). The first day of every key is present by
    * construction (it IS that key's min), so the filled column is
    * never null. One join on (key, day) + one window sort per key. */
  def forwardFill(df: DataFrame, keyCol: String, dayCol: String,
      valCol: String): DataFrame = {
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("_lo"), max(col(dayCol)).as("_hi"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("_lo"), col("_hi"))).as(dayCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(df, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol),
        last(col(valCol), ignoreNulls = true).over(w)
          .as(s"${valCol}_filled"),
        col(valCol).isNotNull.as("was_present"))
  }
}
