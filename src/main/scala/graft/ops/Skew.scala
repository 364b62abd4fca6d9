package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Checkpoints.BarrierOps

/** Skew mitigation by key salting (SURVEY.md §4; the reference splits
  * plans by value instead — degraded/dbs_condor.py:133-144 — which AQE
  * mostly obsoletes, but deliberate salting remains the tool when one
  * key dominates a shuffle).
  *
  * Two-stage aggregation: stage 1 groups by (key, salt) spreading a hot
  * key over `buckets` reducers; stage 2 merges the partials by key.
  * Results are EXACTLY those of the direct groupBy for decomposable
  * aggregates (sum/count/min/max) — verified against the plain-SQL
  * oracle in q56. */
object Skew {

  /** Random-ish but DETERMINISTIC salt derived from row content, so
    * re-runs and retries agg identically (monotonically_increasing_id
    * or rand() would break retry semantics mid-shuffle). */
  def salt(row: Column, buckets: Int): Column =
    pmod(hash(row), lit(buckets))

  /** Salted sum/count per key: exact same result as
    * `df.groupBy(key).agg(sum, count)`, resilient to one dominant key. */
  def saltedSumCount(df: DataFrame, keyCol: String, valCol: String,
      saltSource: Column, buckets: Int = 16): DataFrame =
    df
      .withColumn("_salt", salt(saltSource, buckets))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as(s"sum_$valCol"),
        sum(col("_pcnt")).as("n"))

  /** Salted equi-join: big side gets a content-derived salt, small side
    * is replicated across all `buckets` salt values, and the join key
    * becomes (key, salt) — one hot key's probe rows now land on
    * `buckets` reducers instead of one. Result is EXACTLY the plain
    * inner join (every big row meets every matching small row exactly
    * once, in the bucket its salt chose) at the cost of a `buckets`×
    * blow-up of the SMALL side only — which is why this is the shape
    * for skewed-fact × modest-dim joins where the dim exceeds the
    * broadcast threshold but a single reducer can't hold the hot key.
    * AQE's skew-join split handles the sort-merge case adaptively; the
    * explicit salt remains the tool when the skew is known ahead of
    * time or AQE is off. Verified exactly equal to the unsalted join
    * by q207's plain-SQL oracle. */
  def saltedJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, saltSource: Column, buckets: Int = 16)
      : DataFrame = {
    val b = big.withColumn("_salt", salt(saltSource, buckets))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    b.join(s, b(bigKey) === s(smallKey) && b("_salt") === s("_salt"))
      .drop("_salt")
  }

  /** Heavy-hitter diagnostic: the top-N keys by row count with each
    * key's exact share of total rows — the "which key would melt a
    * shuffle" question you ask BEFORE deciding to salt. One hash
    * aggregation per key, a one-row total broadcast back (never a
    * driver-side count() action), then TakeOrderedAndProject for the
    * cut — the full key distribution is never sorted or collected.
    * The rank window runs AFTER the limit, over topN rows only.
    * Ties at the cut break by key ascending, so the result is a total
    * order and stable across engines. */
  def heavyHitters(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    // g feeds both the total and the share projection — the lazy
    // localCheckpoint materializes the key-count aggregation once
    // (Catalyst would otherwise inline the full scan+agg subtree into
    // both consumers; bm25TopK precedent). Trade-off at cluster scale:
    // localCheckpoint truncates lineage into executor-local storage,
    // so losing an executor mid-job makes its partitions unrecoverable
    // and fails the job (it restarts cleanly — the checkpoint holds no
    // cross-job state). For long multi-hour production runs where that
    // restart is expensive, swap in persist(MEMORY_AND_DISK_2) or a
    // reliable checkpoint; for this diagnostic (seconds over an
    // aggregate already reduced to |keys| rows) plan-reuse wins.
    val g = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .barrier()
    val tot = g.agg(sum(col("cnt")).as("_total"))
    val top = g.crossJoin(broadcast(tot))
      .select(col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("_total").cast("double"))
          .as("share"))
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(topN)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col(keyCol)))
        .cast("long"))
  }
}
