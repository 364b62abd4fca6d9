package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental (partial) aggregation: maintain a per-key aggregate over
  * an append-only stream of snapshots WITHOUT re-scanning history — the
  * materialized-view maintenance pattern every daily 100 TB pipeline
  * ends up needing (re-aggregating a year of history to add one day is
  * the difference between a 10-minute and a 10-hour job).
  *
  * The contract is algebraic: `partial` produces per-key (count,
  * DECIMAL sum, min, max) partials; `merge` combines ANY number of
  * partial snapshots by summing counts/sums and re-min/max-ing — all
  * four are associative and commutative, so merge(partial(A),
  * partial(B)) == partial(A ∪ B) EXACTLY (decimal sums, not IEEE
  * doubles, so not just approximately — the q85 oracle proves it
  * against a from-scratch aggregation). `present` converts the
  * internal decimal to the public DOUBLE face.
  *
  * Reference analogue: the daily-snapshot jobs that re-read whole date
  * ranges every run (e.g. rucio daily dumps); this is the Spark-native
  * alternative — persist partials per day, merge at read time.
  */
object Incremental {

  private val dec = DecimalType(18, 4)
  private val wide = DecimalType(38, 4)

  /** One snapshot's per-key partial aggregate. Internal decimal sum —
    * keep it decimal in storage so later merges stay exact. */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String)
      : DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        // widen to the max precision ONCE so the partial schema is a
        // fixed point of merge (sum over decimal grows precision until
        // the 38 cap; starting at 38,4 keeps every merge level
        // identical and re-storable)
        sum(col(valueCol).cast(dec)).cast(wide).as("sum_dec"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge partial snapshots into one per-key partial (same schema, so
    * the result can itself be stored and merged again). */
  def merge(parts: Seq[DataFrame], keys: Seq[String]): DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_dec")).cast(wide).as("sum_dec"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Public face of a partial: decimal → DOUBLE, stable column names. */
  def present(partial: DataFrame, keys: Seq[String]): DataFrame =
    partial.select(
      keys.map(col) ++ Seq(
        col("n").as("n_rows"),
        col("sum_dec").cast("double").as("sum_value"),
        col("min_v").as("min_value"),
        col("max_v").as("max_value")): _*)

  /** SCD type-2 history from a pile of dated snapshots: collapse
    * per-key consecutive-equal runs into validity intervals
    * `[valid_from, valid_to)` (`valid_to` null = still current). The
    * N-snapshot generalization of [[snapshotDiff]] — what a lake stores
    * so point-in-time lookups (`ops/Events.asOfJoin`) don't scan N
    * full dumps.
    *
    * Shape: ONE exchange on the key feeds both windows (change-mark
    * lag and valid_to lead — same partitioning and order, Spark reuses
    * the sort). Change test = null-safe inequality fold vs the lagged
    * compare columns; first row per key always opens an interval. */
  def scdHistory(snaps: DataFrame, keys: Seq[String],
      compareCols: Seq[String], snapCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(snapCol))
    val changed = compareCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    snaps
      .withColumn("__open",
        lag(col(snapCol), 1).over(w).isNull || changed)
      .filter(col("__open"))
      .withColumn("valid_from", col(snapCol))
      .withColumn("valid_to", lead(col(snapCol), 1).over(w))
      .select((keys ++ compareCols).map(col) :+
        col("valid_from") :+ col("valid_to"): _*)
  }

  /** Apply a CDC delta to a snapshot (MERGE-INTO semantics without a
    * table format): rows in `delta` marked `op = 'D'` delete their
    * key, any other op upserts the delta's values; snapshot rows with
    * no delta entry carry through. The INVERSE of [[snapshotDiff]] —
    * `applyChanges(old, diff)` reproduces the new dump, so an
    * incremental consumer stores dumps as (one full + daily deltas)
    * and reconstructs any day.
    *
    * Shape: ONE full-outer join on the key; the op routing is a
    * projection. Exactly the plan a storage-format MERGE would run,
    * minus the format. The join carries a MERGE hint (r15): a
    * full-outer equi-join can never broadcast, so the only choice is
    * SMJ vs SHJ — the interleaved A/B (benchab_shj6_r15.json) has SMJ
    * 12% faster for q119 both runs, and at scale a full-outer SHJ
    * must hash-map an entire side per partition (snapshot and delta
    * are BOTH unbounded here), which is the guide §3.1 OOM case. */
  def applyChanges(snapshot: DataFrame, delta: DataFrame,
      keys: Seq[String], valueCols: Seq[String], opCol: String)
      : DataFrame = {
    val snap = snapshot
      .select((keys ++ valueCols).map(col): _*)
      .toDF(keys ++ valueCols.map("old_" + _): _*)
    val dlt = delta
      .select((keys :+ opCol).map(col) ++ valueCols.map(col): _*)
      .toDF((keys :+ opCol) ++ valueCols.map("new_" + _): _*)
    snap.hint("merge").join(dlt, keys, "full_outer")
      .filter(col(opCol).isNull || col(opCol) =!= "D")
      .select(keys.map(col) ++ valueCols.map(c =>
        when(col(opCol).isNotNull, col("new_" + c))
          .otherwise(col("old_" + c)).as(c)): _*)
  }

  /** CDC ordering audit: per key, count ADJACENT version pairs whose
    * event timestamps run backwards (version increases, ts decreases)
    * — the out-of-order-delivery detector you run before trusting
    * "latest version wins" merges ([[applyChanges]], `toScdStore`):
    * inversions mean version order and time order disagree, so a
    * ts-based consumer and a version-based consumer would converge to
    * different states. Returns only keys with ≥1 inversion, with the
    * key's change count, inversion count, and the worst backwards jump
    * (exact integer tick difference).
    *
    * Shape: one window (lag over per-key version order) + one
    * aggregation — one shuffle on the key; adjacent-pair inversions
    * (not all-pairs Kendall) keep the cost linear in changes per key. */
  def orderAudit(changes: DataFrame, keyCol: String, versionCol: String,
      tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(versionCol))
    changes
      .withColumn("__back",
        when(col(tsCol) < lag(col(tsCol), 1).over(w),
          lag(col(tsCol), 1).over(w) - col(tsCol)).otherwise(lit(0L)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_changes"),
        Aggregates.countIf(col("__back") > 0).as("n_inversions"),
        max(col("__back")).as("max_backstep"))
      .filter(col("n_inversions") > 0)
  }

  /** Delta between two dated snapshots of the same keyed table: which
    * rows were `added`, `removed`, or `changed` between yesterday's and
    * today's dump (unchanged rows are dropped — the delta is the
    * output). The reference's world is exactly this: daily full dumps
    * (rucio/dbs/phedex snapshots) where consumers want the day's churn
    * without re-processing the 100 TB that didn't move. See
    * [[scdHistory]] for the N-snapshot interval form.
    *
    * Shape: ONE full-outer sort-merge join on the key — both sides
    * shuffle once on `keys`, the compare columns ride along, and the
    * changed test is a null-safe inequality fold evaluated inside the
    * join's projection (no second pass, no window). At scale this is
    * the minimal plan for a snapshot diff; if both dumps are written
    * bucketed by the key (see `BucketingSpec`), even that exchange
    * disappears.
    *
    * Output: keys (coalesced across sides), `status`
    * (added|removed|changed), and `old_<c>` / `new_<c>` for every
    * compare column.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val pa = a.select((keys ++ compareCols).map(col): _*)
      .toDF(keys ++ compareCols.map("old_" + _): _*)
      .withColumn("in_a", lit(true))
    val pb = b.select((keys ++ compareCols).map(col): _*)
      .toDF(keys ++ compareCols.map("new_" + _): _*)
      .withColumn("in_b", lit(true))
    val joined = pa.join(pb, keys, "full_outer")
    val changed = compareCols
      .map(c => !(col("old_" + c) <=> col("new_" + c)))
      .reduce(_ || _)
    joined
      .withColumn("status",
        when(col("in_a").isNull, lit("added"))
          .when(col("in_b").isNull, lit("removed"))
          .when(changed, lit("changed")))
      .filter(col("status").isNotNull)
      .select((keys.map(col) :+ col("status")) ++
        compareCols.flatMap(c =>
          Seq(col("old_" + c), col("new_" + c))): _*)
  }
}
