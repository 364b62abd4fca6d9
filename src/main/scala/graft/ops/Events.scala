package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators Spark has no native form of: as-of
  * (point-in-time) join and gap-based sessionization.
  *
  * Both are built the scale-first way — ONE exchange on the entity key
  * and a sort within partitions (SortMergeJoin-shaped), never a range
  * join: the naive `l JOIN r ON key AND r.ts <= l.ts` + argmax plan is
  * O(|l|·|r|) per key and explodes on hot keys, while the tagged-union
  * window form below is O((|l|+|r|) log) per key and spills via
  * WindowExec when a key is huge. Timestamps are compared as the raw
  * epoch-nanos Longs the parquet scan produces — integer compares, no
  * timezone or float ambiguity, bit-identical across engines.
  */
object Events {

  /** As-of join: for every left row, the LATEST right row of the same
    * `key` with `right.ts <= left.ts` (or nulls if none) — the
    * point-in-time lookup of market-data and feature-store pipelines
    * (DuckDB/kdb call it ASOF JOIN; Spark has no operator for it).
    *
    * Shape: tag both inputs, union, ONE exchange on `key`, per-key sort
    * on (ts, side) — right rows sort BEFORE left rows at equal ts so
    * same-instant state is visible — then `last(right_payload,
    * ignoreNulls)` over an unbounded-preceding row frame carries the
    * most recent right payload onto each left row. No join node at
    * all, so no pair explosion on hot keys, and AQE never has to
    * rescue a skewed range join.
    *
    * `rightCols` are the right-side payload columns to carry; they
    * surface on the output prefixed with `asof_`. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String]): DataFrame =
    asOfJoin(left, right, Seq(keyCol), tsCol, rightCols)

  /** Composite-key variant — feature-store lookups usually key on
    * (entity, feature-group) or similar tuples; same single-exchange
    * window shape, partitioned on all key columns.
    *
    * Semantics match SQL join equality: right rows with a NULL key
    * component never match (they are dropped), and left rows with a
    * NULL key get null asof columns — the window partitioning would
    * otherwise group NULLs together and silently "match" them, which
    * no ASOF JOIN does. Several right rows at one (key, ts) instant
    * resolve deterministically to the LARGEST payload tuple (the
    * window order includes the payload struct as the final tie-break,
    * so re-runs hash-match regardless of partitioning). */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightCols: Seq[String]): DataFrame = {
    val payload = struct(rightCols.map(col): _*)
    val l = left.withColumn("__side", lit(1))
    val r = right
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        (keyCols.map(col) :+ col(tsCol) :+ payload.as("__r")): _*)
      .withColumn("__side", lit(0))
    // allowMissingColumns null-fills: left gets __r = null, right gets
    // null for every left payload column (dropped by the final select)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val outCols = left.columns.map(col) ++
      rightCols.map(c => col("__asof").getField(c).as(s"asof_$c"))
    carried.select(outCols: _*)
  }

  /** Interval (range-containment) join, binned: every event row joined
    * to every interval with `start <= ts <= end` — the "which
    * maintenance windows / incidents / campaigns does this event fall
    * in" join. Spark's only native plan for `ON ts BETWEEN start AND
    * end` is BroadcastNestedLoopJoin (fine while intervals fit in one
    * broadcast) falling back to a cartesian — O(|events|·|intervals|)
    * at scale. This operator makes it an EQUI-join: explode each
    * interval over the fixed-width time bins it covers, key each event
    * by its single bin, hash-join on the bin, re-check the bounds.
    *
    * An event's bin is unique, so each (event, interval) pair meets in
    * exactly one bin — no post-join dedup. Cost is |intervals| ×
    * (span/binWidth) replicated interval rows (choose `binWidth` near
    * the median interval span: a handful of replicas per interval) and
    * one shuffle of each side keyed by bin. Skewed bins (event
    * hot-spots) are ordinary AQE skew-join territory, not a cartesian.
    * Intervals and events survive with all their columns; bounds are
    * compared as the integer tick values the caller supplies.
    *
    * Pathological-interval guard: an interval spanning the whole time
    * axis (an open-ended maintenance window, a sentinel end date)
    * would replicate over EVERY bin — span/binWidth rows for one
    * input row, easily corpus-sized. Intervals covering more than
    * `maxBinsPerInterval` bins therefore take a different route:
    * they are joined by a broadcast range join (BroadcastNestedLoop)
    * instead of bin replication. Whales are rare by the same
    * assumption that makes the bin trick work (binWidth ≈ median
    * span), so the broadcast side stays tiny; each interval takes
    * exactly one of the two routes, so the union is disjoint and
    * needs no dedup.
    *
    * The whale route is guarded, not assumed: the whale side is
    * COUNTED up front (one job over the small intervals side) and the
    * call fails loudly when it exceeds `maxWhales` — the symptom of a
    * `binWidth` chosen far below the median span, where "rare whales"
    * inverts into "most intervals broadcast" and the
    * BroadcastNestedLoop side would OOM the driver with no warning.
    * The paid count is recycled: when it is zero (the common case)
    * the nested-loop branch is dropped from the plan entirely. */
  def rangeJoin(events: DataFrame, tsCol: String, intervals: DataFrame,
      startCol: String, endCol: String, binWidth: Long,
      maxBinsPerInterval: Long = 4096L,
      maxWhales: Long = 100000L): DataFrame = {
    require(binWidth > 0, "rangeJoin: binWidth must be positive")
    require(maxBinsPerInterval >= 1,
      s"rangeJoin: maxBinsPerInterval=$maxBinsPerInterval")
    require(maxWhales >= 0, s"rangeJoin: maxWhales=$maxWhales")
    // `div` = exact Long integer division ("/" on longs is DOUBLE);
    // ticks are assumed non-negative (epoch micros/nanos), where
    // truncating div == floor div
    val nBins = expr(s"`$endCol` div ${binWidth}L") -
      expr(s"`$startCol` div ${binWidth}L") + lit(1L)
    val short = intervals.filter(nBins <= maxBinsPerInterval)
    val whales = intervals.filter(nBins > maxBinsPerInterval)
    val binned = short.withColumn("__bin", explode(sequence(
      expr(s"`$startCol` div ${binWidth}L"),
      expr(s"`$endCol` div ${binWidth}L"))))
    val keyed = events.withColumn("__bin",
      expr(s"`$tsCol` div ${binWidth}L"))
    val binRoute = keyed.join(binned,
        keyed("__bin") === binned("__bin") &&
          keyed(tsCol) >= binned(startCol) && keyed(tsCol) <= binned(endCol))
      .drop("__bin")
    val whaleCount = whales.count()
    require(whaleCount <= maxWhales,
      s"rangeJoin: $whaleCount intervals span more than " +
        s"$maxBinsPerInterval bins (limit $maxWhales) — binWidth=" +
        s"$binWidth is far below the median interval span, so the " +
        "broadcast range-join fallback would not be broadcast-safe; " +
        "raise binWidth toward the median span (a handful of bins per " +
        "interval) or raise maxBinsPerInterval/maxWhales deliberately")
    if (whaleCount == 0L) binRoute
    else {
      val whaleRoute = events.join(broadcast(whales),
        events(tsCol) >= whales(startCol) &&
          events(tsCol) <= whales(endCol))
      binRoute.unionByName(whaleRoute)
    }
  }

  /** Interval-overlap join: pairs of intervals from `a` and `b` that
    * share a key AND overlap in time, with the exact integer overlap
    * length (`min(ends) - max(starts)`, half-open convention —
    * touching intervals overlap 0 and are dropped). The
    * machine-downtime × job-runs shape: "how much of each transfer
    * window did each outage eat".
    *
    * Shape: ONE equi-join on the key with the overlap test as a join
    * residual — correct whenever per-key interval counts are bounded
    * (the per-entity case). For UNkeyed or hot-key interval sets, bin
    * both sides with [[rangeJoin]]'s replication trick instead; this
    * operator deliberately stays the cheap keyed form. Column names
    * are caller-supplied; output keeps the key, both id columns, both
    * bounds pairs, and `overlap_len`. */
  def overlapJoin(a: DataFrame, b: DataFrame, keyCol: String,
      aId: String, aStart: String, aEnd: String,
      bId: String, bStart: String, bEnd: String): DataFrame = {
    val names = Seq(keyCol, aId, aStart, aEnd, bId, bStart, bEnd)
    require(names.distinct.size == names.size,
      s"overlapJoin: key/a/b column names must be distinct, got $names " +
        "(rename one side before joining)")
    // prune to the named columns so stray same-named payload columns
    // on the two sides can't make the join output ambiguous
    a.select(col(keyCol), col(aId), col(aStart), col(aEnd))
      .join(b.select(col(keyCol), col(bId), col(bStart), col(bEnd)),
        Seq(keyCol))
      .withColumn("overlap_len",
        least(col(aEnd), col(bEnd)) - greatest(col(aStart), col(bStart)))
      .filter(col("overlap_len") > 0)
      .select(col(keyCol), col(aId), col(bId), col(aStart), col(aEnd),
        col(bStart), col(bEnd), col("overlap_len"))
  }

  /** The labeling stage of [[sessionize]] on its own: every input row
    * back, plus a per-key `session` number — for consumers that need
    * the session MEMBERS (ordered paths, per-session sequences), not
    * just the aggregate. Same one-exchange window shape. */
  def sessionLabels(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gap: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__new",
        when(col(tsCol) - lag(col(tsCol), 1).over(byKey) <= gap, 0L)
          .otherwise(1L))
      .withColumn("session",
        sum(col("__new")).over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Gap-based sessionization: consecutive events of one `key` belong
    * to the same session while the gap to the previous event is ≤
    * `gap` (in the units of `tsCol` — the operator is unit-agnostic);
    * a larger gap starts a new session. Returns one row per session
    * with bounds, event count, duration in seconds
    * (`ticksPerSecond` converts), and an exact-decimal value sum. The
    * batch twin of `Streams.sessionize` (mapGroupsWithState) — same
    * semantics, pure windows: flag session starts with `lag`, number
    * sessions with a running sum of flags, then one hash aggregation.
    * One exchange on `key`, WindowExec sorts/spills per key; `tieCol`
    * makes the within-key order total so re-runs hash-match. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gap: Long, tieCol: String,
      ticksPerSecond: Long = 1000000L): DataFrame = {
    val numbered = sessionLabels(
      events.select(col(keyCol), col(tsCol), col(tieCol), col(valueCol)),
      keyCol, tsCol, tieCol, gap)
    numbered
      .groupBy(col(keyCol), col("session"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        Aggregates.decSum(col(valueCol)).as("sum_value"))
      // `div` = exact Long integer division ("/" would go through
      // DOUBLE and lose exactness past 2^53 ticks)
      .withColumn("duration_s",
        expr(s"(end_ts - start_ts) div $ticksPerSecond"))
  }

  /** Ordered funnel: per entity, the earliest time of stage 1, the
    * earliest stage-2 event STRICTLY AFTER that, the earliest stage-3
    * event strictly after THAT, and so on — the product-analytics
    * "view → click → purchase" conversion question, which is not a
    * join problem: the naive stage-i ⋈ stage-i+1 self-join explodes
    * quadratically on entities with many events.
    *
    * Shape: ONE exchange on the entity key, one per-key sort, then a
    * cascade of running conditional minima — `min(ts where stage_i and
    * ts > running_min_{i-1})` over an unbounded-preceding row frame —
    * and one hash aggregation. Every window in the cascade shares the
    * same partitioning and ordering, so Catalyst plans a single
    * WindowExec over a single sort (O((Σ|events|) log) per key,
    * spillable). All comparisons are on the caller's integer tick
    * column. Entities that never reach stage 1 report all-null stage
    * times with `n_stages` 0 — they stay visible (the funnel's
    * denominator).
    *
    * Output: (key, t1..tn as `t<i>`, n_stages). */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      stageCol: String, stages: Seq[String], tieCol: String)
      : DataFrame = {
    require(stages.nonEmpty, "funnel: need at least one stage")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // stageTs(i) = this row's ts if it extends the funnel at stage i
    // (right stage label, strictly after the running stage-(i-1) min)
    val withRunning = stages.zipWithIndex
      .foldLeft(events) { case (acc, (stage, i)) =>
        val cond =
          if (i == 0) col(stageCol) === stage
          else col(stageCol) === stage &&
            col(tsCol) > col(s"__run${i - 1}")
        val flagged = acc.withColumn(s"__hit$i",
          when(cond, col(tsCol)))
        // the LAST stage's running min is never referenced — skip its
        // window so the plan stays one node per needed stage
        if (i == stages.size - 1) flagged
        else flagged.withColumn(s"__run$i",
          min(col(s"__hit$i")).over(w))
      }
    val stageMins = stages.indices.map(i =>
      min(col(s"__hit$i")).as(s"t${i + 1}"))
    val agged = withRunning.groupBy(col(keyCol))
      .agg(stageMins.head, stageMins.tail: _*)
    agged.withColumn("n_stages",
      stages.indices.map(i =>
        when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** Burst debounce: within each `keyCols` stream, events group into
    * bursts (gap to the previous event ≤ `gap` ticks) and only the
    * FIRST event of each burst survives — double-click suppression,
    * retry collapsing, sensor-chatter removal. The survivor is
    * exactly the row whose gap-flag fires (distance to its
    * predecessor exceeds `gap`, or no predecessor), so the whole
    * operator is one `lag` window + a filter: ONE exchange on the
    * key, one per-key sort, no burst numbering pass. `tieCol` totals
    * the order at equal ticks. */
  def debounce(events: DataFrame, keyCols: Seq[String], tsCol: String,
      gap: Long, tieCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__first",
        when(col(tsCol) - lag(col(tsCol), 1).over(byKey) <= gap, 0L)
          .otherwise(1L))
      .filter(col("__first") === 1L)
      .drop("__first")
  }

  /** Rolling distinct-actives (WAU-style): for every day with any
    * activity, how many distinct entities were active in the trailing
    * `window` days. Spark (like most engines) cannot evaluate COUNT
    * DISTINCT over a RANGE window, and the self-join form
    * (`a.day BETWEEN d.day-6 AND d.day`) is a range join — quadratic
    * territory on dense days. The scalable EXACT form is the same
    * bin-explosion trick as [[rangeJoin]]: each distinct (entity, day)
    * activity contributes to exactly `window` trailing window-days, so
    * explode those target days and the range condition becomes an
    * EQUI-join; a distinct hash agg then counts each entity once per
    * window-day. Replication factor is exactly `window` (7 here) —
    * fixed, known, and skew-free by construction. */
  def rollingActive(events: DataFrame, keyCol: String, dayCol: String,
      window: Int): DataFrame = {
    val act = events.select(col(keyCol), col(dayCol)).distinct()
    val days = act.select(col(dayCol).as("day")).distinct()
    act
      .select(col(keyCol),
        explode(sequence(col(dayCol),
          col(dayCol) + (window - 1))).as("day"))
      .join(days, Seq("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col(keyCol)).as("n_active"))
  }

  /** Cumulative reach: for every day with activity, how many distinct
    * entities have EVER been active up to that day (plus that day's
    * first-timers). The naive forms — COUNT DISTINCT over an unbounded
    * window, or a `a.day <= d.day` self-join — are single-partition or
    * quadratic; the scalable exact decomposition rides on first-touch:
    * min(day) per entity (one hash agg over the full stream), count
    * first-touches per day (second tiny agg), running-sum over the
    * DISTINCT-day table (window on a value-domain-sized frame, the
    * q101 prefix pattern). The 100 TB stream is touched exactly once.
    * Oracle = DuckDB's genuine cumulative-distinct self-join. */
  def cumulativeReach(events: DataFrame, keyCol: String,
      dayCol: String): DataFrame = {
    val firstTouch = events.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
    val days = events.select(col(dayCol).as("day")).distinct()
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(firstTouch, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("cum_users", sum(col("new_users")).over(w))
  }

  /** Flow (transition) bigram mining: for each consecutive event pair
    * of the same entity within `gap` ticks, count the
    * (from_type → to_type) transition and how many distinct entities
    * made it — the "common paths" question over a clickstream/job
    * stream. One lag window (one exchange on the entity key), then one
    * hash aggregation on the pair; the gap bound keeps cross-session
    * transitions out, matching [[sessionize]]'s session boundary. */
  def flowBigrams(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, gap: Long, tieCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("__from", lag(col(typeCol), 1).over(byKey))
      .withColumn("__dt", col(tsCol) - lag(col(tsCol), 1).over(byKey))
      .filter(col("__from").isNotNull && col("__dt") <= gap)
      .groupBy(col("__from").as("from_type"),
        col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col(keyCol)).as("n_users"))
  }

  /** Weekly retention cohorts: entities are cohorted by the week of
    * their first event; for every (cohort week, weeks-since-cohort)
    * cell, how many distinct entities were active — the standard
    * retention triangle. Weeks are exact integer arithmetic on the
    * tick column (`ts div ticksPerWeek`, epoch-anchored), never
    * calendar math, so both engines bucket identically.
    *
    * Shape: first-event week per entity (one hash agg), distinct
    * (entity, week) activity (one hash agg), a join on the entity key
    * (both sides hash-partitioned on it), and the final cell count.
    * The entity dimension is the big side at scale — the join keys on
    * it, no broadcast assumption. */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String,
      ticksPerWeek: Long): DataFrame = {
    val weeks = events.select(col(keyCol),
      expr(s"`$tsCol` div ${ticksPerWeek}L").as("__week"))
    val cohort = weeks.groupBy(col(keyCol))
      .agg(min(col("__week")).as("cohort_week"))
    val active = weeks.distinct()
    active.join(cohort, Seq(keyCol))
      .groupBy(col("cohort_week"),
        (col("__week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-key interval-union coverage (sweep line): total length of the
    * UNION of [start, end) intervals — overlapping sessions counted
    * once, the "real online time" question naive duration sums
    * overstate. Classic boundary decomposition: +1/−1 deltas, one sort
    * per key on (t, delta desc) — openings before closings at a tie,
    * so touching intervals stay continuous — running active count,
    * and each boundary-to-next gap counts iff something is open. Tied
    * boundaries produce zero-width gaps, so intra-tie permutation
    * cannot change the sum (engine-exact despite the sort tie). ONE
    * exchange + ONE sort per key, integer arithmetic end to end. */
  def intervalCoverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val b = df.select(col(keyCol), col(startCol).as("t"),
        lit(1L).as("d"))
      .unionAll(df.select(col(keyCol), col(endCol).as("t"),
        lit(-1L).as("d")))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("t"), col("d").desc)
    val swept = b
      .withColumn("running",
        sum(col("d")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("gap", lead(col("t"), 1).over(w) - col("t"))
    swept.groupBy(col(keyCol))
      .agg(sum(when(col("running") > 0, col("gap")).otherwise(0L))
        .as("covered"),
        sum(when(col("d") === 1, 1L).otherwise(0L)).as("n_intervals"))
  }
}
