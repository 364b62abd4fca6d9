package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.TextOps
import graft.ops.Events
import graft.core.Checkpoints.BarrierOps

/** Event-stream batch operators over the `events` table: as-of join
  * and gap sessionization (`ops/Events`). The oracle for q75 is
  * DuckDB's NATIVE `ASOF JOIN` — our composed tagged-union window
  * operator is checked against a first-class engine implementation of
  * the same semantics, not against a re-statement of our own plan.
  * events.ts is epoch-NANOS Long on the Spark side (nanosAsLong)
  * while DuckDB's TIMESTAMP truncates parquet nanos to MICROSECONDS —
  * so both queries run on `ts div 1000` vs `epoch_us(ts)`: the same
  * integers in both engines, exact compares, no float anywhere.
  * (user_id, µs) is unique in the corpus, so the truncation does not
  * create order ties.
  */
object EventQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** DuckDB CTE: per-event epoch day + the props numeric metric —
    * shared by the trend/correlation/regression family (q105, q121,
    * q145), whose Spark twin is [[eventsDayK]]. */
  private val dkDayK =
    """e AS (SELECT user_id,
      |             epoch_us(ts) // 86400000000 AS day,
      |             CAST(regexp_extract(props, '[0-9]+') AS BIGINT)
      |               AS k
      |      FROM events)""".stripMargin

  /** Spark twin of [[dkDayK]]: (user_id, day, k) from the events
    * table (ts is epoch-nanos Long under nanosAsLong). */
  private def eventsDayK(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").select(col("user_id"),
      expr("ts div 86400000000000").as("day"),
      regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("k"))

  /** DuckDB CTE: per-(key, epoch day) event counts — shared by the
    * daily-volume family (q125 dispersion, q137 rolling median, q139
    * CUSUM), whose Spark twin is [[dailyCounts]]. */
  private def dkDailyCounts(keyCol: String): String =
    s"""dcnt AS (SELECT $keyCol,
       |               epoch_us(ts) // 86400000000 AS day,
       |               count(*) AS c
       |        FROM events GROUP BY 1, 2)""".stripMargin

  /** Spark twin of [[dkDailyCounts]]: per-(key, day) counts. */
  private def dailyCounts(s: SparkSession, d: String,
      keyCol: String): DataFrame =
    t(s, d, "events")
      .groupBy(col(keyCol), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("c"))

  val defs: Seq[QueryDef] = Seq(

    // As-of join: each purchase picks up the latest signup of the same
    // user at-or-before it (point-in-time state lookup).
    QueryDef(
      "q75_asof_join",
      Some("""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                          event_type, value
                   FROM events),
        p AS (SELECT event_id, user_id, ts_us FROM e
              WHERE event_type = 'purchase'),
        s AS (SELECT user_id, ts_us, value FROM e
              WHERE event_type = 'signup')
        SELECT p.event_id, p.user_id, p.ts_us,
               s.ts_us AS asof_ts_us, s.value AS asof_value
        FROM p ASOF LEFT JOIN s
          ON p.user_id = s.user_id AND p.ts_us >= s.ts_us"""),
      (s, d) => {
        val e = t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("ts_us"), col("event_type"),
            col("value"))
        Events.asOfJoin(
          e.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts_us")),
          e.filter(col("event_type") === "signup"),
          "user_id", "ts_us", Seq("ts_us", "value"))
      }),

    // Gap sessionization: 30-minute-gap sessions per user, one row per
    // session with bounds, exact duration, and decimal value sum.
    QueryDef(
      "q76_sessionize",
      Some("""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
                   FROM events),
        f AS (SELECT user_id, event_id, ts_us, value,
                     CASE WHEN ts_us - lag(ts_us) OVER
                            (PARTITION BY user_id
                             ORDER BY ts_us, event_id) <= 1800000000
                          THEN 0 ELSE 1 END AS nf
              FROM e),
        n AS (SELECT user_id, ts_us, value,
                     CAST(sum(nf) OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session
              FROM f)
        SELECT user_id, session,
               count(*) AS n_events,
               min(ts_us) AS start_ts, max(ts_us) AS end_ts,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_value,
               (max(ts_us) - min(ts_us)) // 1000000 AS duration_s
        FROM n GROUP BY 1, 2"""),
      (s, d) =>
        Events.sessionize(
          t(s, d, "events").select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"), col("value")),
          "user_id", "ts_us", "value",
          gap = 1800000000L, tieCol = "event_id")),

    // Rolling 24h window per user: a RANGE frame over event time (the
    // physical operator is a RangeFrame bound-follower, not q19's
    // RowFrame) — each event sees the count and exact-decimal sum of
    // its user's events in [ts - 24h, ts]. Frame bounds are integer
    // microseconds, so both engines agree on inclusion exactly.
    QueryDef(
      "q79_rolling_window",
      Some("""
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
                   FROM events)
        SELECT event_id, user_id, ts_us,
               CAST(count(*) OVER w AS BIGINT) AS n_24h,
               CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                 AS sum_24h
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)"""),
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-86400000000L, 0L)
        t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("ts_us"), col("value"))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            count(lit(1)).over(w).as("n_24h"),
            sum(col("value").cast("decimal(18,4)")).over(w)
              .cast("double").as("sum_24h"))
      }),

    // Interval (range-containment) join, binned: the 5 highest-value
    // purchases define ±1h incident windows; every event falling in a
    // window aggregates to it. Spark's native plan for a BETWEEN join
    // is a nested-loop/cartesian — `Events.rangeJoin` turns it into an
    // EQUI-join on 10-minute time bins (each event meets each interval
    // in exactly one bin, so no post-join dedup). The oracle is
    // DuckDB's genuine inequality join over the same windows.
    QueryDef(
      "q80_range_join",
      Some("""
        WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, event_type,
                          value
                   FROM events),
        w AS (SELECT event_id AS win_id,
                     ts_us - 3600000000 AS start_us,
                     ts_us + 3600000000 AS end_us
              FROM e WHERE event_type = 'purchase'
              ORDER BY value DESC, event_id LIMIT 5)
        SELECT w.win_id, w.start_us, w.end_us,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_value
        FROM w JOIN e ON e.ts_us BETWEEN w.start_us AND w.end_us
        GROUP BY 1, 2, 3"""),
      (s, d) => {
        val e = t(s, d, "events")
          .select(col("event_id"), expr("ts div 1000").as("ts_us"),
            col("event_type"), col("value"))
        val wins = e.filter(col("event_type") === "purchase")
          .orderBy(col("value").desc, col("event_id")).limit(5)
          .select(col("event_id").as("win_id"),
            (col("ts_us") - 3600000000L).as("start_us"),
            (col("ts_us") + 3600000000L).as("end_us"))
        Events.rangeJoin(e.select(col("ts_us"), col("value")), "ts_us",
            wins, "start_us", "end_us", binWidth = 600000000L)
          .groupBy(col("win_id"), col("start_us"), col("end_us"))
          .agg(count(lit(1)).as("n_events"),
            graft.ops.Aggregates.decSum(col("value")).as("sum_value"))
      }),

    // Incremental aggregation exactness proof: per-type partials built
    // from two disjoint time halves, merged with `Incremental.merge` —
    // the oracle aggregates the WHOLE table from scratch in one pass.
    // merge(partial(A), partial(B)) == partial(A ∪ B) exactly because
    // every partial is algebraic (count/decimal-sum/min/max) — the
    // materialized-view maintenance contract a daily 100 TB pipeline
    // rests on (append a day's partial, never re-scan history).
    QueryDef(
      "q85_incremental_merge",
      Some("""
        WITH e AS (SELECT event_type, value FROM events)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_value,
               min(value) AS min_value, max(value) AS max_value
        FROM e GROUP BY 1"""),
      (s, d) => {
        val e = t(s, d, "events")
          .select(col("event_type"), col("value"),
            expr("ts div 1000").as("ts_us"))
        val cut = 1705276800000000L // 2024-01-15T00:00:00Z in epoch µs
        val halves = Seq(
          e.filter(col("ts_us") < cut), e.filter(col("ts_us") >= cut))
          .map(h => graft.ops.Incremental
            .partial(h, Seq("event_type"), "value"))
        graft.ops.Incremental.present(
          graft.ops.Incremental.merge(halves, Seq("event_type")),
          Seq("event_type"))
      }),

    // Ordered funnel: per user, earliest view, earliest click strictly
    // after it, earliest purchase strictly after that — one exchange,
    // one sort, a cascade of running conditional minima (never a
    // stage-to-stage self-join, which explodes on hot users). Users
    // who never reach stage 1 stay visible with n_stages = 0.
    QueryDef(
      "q92_funnel",
      Some("""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                          event_type
                   FROM events),
        r1 AS (SELECT user_id, event_id, ts_us, event_type,
                 min(CASE WHEN event_type = 'view' THEN ts_us END)
                   OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run0
               FROM e),
        r2 AS (SELECT *,
                 min(CASE WHEN event_type = 'click' AND ts_us > run0
                       THEN ts_us END)
                   OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run1
               FROM r1),
        g AS (SELECT user_id,
                min(CASE WHEN event_type = 'view' THEN ts_us END)
                  AS t1,
                min(CASE WHEN event_type = 'click' AND ts_us > run0
                      THEN ts_us END) AS t2,
                min(CASE WHEN event_type = 'purchase' AND ts_us > run1
                      THEN ts_us END) AS t3
              FROM r2 GROUP BY 1)
        SELECT user_id, t1, t2, t3,
               (CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END)
                 AS n_stages
        FROM g"""),
      (s, d) =>
        Events.funnel(
          t(s, d, "events").select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"), col("event_type")),
          "user_id", "ts_us", "event_type",
          Seq("view", "click", "purchase"), tieCol = "event_id")),

    // Weekly retention cohorts: users cohorted by first-event week
    // (exact integer epoch weeks); distinct active users per
    // (cohort week, offset) cell — the retention triangle.
    QueryDef(
      "q93_retention_cohorts",
      Some("""
        WITH e AS (SELECT user_id,
                          epoch_us(ts) // 604800000000 AS wk
                   FROM events),
        c AS (SELECT user_id, min(wk) AS cohort_week
              FROM e GROUP BY 1),
        a AS (SELECT DISTINCT user_id, wk FROM e)
        SELECT c.cohort_week, a.wk - c.cohort_week AS week_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM a JOIN c USING (user_id)
        GROUP BY 1, 2"""),
      (s, d) =>
        Events.retentionCohorts(
          t(s, d, "events").select(col("user_id"),
            expr("ts div 1000").as("ts_us")),
          "user_id", "ts_us", ticksPerWeek = 604800000000L)),

    // Burst debounce: per (user, event type), only the first event of
    // each burst survives (gap ≤ 1 day joins a burst) — one lag
    // window + filter, no burst numbering pass. The day-scale gap
    // matches this corpus's event density so the collapse actually
    // fires (~36% of rows drop at sf0.01).
    QueryDef(
      "q94_debounce",
      Some("""
        WITH e AS (SELECT event_id, user_id, event_type,
                          epoch_us(ts) AS ts_us
                   FROM events),
        f AS (SELECT *,
                CASE WHEN ts_us - lag(ts_us) OVER
                       (PARTITION BY user_id, event_type
                        ORDER BY ts_us, event_id) <= 86400000000
                     THEN 0 ELSE 1 END AS nf
              FROM e)
        SELECT event_id, user_id, event_type, ts_us
        FROM f WHERE nf = 1"""),
      (s, d) =>
        Events.debounce(
          t(s, d, "events").select(col("event_id"), col("user_id"),
            col("event_type"), expr("ts div 1000").as("ts_us")),
          Seq("user_id", "event_type"), "ts_us", gap = 86400000000L,
          tieCol = "event_id")),

    // Flow bigram mining: (from_type → to_type) transition counts for
    // consecutive same-user events within a 30-min gap — the "common
    // paths" clickstream question. One lag window + one hash agg.
    QueryDef(
      "q104_flow_bigrams",
      Some("""
        WITH e AS (SELECT user_id, event_id, event_type,
                          epoch_us(ts) AS ts_us
                   FROM events),
        f AS (SELECT user_id, event_type,
                lag(event_type) OVER
                  (PARTITION BY user_id ORDER BY ts_us, event_id)
                  AS from_type,
                ts_us - lag(ts_us) OVER
                  (PARTITION BY user_id ORDER BY ts_us, event_id)
                  AS dt
              FROM e)
        SELECT from_type, event_type AS to_type,
               count(*) AS n_transitions,
               count(DISTINCT user_id) AS n_users
        FROM f WHERE from_type IS NOT NULL AND dt <= 1800000000
        GROUP BY 1, 2"""),
      (s, d) =>
        Events.flowBigrams(
          t(s, d, "events").select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("ts_us"), col("event_type")),
          "user_id", "ts_us", "event_type", gap = 1800000000L,
          tieCol = "event_id")),

    // Per-user engagement trend: exact OLS slope of the props metric
    // over epoch days — DECIMAL sums, one IEEE division at the end
    // (Aggregates.groupTrendSlope). Keys with a single distinct day
    // have slope NULL (zero denominator), never a divide error.
    QueryDef(
      "q105_trend_slope",
      Some(s"""
        WITH $dkDayK,
        g AS (SELECT user_id, count(*) AS n, sum(day) AS sx,
                     sum(k) AS sy, sum(day*k) AS sxy,
                     sum(day*day) AS sxx
              FROM e GROUP BY 1)
        SELECT user_id, n,
               CASE WHEN n*sxx - sx*sx = 0 THEN NULL
                    ELSE CAST(n*sxy - sx*sy AS DOUBLE)
                       / CAST(n*sxx - sx*sx AS DOUBLE) END AS slope
        FROM g"""),
      (s, d) =>
        graft.ops.Aggregates.groupTrendSlope(
          eventsDayK(s, d),
          "user_id", "day", "k")),

    // Rolling 7-day distinct actives (WAU): COUNT DISTINCT over a
    // RANGE window is unsupported in Spark and the BETWEEN self-join
    // is a range join — so each (user, day) activity explodes to its
    // 7 trailing window-days and the range condition becomes an
    // EQUI-join (ops/Events.rollingActive; the q80 bin trick).
    // Oracle = DuckDB's genuine range join.
    QueryDef(
      "q108_rolling_active",
      Some("""
        WITH act AS (SELECT DISTINCT user_id,
                            epoch_us(ts) // 86400000000 AS day
                     FROM events),
        days AS (SELECT DISTINCT day FROM act)
        SELECT d.day, count(DISTINCT a.user_id) AS n_active
        FROM days d JOIN act a ON a.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1"""),
      (s, d) =>
        Events.rollingActive(
          t(s, d, "events").select(col("user_id"),
            expr("ts div 86400000000000").as("day")),
          "user_id", "day", window = 7)),

    // Cumulative reach: ever-active distinct users per day, via the
    // first-touch decomposition (one pass over the stream) — the
    // oracle is the genuinely quadratic cumulative-distinct self-join,
    // so the gate proves the decomposition IS cumulative distinct.
    QueryDef(
      "q115_cumulative_reach",
      Some("""
        WITH act AS (SELECT DISTINCT user_id,
                            epoch_us(ts) // 86400000000 AS day
                     FROM events),
        days AS (SELECT DISTINCT day FROM act),
        c AS (SELECT d.day, count(DISTINCT a.user_id) AS cum_users
              FROM days d JOIN act a ON a.day <= d.day
              GROUP BY 1)
        SELECT day,
               cum_users - coalesce(lag(cum_users) OVER (ORDER BY day),
                 0) AS new_users,
               cum_users
        FROM c"""),
      (s, d) =>
        Events.cumulativeReach(
          t(s, d, "events").select(col("user_id"),
            expr("ts div 86400000000000").as("day")),
          "user_id", "day")),

    // Per-user Pearson correlation between epoch day and the props
    // metric — q105's slope question normalized to [−1, 1]. Five
    // DECIMAL(38,0) sums in one hash agg (order-independent), exact
    // integer numerator/variances, then two correctly-rounded sqrts
    // and one division — bit-identical across engines, unlike the
    // built-in corr() whose double accumulation is partition-order-
    // dependent. Zero variance on either axis → NULL.
    QueryDef(
      "q121_pearson",
      Some(s"""
        WITH $dkDayK,
        g AS (SELECT user_id, count(*) AS n, sum(day) AS sx,
                     sum(k) AS sy, sum(day*k) AS sxy,
                     sum(day*day) AS sxx, sum(k*k) AS syy
              FROM e GROUP BY 1)
        SELECT user_id, n,
               CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0
                    THEN NULL
                    ELSE CAST(n*sxy - sx*sy AS DOUBLE)
                       / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                        * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) END
                 AS pearson_r
        FROM g"""),
      (s, d) =>
        graft.ops.Aggregates.groupPearson(
          eventsDayK(s, d),
          "user_id", "day", "k")),

    // Per-type burstiness: dispersion index (variance-to-mean ratio)
    // of daily event counts — ~1 is Poisson-like traffic, >1 is
    // bursty. Reduced to ONE exact integer fraction
    // (n·Σc² − (Σc)²)/(n·Σc): three DECIMAL sums in one hash agg over
    // the tiny (type, day) count table, one IEEE division at the end.
    QueryDef(
      "q125_dispersion",
      Some(s"""
        WITH ${dkDailyCounts("event_type")},
        g AS (SELECT event_type, count(*) AS n, sum(c) AS s1,
                     sum(c*c) AS s2
              FROM dcnt GROUP BY 1)
        SELECT event_type, n,
               CASE WHEN n*s1 = 0 THEN NULL
                    ELSE CAST(n*s2 - s1*s1 AS DOUBLE)
                       / CAST(n*s1 AS DOUBLE) END AS vmr
        FROM g"""),
      (s, d) =>
        graft.ops.Aggregates.dispersionIndex(
          dailyCounts(s, d, "event_type"), "event_type", "c")),

    // First/last-touch attribution: for every purchase, the first and
    // the most recent preceding touch event (click/view) of the same
    // user — both in ONE pass: ignore-nulls first/last over a
    // (user, ts, event_id)-ordered preceding-rows frame, then filter
    // to conversions. One exchange + one sort for any number of
    // conversions; never a per-purchase self-join or as-of probe.
    QueryDef(
      "q129_attribution",
      Some("""
        WITH e AS (SELECT user_id, event_id, event_type,
                          epoch_us(ts) AS us,
                          CASE WHEN event_type IN ('click', 'view')
                               THEN event_id END AS touch
                   FROM events),
        w AS (SELECT user_id, event_id, event_type, us,
                     first_value(touch IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS first_touch,
                     last_value(touch IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS last_touch
              FROM e)
        SELECT user_id, event_id, us AS purchase_us,
               first_touch, last_touch
        FROM w WHERE event_type = 'purchase'"""),
      (s, d) => {
        val touch = when(col("event_type").isin("click", "view"),
          col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts div 1000").as("us"))
          .withColumn("first_touch", first(touch, ignoreNulls = true)
            .over(w))
          .withColumn("last_touch", last(touch, ignoreNulls = true)
            .over(w))
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            col("us").as("purchase_us"), col("first_touch"),
            col("last_touch"))
      }),

    // Interval-union coverage: each event opens a 30-minute session
    // [ts, ts+30min); per user, the total length of the UNION of those
    // sessions — overlaps counted once (the "real online time" naive
    // duration sums overstate). Sweep line: ±1 boundary deltas, one
    // sort per user, running open count, gap counts iff something is
    // open. Integer µs end to end.
    QueryDef(
      "q131_interval_coverage",
      Some("""
        WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                           epoch_us(ts) + 1800000000 AS e
                    FROM events),
        b AS (SELECT user_id, s AS t, 1 AS d FROM iv
              UNION ALL
              SELECT user_id, e AS t, -1 AS d FROM iv),
        sw AS (SELECT user_id, t, d,
                      sum(d) OVER (PARTITION BY user_id
                        ORDER BY t, d DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS running,
                      lead(t) OVER (PARTITION BY user_id
                        ORDER BY t, d DESC) - t AS gap
               FROM b)
        SELECT user_id,
               CAST(sum(CASE WHEN running > 0 THEN gap ELSE 0 END)
                 AS BIGINT) AS covered,
               count(*) FILTER (WHERE d = 1) AS n_intervals
        FROM sw GROUP BY 1"""),
      (s, d) =>
        Events.intervalCoverage(
          t(s, d, "events").select(col("user_id"),
            expr("ts div 1000").as("s"),
            expr("ts div 1000 + 1800000000").as("e")),
          "user_id", "s", "e")),

    // Time-to-convert: each user's first signup and first purchase AT
    // OR AFTER it, as a latency — the activation-funnel latency table
    // (feed q83's exact quantiles for the report). One per-user hash
    // agg for the signup anchor, one key join back, one conditional
    // min — never a per-user sort or a purchase×signup self-join.
    QueryDef(
      "q136_time_to_convert",
      Some("""
        WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
                   FROM events),
        su AS (SELECT user_id, min(us) AS signup_us FROM e
               WHERE event_type = 'signup' GROUP BY 1),
        pu AS (SELECT e.user_id, su.signup_us, min(e.us) AS purchase_us
               FROM e JOIN su USING (user_id)
               WHERE e.event_type = 'purchase' AND e.us >= su.signup_us
               GROUP BY 1, 2)
        SELECT user_id, signup_us, purchase_us,
               purchase_us - signup_us AS latency_us
        FROM pu"""),
      (s, d) => {
        val e = t(s, d, "events").select(col("user_id"),
          col("event_type"), expr("ts div 1000").as("us"))
        val su = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("signup_us"))
        e.filter(col("event_type") === "purchase")
          .join(su, "user_id")
          .filter(col("us") >= col("signup_us"))
          .groupBy(col("user_id"), col("signup_us"))
          .agg(min(col("us")).as("purchase_us"))
          .select(col("user_id"), col("signup_us"), col("purchase_us"),
            (col("purchase_us") - col("signup_us")).as("latency_us"))
      }),

    // Exact 7-day rolling median of daily activity per user — the
    // outlier-robust twin of q79's rolling sum (one spike day moves a
    // rolling mean for a week; the median shrugs). RANGE frame over
    // the integer day grid, window contents sorted IN-ROW (bounded by
    // the 7-day span, never a per-key global sort); even windows take
    // the exact two-middle average (.5 is representable, no tie risk).
    QueryDef(
      "q137_rolling_median",
      Some(s"""
        WITH ${dkDailyCounts("user_id")},
        w AS (SELECT user_id, day, c,
                     list_sort(list(c) OVER (PARTITION BY user_id
                       ORDER BY day RANGE BETWEEN 6 PRECEDING
                         AND CURRENT ROW)) AS arr
              FROM dcnt)
        SELECT user_id, day, c,
               (CAST(arr[(len(arr)+1)//2] AS DOUBLE)
                + CAST(arr[len(arr)//2+1] AS DOUBLE)) / 2
                 AS roll_median
        FROM w"""),
      (s, d) =>
        graft.ops.Aggregates.rollingMedian(
          dailyCounts(s, d, "user_id"), "user_id", "day", "c",
          span = 7L)),

    // CUSUM changepoint scan: per event type, the day where the
    // cumulative deviation of daily volume from its mean peaks — the
    // classic level-shift detector (a step change makes |CUSUM| grow
    // linearly; noise keeps it near zero). Determinism without float
    // accumulation: CUSUM_d = cum_d − rn·mean where cum is an EXACT
    // Long running sum and mean one decimal-exact division — each row
    // is three IEEE ops on identical operands, never a running double
    // sum. One count agg + one join + one window per type.
    QueryDef(
      "q139_cusum_changepoint",
      Some(s"""
        WITH ${dkDailyCounts("event_type")},
        m AS (SELECT event_type, count(*) AS n,
                     CAST(sum(CAST(c AS DECIMAL(18,4))) AS DOUBLE) AS s
              FROM dcnt GROUP BY 1),
        w AS (SELECT d.event_type, d.day, m.n,
                     sum(c) OVER (PARTITION BY d.event_type
                       ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum,
                     row_number() OVER (PARTITION BY d.event_type
                       ORDER BY day) AS rn,
                     m.s
              FROM dcnt d JOIN m USING (event_type)),
        cu AS (SELECT event_type, day, n,
                      CAST(cum AS DOUBLE) - rn * (s / n) AS cusum
               FROM w),
        r AS (SELECT event_type, day, n, cusum,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY abs(cusum) DESC, day) AS rk
              FROM cu)
        SELECT event_type, CAST(n AS BIGINT) AS n_days,
               day AS cp_day, cusum AS cp_cusum
        FROM r WHERE rk = 1"""),
      (s, d) => {
        val dcnt = dailyCounts(s, d, "event_type")
        val m = dcnt.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            graft.ops.Aggregates.decSum(col("c")).as("s"))
        val wd = Window.partitionBy(col("event_type"))
          .orderBy(col("day"))
        val cu = dcnt.join(m, "event_type")
          .withColumn("cum", sum(col("c"))
            .over(wd.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("rn", row_number().over(wd))
          .select(col("event_type"), col("day"), col("n"),
            (col("cum").cast("double") -
              col("rn") * (col("s") / col("n"))).as("cusum"))
        val rk = Window.partitionBy(col("event_type"))
          .orderBy(abs(col("cusum")).desc, col("day"))
        cu.withColumn("rk", row_number().over(rk))
          .filter(col("rk") === 1)
          .select(col("event_type"), col("n").as("n_days"),
            col("day").as("cp_day"), col("cusum").as("cp_cusum"))
      }),

    // Behavior co-occurrence lift: for every event-type pair, how much
    // more often users do BOTH than independence predicts —
    // lift = n_ab·N / (n_a·n_b) (the market-basket association rule).
    // Per-user distinct types first, so the pair join is bounded by
    // #types² per user, never by event volume; exact integer products,
    // ONE IEEE division; totals arrive as a one-row broadcast.
    QueryDef(
      "q142_cooccurrence_lift",
      Some("""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        n1 AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
        tot AS (SELECT count(DISTINCT user_id) AS nu FROM events),
        pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                      count(*) AS n_ab
               FROM ut a JOIN ut b ON a.user_id = b.user_id
                 AND a.event_type < b.event_type
               GROUP BY 1, 2)
        SELECT pr.type_a, pr.type_b, pr.n_ab,
               na.n AS n_a, nb.n AS n_b,
               CAST(pr.n_ab * tot.nu AS DOUBLE)
                 / CAST(na.n * nb.n AS DOUBLE) AS lift
        FROM pr JOIN n1 na ON na.event_type = pr.type_a
                JOIN n1 nb ON nb.event_type = pr.type_b
                CROSS JOIN tot"""),
      (s, d) => {
        // ut feeds three consumers (singles + both pair-join sides);
        // checkpoint the distinct once (q141/bm25 precedent)
        val ut = t(s, d, "events")
          .select(col("user_id"), col("event_type")).distinct()
          .barrier()
        val n1 = ut.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"))
        // distinct users from the checkpointed ut, not a second full
        // corpus scan — every counted user has ≥1 event type
        val tot = ut.agg(countDistinct(col("user_id")).as("nu"))
        val pr = ut.select(col("user_id"), col("event_type").as("type_a"))
          .join(ut.select(col("user_id"), col("event_type").as("type_b")),
            Seq("user_id"))
          .filter(col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n_ab"))
        pr.join(broadcast(n1.select(col("event_type").as("type_a"),
            col("n").as("n_a"))), "type_a")
          .join(broadcast(n1.select(col("event_type").as("type_b"),
            col("n").as("n_b"))), "type_b")
          .crossJoin(broadcast(tot))
          .select(col("type_a"), col("type_b"), col("n_ab"),
            col("n_a"), col("n_b"),
            ((col("n_ab") * col("nu")).cast("double") /
              (col("n_a") * col("n_b")).cast("double")).as("lift"))
      }),

    // OLS regression diagnostics: slope, intercept, RMSE and 3σ
    // residual-outlier count per user — q105 reports the trend, this
    // reports where the fit BREAKS (a user whose metric is not
    // linear-in-time at all). Exact-decimal sums feed both fit
    // parameters; residuals are per-row IEEE on identical operands;
    // the residual-square sum goes through the decimal cast before
    // one sqrt. Never a window; two row passes + key joins.
    QueryDef(
      "q145_regression_outliers",
      Some(s"""
        WITH $dkDayK,
        g AS (SELECT user_id, count(*) AS n, sum(day) AS sx,
                     sum(k) AS sy, sum(day*k) AS sxy,
                     sum(day*day) AS sxx
              FROM e GROUP BY 1),
        fit AS (SELECT user_id, n,
                       CAST(n*sxy - sx*sy AS DOUBLE)
                         / CAST(n*sxx - sx*sx AS DOUBLE) AS b,
                       CAST(sx AS DOUBLE) AS sxd,
                       CAST(sy AS DOUBLE) AS syd
                FROM g WHERE n*sxx - sx*sx <> 0),
        ab AS (SELECT user_id, n, b,
                      (syd - b * sxd) / n AS a
               FROM fit),
        r AS (SELECT e.user_id, ab.n, ab.a, ab.b,
                     CAST(e.k AS DOUBLE) - ab.a
                       - ab.b * CAST(e.day AS DOUBLE) AS res
              FROM e JOIN ab USING (user_id)),
        s AS (SELECT user_id,
                     sqrt(CAST(sum(CAST(res*res AS DECIMAL(38,6)))
                       AS DOUBLE) / count(*)) AS rmse
              FROM r GROUP BY 1)
        SELECT r.user_id, max(r.n) AS n, max(r.a) AS intercept,
               max(r.b) AS slope, max(s.rmse) AS rmse,
               count(*) FILTER (WHERE abs(r.res) > 3.0 * s.rmse)
                 AS n_outliers
        FROM r JOIN s USING (user_id) GROUP BY 1"""),
      (s, d) =>
        graft.ops.Aggregates.regressionOutliers(
          eventsDayK(s, d),
          "user_id", "day", "k")),

    // Inter-arrival gap quantiles: exact p50/p90/p99 of the time
    // between consecutive events per type — the telemetry question
    // behind rate alerts and watermark tuning ("how late is late?").
    // One lag window for the gaps, then the q83 exact-disc quantile
    // machinery (rank math in Long, never an approx sketch).
    QueryDef(
      "q147_interarrival_quantiles",
      Some("""
        WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us
                   FROM events),
        g AS (SELECT event_type, event_id,
                     us - lag(us) OVER (PARTITION BY event_type
                       ORDER BY us, event_id) AS gap
              FROM e),
        v AS (SELECT event_type, event_id, gap FROM g
              WHERE gap IS NOT NULL),
        r AS (SELECT event_type, gap,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY gap, event_id) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM v)
        SELECT event_type, CAST(max(n) AS BIGINT) AS n_rows,
               max(CASE WHEN rn = (1*n + 1) // 2 THEN gap END) AS p50,
               max(CASE WHEN rn = (9*n + 9) // 10 THEN gap END) AS p90,
               max(CASE WHEN rn = (99*n + 99) // 100 THEN gap END)
                 AS p99
        FROM r GROUP BY 1"""),
      (s, d) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("us"), col("event_id"))
        val gaps = t(s, d, "events")
          .select(col("event_type"), col("event_id"),
            expr("ts div 1000").as("us"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap").isNotNull)
        graft.ops.Aggregates.quantilesDisc(gaps, "event_type", "gap",
          "event_id", Seq(("p50", 1, 2), ("p90", 9, 10),
            ("p99", 99, 100)))
      }),

    // Session path mining: the 20 most frequent length-3 event-type
    // sequences INSIDE a session (q76's 30-min gap sessions) — the
    // "what do users actually do" behavioral report. Composes the
    // sessionize labeling stage with the n-gram shingle kernel over
    // the per-session ordered event-type array; per-session arrays
    // are gap-bounded, so collect_list stays small however large the
    // event log, and the trigram count is an ordinary hash agg.
    QueryDef(
      "q165_session_paths",
      Some("""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                          event_type
                   FROM events),
        f AS (SELECT user_id, event_id, ts_us, event_type,
                     CASE WHEN ts_us - lag(ts_us) OVER
                            (PARTITION BY user_id
                             ORDER BY ts_us, event_id) <= 1800000000
                          THEN 0 ELSE 1 END AS nf
              FROM e),
        n AS (SELECT user_id, event_id, ts_us, event_type,
                     CAST(sum(nf) OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session
              FROM f),
        sq AS (SELECT user_id, session,
                      list(event_type ORDER BY ts_us, event_id) AS path
               FROM n GROUP BY 1, 2),
        tri AS (SELECT path[i] || ' ' || path[i+1] || ' ' || path[i+2]
                         AS path3
                FROM sq, unnest(range(1, len(path) - 1)) r(i)
                WHERE len(path) >= 3)
        SELECT path3, count(*) AS n_occurrences
        FROM tri GROUP BY 1
        ORDER BY n_occurrences DESC, path3 LIMIT 20"""),
      (s, d) => {
        val e = t(s, d, "events").select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"), col("event_type"))
        val labeled = Events.sessionLabels(e, "user_id", "ts_us",
          "event_id", gap = 1800000000L)
        val seqs = labeled
          .groupBy(col("user_id"), col("session"))
          .agg(transform(sort_array(collect_list(struct(col("ts_us"),
            col("event_id"), col("event_type")))),
            x => x.getField("event_type")).as("path"))
        seqs
          .select(explode(TextOps.arrayShingles(col("path"), 3))
            .as("path3"))
          .groupBy(col("path3"))
          .agg(count(lit(1)).as("n_occurrences"))
          .orderBy(col("n_occurrences").desc, col("path3"))
          .limit(20)
      }),

    // Exponentially time-decayed event mass per type, half-life = one
    // day with base 2 — so every per-event weight is the DYADIC
    // 2^(shift−age)/2^shift: integer-valued doubles whose sums stay
    // below 2^53, making the whole statistic bit-exact in IEEE across
    // engines and summation orders (the usual e^{-λt} decay is
    // libm-dependent in the last ulp). The decay anchor (newest day)
    // and the normalizing shift (day span) come from ONE broadcast
    // bounds row — no driver-side clock, no second scan.
    QueryDef(
      "q186_time_decay",
      Some("""
        WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day
                   FROM events),
        b AS (SELECT max(day) AS maxd, min(day) AS mind FROM e),
        x AS (SELECT event_type,
                     datediff('day', day, maxd) AS age,
                     least(datediff('day', mind, maxd), 80) AS shiftp
              FROM e, b)
        SELECT event_type, count(*) AS n_events,
               CAST(sum(CASE WHEN age <= shiftp
                 THEN CAST(power(2.0, shiftp - age) AS HUGEINT)
                 ELSE 0::HUGEINT END) AS DOUBLE)
               / power(2.0, max(shiftp)) AS decayed_mass
        FROM x GROUP BY 1"""),
      (s, d) => {
        val e = t(s, d, "events").select(col("event_type"),
          to_date(expr("timestamp_micros(ts div 1000)")).as("day"))
        val bounds = e.agg(max(col("day")).as("maxd"),
          min(col("day")).as("mind"))
        // span clamped at 80 and weights summed in DECIMAL(38,0):
        // each weight 2^(shiftp−age) is an exact power of two (exact
        // as a double AND in the decimal), so the sum is exact at ANY
        // event count and summation order — the raw double sum was
        // only exact below 2^53 total mass, i.e. its cross-engine
        // hash guarantee silently expired with corpus growth (and
        // power(2, span) overflowed to Inf past 1023 days). Events
        // older than 80 half-lives carry weight < 2^-80 ≈ 0 and are
        // dropped — stated truncation, mirrored in the oracle.
        e.crossJoin(broadcast(bounds))
          .select(col("event_type"),
            datediff(col("maxd"), col("day")).as("age"),
            least(datediff(col("maxd"), col("mind")), lit(80))
              .as("shiftp"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("age") <= col("shiftp"),
              pow(lit(2.0), (col("shiftp") - col("age")).cast("double"))
                .cast("decimal(38,0)"))
              .otherwise(lit(0).cast("decimal(38,0)"))).as("num"),
            max(col("shiftp")).as("sh"))
          .select(col("event_type"), col("n_events"),
            (col("num").cast("double") /
              pow(lit(2.0), col("sh").cast("double")))
              .as("decayed_mass"))
      })
  )
}
