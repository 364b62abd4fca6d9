package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Aggregates, NameAlgebra}

/** PhEDEx-family jobs (degraded/phedex.py, degraded/dbs_phedex.py,
  * degraded/phedex_agg.py, src/Go/mergePhedex.go) re-expressed
  * Spark-first. The family is the reference's block-replica data
  * model: a daily full dump of (node, dataset, block, bytes, replica
  * creation, owning group) rows, snapshotted per day, then merged
  * across days into per-replica residence summaries.
  *
  * Scale notes: the daily snapshot and the merge both aggregate on
  * (site, dataset[, rdate, gid]) — the natural shuffle key at any
  * scale; the DBS×PhEDEx join broadcasts every true dimension and
  * shuffles only the two fact-sized sides; the cross-day merge that
  * the reference runs as a 40-minute single-threaded Go program
  * (mergePhedex.go:5) is one shuffle + an ordered per-key fold over
  * ≤|date-range| elements, with no driver-side state at all.
  */
object PhedexJobs {

  /** site_filter (degraded/phedex.py:38-42): keep sites that are not
    * tape/staging endpoints (`_MSS`, `_Buffer`, `_Export`). */
  def siteFilter(site: Column): Column =
    !(site.endsWith("_MSS") || site.endsWith("_Buffer") ||
      site.endsWith("_Export"))

  /** Daily PhEDEx snapshot (degraded/phedex.py:65-90, identical shape
    * to reports/aggregate_phedex.py:70-93 — registered under both
    * `phedex_snapshot` and `tier_phedex`): per (site,
    * dataset, replica-create-time, group) block-byte totals for one
    * dump day, with the human replica date (unix2human, UTC yyyyMMdd —
    * the session timezone is pinned UTC in [[graft.core.Sessions]] so
    * from_unixtime matches the reference's gmtime). `date` is the
    * nominal dump day: passed by the caller like the reference's
    * `--date` flag, or derived per-row from the dump's own `now_sec`
    * when absent (the dump carries its day; no driver clock involved).
    *
    * Output columns (the mergePhedex input contract,
    * mergePhedex.go:112-121): date, site, dataset, size,
    * replica_date, groupid. */
  def siteSnapshot(phedex: DataFrame, date: Option[String] = None)
      : DataFrame =
    phedex
      .filter(siteFilter(col("node_name")))
      .withColumn("date",
        date.map(lit).getOrElse(
          from_unixtime(col("now_sec").cast("long"), "yyyyMMdd")))
      .groupBy(col("node_name"), col("dataset_name"),
        col("replica_time_create"), col("br_user_group_id"),
        col("date"))
      .agg(sum(col("block_bytes")).as("size"))
      .select(
        col("date"),
        col("node_name").as("site"),
        col("dataset_name").as("dataset"),
        col("size"),
        from_unixtime(col("replica_time_create").cast("long"), "yyyyMMdd")
          .as("replica_date"),
        col("br_user_group_id").cast("long").as("groupid"))

  /** Snapshot-range aggregation (degraded/phedex_agg.py:82-90): per
    * (site, dataset, size) the date/replica-date extremes across the
    * merged snapshot store, plus the reference's `days_present` span
    * (phedex_agg.py:37-46): round days between the overall min and max
    * of BOTH date families, -1 when any bound is null. Dates are
    * yyyyMMdd; the span uses calendar-day difference (the reference's
    * mktime delta / 86400 — identical for whole days in UTC). */
  def snapshotAgg(summary: DataFrame): DataFrame = {
    def d8(c: Column): Column = to_date(c.cast("string"), "yyyyMMdd")
    summary
      .groupBy(col("site"), col("dataset"), col("size"))
      .agg(
        min(col("date")).as("min_date"), max(col("date")).as("max_date"),
        min(col("replica_date")).as("min_rdate"),
        max(col("replica_date")).as("max_rdate"))
      .withColumn("days",
        when(col("min_date").isNull || col("max_date").isNull ||
          col("min_rdate").isNull || col("max_rdate").isNull, lit(-1))
          .otherwise(datediff(
            greatest(d8(col("max_date")), d8(col("max_rdate"))),
            least(d8(col("min_date")), d8(col("min_rdate"))))))
  }

  /** Cross-day replica-residence merge — the distributed form of
    * src/Go/mergePhedex.go (the reference's one published performance
    * number: 1 year of snapshots in ~40 min single-threaded). Input is
    * the union of daily [[siteSnapshot]] outputs; output is one row
    * per (site, dataset, rdate, gid) with:
    *
    *  - `min_date` / `max_date`: first/last day the replica appears;
    *  - `days`: number of distinct days present;
    *  - `max_size`: max over days of the day's size total
    *    (mergePhedex.go:312-316 tracks the running day sum's max,
    *    which peaks at the completed day total);
    *  - `ave_size`: the Go program's exact sequential day-fold
    *    (mergePhedex.go:300-309 + postProcess 211-224): with day
    *    totals s_1..s_n in date order, A_2 = s_1 and
    *    A_{k+1} = (A_k * k + s_k) div (k+1), reported as A_{n+1}.
    *    This is NOT the arithmetic mean (early days are over-weighted
    *    by the recurrence) — reproduced bit-for-bit, long division
    *    and all, because downstream reference reports consume it.
    *
    * Gid normalization (mergePhedex.go:262-291): null→-1, and within
    * one (site, dataset, rdate) the -1 rows adopt the group's valid
    * gid. The Go version keeps whichever valid gid it saw LAST in
    * file-read order — nondeterministic under concurrency; here the
    * MAX valid gid is adopted, a deterministic choice that agrees
    * whenever the group has one valid gid (the case the hack exists
    * for).
    *
    * Shape at scale: one window + two hash aggregations, all keyed on
    * (site, dataset[, rdate, gid]); the per-key fold array holds one
    * entry per day in the range (≤366 for the reference's yearly
    * runs), so executor memory is bounded by key-cardinality × range
    * days, never by row count. */
  def mergeSnapshots(summary: DataFrame): DataFrame =
    finalizeMerged(mergeState(summary))

  /** Per-(site, dataset, rdate) adoption of the group's valid gid by
    * null/-1 rows — see [[mergeSnapshots]]'s gid-normalization note.
    * Rows are PRE-AGGREGATED to (site, dataset, replica_date, gid0,
    * date) partial sums BEFORE the adoption window: the max-valid-gid
    * per group is unchanged by partial summation, and both callers
    * re-aggregate after adoption, so the result is identical while
    * the window (a shuffle + sort) sees one row per distinct key
    * instead of every block-replica line — at snapshot scale that is
    * the dedup factor of the dump (measured 600k → ~25k at sf0.1). */
  private def adoptGids(summary: DataFrame): DataFrame = {
    val gidW = Window.partitionBy(col("site"), col("dataset"),
      col("replica_date"))
    summary
      .withColumn("gid0", coalesce(col("groupid"), lit(-1L)))
      .groupBy(col("site"), col("dataset"), col("replica_date"),
        col("gid0"), col("date"))
      .agg(sum(col("size")).as("size"))
      .withColumn("gid",
        when(col("gid0") === -1L,
          coalesce(
            max(when(col("gid0") =!= -1L, col("gid0"))).over(gidW),
            lit(-1L)))
          .otherwise(col("gid0")))
  }

  /** The Go program's LIVE accumulator per key (mergePhedex.go:131-139
    * `Value`), built in one batch pass: day bounds, distinct-day
    * count, max day total, and the three fold registers — running
    * average `a`, days-at-last-roll `d`, and the latest day's total
    * `last` (postProcess has NOT been applied). [[finalizeMerged]]
    * produces the report; [[mergeDay]] advances this state by one new
    * day without re-reading history — the form a nightly job keeps at
    * scale instead of refolding a year of snapshots (the Go program
    * refolds: ~40 min single-threaded per run). */
  def mergeState(summary: DataFrame): DataFrame = {
    val daySums = adoptGids(summary)
      .groupBy(col("site"), col("dataset"),
        col("replica_date").as("rdate"), col("gid"), col("date"))
      .agg(sum(col("size")).as("day_size"))
    daySums
      .groupBy(col("site"), col("dataset"), col("rdate"), col("gid"))
      .agg(
        min(col("date")).as("min_date"),
        max(col("date")).as("max_date"),
        count(lit(1)).as("days"),
        max(col("day_size")).as("max_size"),
        sort_array(collect_list(struct(col("date"), col("day_size"))))
          .as("__seq"))
      .withColumn("__s", expr("transform(__seq, x -> x.day_size)"))
      // the Go recurrence as a SQL higher-order fold; `div` keeps the
      // reference's int64 truncating division (all sizes are ≥ 0)
      .withColumn("__st", expr(
        """aggregate(
          |  slice(__s, 2, size(__s) - 1),
          |  struct(CAST(element_at(__s, 1) AS BIGINT) AS a,
          |         CAST(1 AS BIGINT) AS d,
          |         CAST(element_at(__s, 1) AS BIGINT) AS last),
          |  (acc, e) -> struct(
          |    CASE WHEN acc.d = 1 THEN acc.last
          |         ELSE (acc.a * acc.d + acc.last) div (acc.d + 1)
          |    END AS a,
          |    acc.d + CAST(1 AS BIGINT) AS d,
          |    CAST(e AS BIGINT) AS last))""".stripMargin))
      .select(col("site"), col("dataset"), col("rdate"), col("gid"),
        col("min_date"), col("max_date"), col("days"), col("max_size"),
        col("__st.a").as("a"), col("__st.d").as("d"),
        col("__st.last").as("last"))
  }

  /** postProcess (mergePhedex.go:211-224) over a [[mergeState]] frame:
    * fold the pending day into the average and emit the report
    * columns. Pure projection — no shuffle. */
  def finalizeMerged(state: DataFrame): DataFrame =
    state
      .withColumn("ave_size",
        when(col("d") === 1L, col("last"))
          .otherwise(expr("(a * d + last) div (d + 1)")))
      .select(col("site"), col("dataset"), col("rdate"), col("gid"),
        col("min_date"), col("max_date"), col("ave_size"),
        col("max_size"), col("days"))

  /** Incremental merge: advance a [[mergeState]] frame by ONE day's
    * [[siteSnapshot]] output — the nightly-update form of the Go
    * refold. Per matched key, the Go per-record update
    * (mergePhedex.go:293-320) collapses to one branch pair:
    *
    *  - new day (`date > max_date`): roll the average
    *    (A' = d==1 ? last : (a·d+last) div (d+1)), d+1, day total
    *    becomes `last`, bounds/days/max update;
    *  - same day re-fed (`date == max_date`): the day total
    *    accumulates into `last` (no roll), max_size tracks the new
    *    total — byte-identical to the Go's intra-day lastSize growth.
    *
    * Gid adoption spans state ∪ day: a day-side -1 adopts the group's
    * valid gid (state- or day-side); a -1 STATE re-keys onto a valid
    * gid the day introduces (the Go giddict conversion). When that
    * re-key collides with an existing valid-gid state, the Go
    * overwrites by arrival order (printing 'surprising'); here the
    * row with more accumulated days survives — deterministic, and
    * identical whenever the collision doesn't happen (it requires the
    * same key to have accumulated under BOTH gids, which one
    * sequential pass can't produce).
    *
    * Shape: one window over (site, dataset, rdate) on the small
    * union-of-keys frame + one full-outer join on the state key —
    * state is the accumulator table (one row per replica), the day is
    * one snapshot; both shuffle once on the same key. Late days
    * (`date < max_date`) violate the fold's ordering contract and
    * fail the run loudly rather than corrupt the average. */
  def mergeDay(state: DataFrame, daySummary: DataFrame): DataFrame = {
    val key = Seq("site", "dataset", "rdate", "gid")
    val daySums = adoptGids(daySummary)
      .groupBy(col("site"), col("dataset"),
        col("replica_date").as("rdate"), col("gid"), col("date"))
      .agg(sum(col("size")).as("day_size"))
    // cross-side gid adoption: -1 keys (either side) adopt the max
    // valid gid present in the (site, dataset, rdate) group
    val tagged = state.select(
      col("site"), col("dataset"), col("rdate"), col("gid"),
      struct(col("min_date"), col("max_date"), col("days"),
        col("max_size"), col("a"), col("d"), col("last")).as("__state"),
      lit(null).cast("long").as("date"),
      lit(null).cast("long").as("day_size"))
      .unionByName(daySums.select(
        col("site"), col("dataset"), col("rdate"), col("gid"),
        lit(null).cast("struct<min_date:bigint,max_date:bigint," +
          "days:bigint,max_size:bigint,a:bigint,d:bigint,last:bigint>")
          .as("__state"),
        col("date"), col("day_size")))
    val groupW = Window.partitionBy(col("site"), col("dataset"),
      col("rdate"))
    val adopted = tagged
      .withColumn("gid",
        when(col("gid") === -1L,
          coalesce(max(when(col("gid") =!= -1L, col("gid"))).over(groupW),
            lit(-1L)))
          .otherwise(col("gid")))
    // collapse re-keyed collisions (state rows only; day rows of one
    // date already collapsed per key by the aggregation above, and a
    // re-keyed day row merges with the valid-gid day row by summing)
    val states = adopted.filter(col("__state").isNotNull)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(key.map(col): _*)
          .orderBy(col("__state.days").desc, col("__state.min_date"))))
      .filter(col("__rk") === 1)
      .select(key.map(col) :+ col("__state"): _*)
    val days = adopted.filter(col("day_size").isNotNull)
      .groupBy(key.map(col): _*)
      .agg(max(col("date")).as("date"), sum(col("day_size")).as("day_size"))
    states.join(days, key, "full")
      .select(
        key.map(col) ++ Seq(
          // least/greatest skip nulls, so absent-today and brand-new
          // keys fall out of the same expressions
          least(col("__state.min_date"), col("date")).as("min_date"),
          greatest(col("__state.max_date"), col("date")).as("max_date"),
          when(col("date").isNull, col("__state.days")) // key absent today
            .when(col("__state").isNull, lit(1L))
            .when(col("date") === col("__state.max_date"),
              col("__state.days"))
            .when(col("date") > col("__state.max_date"),
              col("__state.days") + 1L)
            .otherwise(raise_error(format_string(
              "mergeDay: late day %d behind state max_date %d",
              col("date"), col("__state.max_date")))).as("days"),
          when(col("date").isNull, col("__state.max_size"))
            .when(col("__state").isNull, col("day_size"))
            .when(col("date") === col("__state.max_date"),
              greatest(col("__state.max_size"),
                col("__state.last") + col("day_size")))
            .otherwise(greatest(col("__state.max_size"),
              col("day_size"))).as("max_size"),
          when(col("date").isNull, col("__state.a"))
            .when(col("__state").isNull, col("day_size"))
            .when(col("date") === col("__state.max_date"),
              col("__state.a"))
            .otherwise(when(col("__state.d") === 1L, col("__state.last"))
              .otherwise(expr(
                "(__state.a * __state.d + __state.last) div " +
                  "(__state.d + 1)"))).as("a"),
          when(col("date").isNull, col("__state.d"))
            .when(col("__state").isNull, lit(1L))
            .when(col("date") === col("__state.max_date"),
              col("__state.d"))
            .otherwise(col("__state.d") + 1L).as("d"),
          when(col("date").isNull, col("__state.last"))
            .when(col("__state").isNull, col("day_size"))
            .when(col("date") === col("__state.max_date"),
              col("__state.last") + col("day_size"))
            .otherwise(col("day_size")).as("last")): _*)
  }

  /** Campaign × tier disk report (reports/aggregate_campaign_tier.py:
    * 78-145): DBS VALID per-dataset size (files ⋈ datasets ⋈ access
    * types) joined to the PhEDEx per-dataset replica size — where
    * `size_on_disk` zeroes tape/staging endpoints via [[siteFilter]]
    * instead of the reference's row UDF — then rolled up to
    * (campaign, tier) with campaign/tier cut from the dataset name
    * (`split('/')[2]`/`[3]`), and the top `limit` rows by combined
    * dbs+phedex size. The reference's two `agg({'size':'sum'})` UDF
    * passes collapse into one codegen'd aggregate per side.
    *
    * At scale: daf is a handful of rows (broadcast); both per-dataset
    * aggregates shuffle on dataset name and meet in an AQE-planned
    * join; the campaign×tier rollup is low-cardinality so the final
    * orderBy+limit is a TakeOrderedAndProject, never a global sort. */
  def campaignTierReport(ddf: DataFrame, fdf: DataFrame, daf: DataFrame,
      phedex: DataFrame, limit: Int = 100): DataFrame = {
    val dbsSize = fdf
      .select(col("f_dataset_id"), col("f_file_size"))
      .join(ddf.select(col("d_dataset_id"), col("d_dataset"),
        col("d_dataset_access_type_id")),
        col("f_dataset_id") === col("d_dataset_id"))
      .join(broadcast(daf),
        col("d_dataset_access_type_id") === daf("dataset_access_type_id"))
      .filter(col("dataset_access_type") === "VALID")
      .groupBy(col("d_dataset").as("dataset"))
      .agg(Aggregates.decSum(col("f_file_size"), 0).as("dbs_size"))
    val phedexSize = phedex
      .select(col("dataset_name").as("dataset"),
        col("block_bytes").as("size"), col("node_name").as("site"))
      .groupBy(col("dataset"))
      .agg(
        Aggregates.decSum(col("size"), 0).as("phedex_size"),
        Aggregates.decSum(
          when(siteFilter(col("site")), col("size")).otherwise(lit(0L)), 0)
          .as("size_on_disk"))
    phedexSize
      .join(dbsSize, "dataset")
      .groupBy(
        NameAlgebra.campaign(col("dataset")).as("campaign"),
        NameAlgebra.dataTier(col("dataset")).as("tier"))
      .agg(
        Aggregates.decSum(col("dbs_size"), 0).as("dbs_size"),
        Aggregates.decSum(col("phedex_size"), 0).as("phedex_size"),
        Aggregates.decSum(col("size_on_disk"), 0).as("size_on_disk"))
      .orderBy((col("dbs_size") + col("phedex_size")).desc)
      .limit(limit)
  }

  /** DBS × PhEDEx dataset summary (degraded/dbs_phedex.py:44-110):
    * the reference's 5-way DBS dimension join (datasets ⋈ files ⋈
    * access types ⋈ acquisition eras ⋈ processing eras), VALID-only,
    * aggregated per dataset, enriched with the release version via
    * the mod-config chain, then joined to the per-(node, dataset)
    * PhEDEx replica aggregate and split into primds/procds/tier
    * (spark_utils.py:727-734).
    *
    * Join strategy: daf/aef/pef/ocf/rvf are true dimensions
    * (dozens–thousands of rows) → broadcast; files and mod-configs
    * are fact-sized → shuffle on the dataset id; the final DBS×PhEDEx
    * join shuffles on dataset name. No dimension ever shuffles. */
  def dbsPhedex(ddf: DataFrame, fdf: DataFrame, daf: DataFrame,
      aef: DataFrame, pef: DataFrame, mcf: DataFrame, ocf: DataFrame,
      rvf: DataFrame, phedex: DataFrame): DataFrame = {
    val newpdf = phedex
      .groupBy(col("node_name"), col("dataset_name"),
        col("dataset_is_open"))
      .agg(sum(col("block_bytes")).as("pbr_size"),
        max(col("replica_time_create")).as("max_replica_time"))
    val joins = ddf
      .join(fdf, ddf("d_dataset_id") === fdf("f_dataset_id"))
      .join(broadcast(daf),
        ddf("d_dataset_access_type_id") === daf("dataset_access_type_id"))
      .join(broadcast(aef),
        ddf("d_acquisition_era_id") === aef("acquisition_era_id"))
      .join(broadcast(pef),
        ddf("d_processing_era_id") === pef("processing_era_id"))
      .select(col("d_dataset_id"), col("d_dataset"),
        col("d_creation_date"), col("d_is_dataset_valid"),
        col("f_event_count"), col("f_file_size"),
        col("dataset_access_type"), col("acquisition_era_name"),
        col("processing_version"))
    val fjoin = joins
      .filter(col("dataset_access_type") === "VALID" &&
        col("d_is_dataset_valid") === 1)
      .distinct()
    val newdf = fjoin
      .groupBy(col("d_dataset"), col("d_dataset_id"),
        col("dataset_access_type"), col("acquisition_era_name"),
        col("processing_version"))
      .agg(sum(col("f_event_count")).as("evts"),
        sum(col("f_file_size")).as("size"),
        max(col("d_creation_date")).as("date"))
    val withRel = newdf
      .join(mcf, newdf("d_dataset_id") === mcf("mc_dataset_id"))
      .join(broadcast(ocf),
        mcf("mc_output_mod_config_id") === ocf("oc_output_mod_config_id"))
      .join(broadcast(rvf),
        ocf("oc_release_version_id") === rvf("r_release_version_id"))
      .select(col("d_dataset"), col("evts"), col("size"), col("date"),
        col("dataset_access_type"), col("acquisition_era_name"),
        col("r_release_version"))
    withRel
      .join(newpdf, withRel("d_dataset") === newpdf("dataset_name"))
      .select(col("d_dataset"), col("evts"), col("size"), col("date"),
        col("dataset_access_type"), col("acquisition_era_name"),
        col("r_release_version"), col("node_name"), col("pbr_size"),
        col("dataset_is_open"), col("max_replica_time"))
      .withColumn("primds", NameAlgebra.primaryDataset(col("d_dataset")))
      .withColumn("procds", NameAlgebra.processedDataset(col("d_dataset")))
      .withColumn("tier", NameAlgebra.dataTier(col("d_dataset")))
      .drop("d_dataset")
  }
}
