package graft.jobs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Aggregates, NameAlgebra}

/** DBS-family jobs (data_collection.py, dbs_eos.py, dbs_aaa.py,
  * degraded/dbs_events.py, reports/aggregate_*.py) re-expressed as
  * DataFrame→DataFrame pipelines. Inputs are injected (tests use
  * fixtures, production uses `core.IO` readers), so the query shape is
  * the unit under test — exactly the reference's semantics, Spark-first
  * physical plan (broadcast dims, map-side partial aggs).
  */
object DbsJobs {

  /** Dataset popularity: datasets ⋈ files ⋈ access-stream on LFN →
    * per-dataset access stats + name-algebra columns. The 3-way
    * join+aggregate core of data_collection.py:162-164 / dbs_eos.py:72.
    * `accessStream` needs (file_lfn, user_dn, read_bytes). */
  def datasetPopularity(datasets: DataFrame, files: DataFrame,
      accessStream: DataFrame): DataFrame = {
    val joined = accessStream
      .join(files, accessStream("file_lfn") === files("f_logical_file_name"))
      .join(datasets, files("f_dataset_id") === datasets("d_dataset_id"))
    joined
      .groupBy(col("d_dataset").as("dataset"))
      .agg(
        count(lit(1)).as("nacc"),
        countDistinct(col("user_dn")).as("distinct_users"),
        sum(col("read_bytes")).as("tot_read_bytes"))
      .select(
        col("dataset"),
        NameAlgebra.primaryDataset(col("dataset")).as("primds"),
        NameAlgebra.processedDataset(col("dataset")).as("procds"),
        NameAlgebra.dataTier(col("dataset")).as("tier"),
        col("nacc"), col("distinct_users"), col("tot_read_bytes"))
  }

  /** Event/size totals per data tier (degraded/dbs_events.py:51-59):
    * datasets ⋈ files, sums keyed by the tier token of the name. */
  def eventCountByTier(datasets: DataFrame, files: DataFrame): DataFrame =
    files
      .join(datasets, files("f_dataset_id") === datasets("d_dataset_id"))
      .groupBy(NameAlgebra.dataTier(col("d_dataset")).as("tier"))
      .agg(
        sum(col("f_event_count")).as("evts"),
        Aggregates.decSum(col("f_file_size"), 0).as("size"),
        count(lit(1)).as("n_files"))

  /** Block → lumi-section count (dbs_block_lumis.py:40-62): blocks ⋈
    * files on block id ⋈ file_lumis on file id, lumi rows counted per
    * block name. The one consumer of `Schemas.dbsFileLumis`. At scale
    * the two joins shuffle on the ids while the count is a map-side
    * partial agg on block name — no driver state, no persist needed
    * (the reference's MEMORY_AND_DISK persist guarded re-use across
    * two outputs; here the single aggregate consumes the join once). */
  def blockLumis(blocks: DataFrame, files: DataFrame,
      fileLumis: DataFrame): DataFrame =
    blocks
      .join(files, blocks("b_block_id") === files("f_block_id"))
      .join(fileLumis, files("f_file_id") === fileLumis("fl_file_id"))
      .groupBy(col("b_block_name"))
      .agg(count(col("fl_lumi_section_num")).as("nlumis"))

  /** Per-(month, tier) event counts with skim routing
    * (dbs_event_count_plot.py:182-210): two complementary branches —
    * non-skim datasets keep their tier name, skim-matching datasets
    * get `tier/<skim>` — unioned with SQL UNION semantics. The
    * reference's SQL `UNION` DEDUPLICATES (the §7.5 risk-register
    * trap: `union()` alone would be UNION ALL); the branches are
    * disjoint by construction, but `.distinct()` preserves the
    * declared semantics if the routing predicates ever overlap. */
  def eventCountBySkimTier(datasets: DataFrame, files: DataFrame,
      dataTiers: DataFrame, tiersRe: String, removeRe: String,
      skimsRe: String): DataFrame = {
    val base = files
      .join(datasets, files("f_dataset_id") === datasets("d_dataset_id"))
      .join(dataTiers,
        dataTiers("data_tier_id") === datasets("d_data_tier_id"))
      .filter(col("data_tier_name").rlike(tiersRe)
        && !lower(col("d_dataset")).rlike(removeRe))
      .withColumn("month",
        date_format(
          to_date(col("f_creation_date").cast("long").cast("timestamp")),
          "yyyy/MM"))
    val plain = base.filter(!col("d_dataset").rlike(skimsRe))
      .groupBy(col("month"), col("data_tier_name"))
      .agg(sum(col("f_event_count")).as("nevents"))
    val skims = base.filter(col("d_dataset").rlike(skimsRe))
      .groupBy(col("month"),
        concat(col("data_tier_name"), lit("/"),
          regexp_extract(col("d_dataset"), skimsRe, 1))
          .as("data_tier_name"))
      .agg(sum(col("f_event_count")).as("nevents"))
    plain.union(skims).distinct()
  }

  /** "Leftovers": datasets present in `other` but absent from DBS
    * (reports/aggregate_leftovers.py:127-146) + their total size.
    * Returns (dataset, size) rows; callers can `agg(sum)` for the
    * global number. */
  def leftovers(dbsDatasets: DataFrame, other: DataFrame): DataFrame =
    other.join(dbsDatasets,
        other("dataset") === dbsDatasets("d_dataset"), "left_anti")

  /** Checksum hunt (dbs_adler.py:42-55): datasets ⋈ files on dataset
    * id, keep files whose adler32 checksum is in the suspect list
    * (the reference pins 17 corrupted checksums inline; callers pass
    * theirs), distinct rows out. The IN-list compiles to a pushed-down
    * scan filter on f_adler32 — the scan never surfaces clean files. */
  def adlerFiles(datasets: DataFrame, files: DataFrame,
      adlers: Seq[String]): DataFrame =
    datasets.select(col("d_dataset_id"), col("d_dataset"))
      .join(files.select(col("f_dataset_id"), col("f_logical_file_name"),
        col("f_adler32"))
        .filter(col("f_adler32").isin(adlers: _*)),
        col("d_dataset_id") === col("f_dataset_id"))
      .select(col("d_dataset_id"), col("d_dataset"),
        col("f_logical_file_name"), col("f_adler32"))
      .distinct()

  /** The reference's 17 inline suspect checksums (dbs_adler.py:49-50)
    * — kept as the CLI default so `--job dbs_adler` reproduces the
    * published run. */
  val ReferenceAdlers: Seq[String] = Seq(
    "ad8f6ad2", "9c441343", "f68d5dca", "81c90e2a", "471d2524",
    "a3c1f077", "6f0018a0", "8bb03b60", "d504882c", "5ede357f",
    "b05303c3", "716d1776", "7e9cf258", "1945804b", "ec7bc1d7",
    "12c87747", "94f2aa32")

  /** LFN suffix hunt (dbs_lfn.py:42-56): blocks ⋈ files on block id,
    * files matching the LIKE pattern (the reference hunts one ROOT
    * file GUID across all blocks). The leading-wildcard LIKE can't
    * prune the scan — it IS a full-file-table predicate by design;
    * the join only sees surviving rows. */
  def lfnPattern(blocks: DataFrame, files: DataFrame,
      pattern: String): DataFrame =
    blocks.select(col("b_block_id"), col("b_block_name"))
      .join(files.select(col("f_block_id"), col("f_logical_file_name"))
        .filter(col("f_logical_file_name").like(pattern)),
        col("b_block_id") === col("f_block_id"))
      .select(col("b_block_name"), col("f_logical_file_name"))

  /** Leftovers report (reports/aggregate_leftovers.py:49-155): PhEDEx
    * replicas whose dataset is absent from DBS, in the reference's two
    * variants — "all" (absent from the VALID-with-files DBS view: a
    * VALID dataset with no file rows still counts as leftover, because
    * the reference inner-joins fdf before subtracting) and "orphans"
    * (absent from DBS datasets of ANY validity). Orphans ⊆ all, so one
    * frame with an `is_orphan` flag carries both reference outputs:
    * filter for the orphans file, project it away for the all file.
    * `sites` is the reference's collect_set, array_sort'd so the frame
    * is deterministic. Campaign is the name's third token.
    *
    * Shape at scale: both DBS sides reduce to distinct dataset-name
    * sets (dimension-sized) before any join against the fact-sized
    * PhEDEx aggregate; the anti/flag joins are broadcastable. The
    * reference's two driver-side `.collect()[0]` size totals are left
    * to the report layer — no driver state here. */
  def leftoversReport(ddf: DataFrame, daf: DataFrame, fdf: DataFrame,
      phedex: DataFrame): DataFrame = {
    val phedexAgg = phedex
      .groupBy(col("dataset_name").as("dataset"))
      .agg(
        Aggregates.decSum(col("block_bytes"), 0).as("phedex_size"),
        array_sort(collect_set(col("node_name"))).as("sites"))
    val validWithFiles = ddf
      .join(broadcast(daf),
        ddf("d_dataset_access_type_id") === daf("dataset_access_type_id"))
      .filter(col("dataset_access_type") === "VALID")
      .join(fdf, ddf("d_dataset_id") === fdf("f_dataset_id"), "left_semi")
      .select(col("d_dataset").as("dataset")).distinct()
    val anyDbs = ddf.select(col("d_dataset").as("dataset")).distinct()
    phedexAgg
      .join(validWithFiles, Seq("dataset"), "left_anti")
      .join(anyDbs.withColumn("in_dbs", lit(1)), Seq("dataset"), "left")
      .select(
        col("dataset"),
        NameAlgebra.campaign(col("dataset")).as("campaign"),
        col("sites"), col("phedex_size"),
        col("in_dbs").isNull.as("is_orphan"))
  }

  /** Per-dataset file/event/size totals (reports/aggregate_dbs.py:
    * 57-74): datasets ⋈ blocks on dataset id ⋈ files on block id,
    * then sums per dataset name. Faithfully keeps the reference's
    * quirk of summing `b_file_count` over FILE-level rows (each
    * block's count is added once per file in the block) — the report
    * builder downstream normalizes against the same convention. The
    * reference persists the 3-way join MEMORY_AND_DISK because it was
    * written for two consumers; with the single aggregate the join
    * streams straight into a map-side partial sum, so no persist.
    * At scale: blocks⋈files shuffles on block id, the aggregate on
    * dataset name — both unavoidable; datasets is dimension-sized and
    * broadcast. */
  def tierDbsReport(datasets: DataFrame, blocks: DataFrame,
      files: DataFrame): DataFrame =
    blocks
      .join(files, blocks("b_block_id") === files("f_block_id"))
      .join(broadcast(datasets),
        blocks("b_dataset_id") === datasets("d_dataset_id"))
      .groupBy(col("d_dataset").as("dataset"))
      .agg(
        Aggregates.decSum(col("b_file_count"), 0).as("nfiles"),
        Aggregates.decSum(col("f_event_count"), 0).as("nevents"),
        Aggregates.decSum(col("f_file_size"), 0).as("size"))

  /** Campaign × site size matrix with top-2 sites per campaign
    * (reports/aggregate_campaigns.py:137-205). The row-UDF top-2
    * pickers (`get_mss`/`get_second_mss`) become a pure-Catalyst
    * array_sort over structs. `blocks` needs
    * (dataset, site, block_size). */
  def campaignSiteSummary(blocks: DataFrame): DataFrame = {
    val perSite = blocks
      .groupBy(
        NameAlgebra.campaign(col("dataset")).as("campaign"),
        col("site"))
      .agg(Aggregates.decSum(col("block_size"), 0).as("size"))
    perSite
      .groupBy(col("campaign"))
      .agg(
        Aggregates.decSum(col("size"), 6).as("total_size"),
        array_sort(collect_list(struct(negate(col("size")).as("ns"),
          col("site").as("st")))).as("arr"))
      .select(
        col("campaign"), col("total_size"),
        element_at(col("arr"), 1).getField("st").as("top_site"),
        negate(element_at(col("arr"), 1).getField("ns")).as("top_size"),
        when(size(col("arr")) >= 2,
          element_at(col("arr"), 2).getField("st")).as("second_site"))
  }
}
