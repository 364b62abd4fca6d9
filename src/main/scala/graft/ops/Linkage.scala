package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.BarrierOps
import graft.llmops.TextOps

/** Record-linkage / reconciliation operators: the master-data side of a
  * lake that ingests the same entities from several feeds (the
  * reference reconciles DBS vs PhEDEx vs Rucio views of the same
  * datasets — src/python/CMSSpark/dbs_phedex.py's join-of-truth shape).
  *
  * Everything here is exact-arithmetic and engine-neutral so the DuckDB
  * oracle can hash-match: per-field survivorship is argmax over an
  * integer version, sampling membership is md5-derived, and the
  * agreement statistics are integer pair counts with one final
  * division.
  */
object Linkage {

  /** Golden-record survivorship: collapse N versioned records per key
    * into one row taking, PER FIELD, the value from the latest version
    * where that field is non-null (fields go missing independently per
    * feed, so "latest record wins" would resurrect nulls).
    *
    * Shape: ONE hash aggregation — each field is
    * `max_by(field, version IF field non-null)`, whose partial state is
    * a single (version, value) pair, so the merge is map-side
    * combinable and the plan is a plain two-phase agg regardless of how
    * many duplicate records a hot entity has. No window, no self-join.
    * DuckDB parity: `arg_max(field, CASE WHEN field IS NOT NULL THEN
    * version END)` (both engines skip null ordering keys).
    *
    * PRECONDITION: `versionCol` is unique per key — max_by/arg_max
    * leave ties unspecified, so duplicate versions with conflicting
    * values would make survivorship engine- and run-dependent. Feeds
    * that can replay a version id must be deduplicated (or the
    * version made composite, e.g. (version, feed_id)) first;
    * [[Incremental.orderAudit]]-style per-key checks catch the
    * violation. */
  def goldenRecord(records: DataFrame, keyCols: Seq[String],
      versionCol: String, fieldCols: Seq[String]): DataFrame = {
    val aggs = fieldCols.map(f =>
      max_by(col(f), when(col(f).isNotNull, col(versionCol))).as(f)) ++
      Seq(count(lit(1)).as("n_records"),
        max(col(versionCol)).as("last_version"))
    records
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Point-in-time (temporal) join: enrich each fact row with the
    * dimension attributes that were valid AT the fact's timestamp,
    * against an SCD2 dimension of `[valid_from, valid_to)` intervals
    * ([[Incremental.scdHistory]] output; open interval = null
    * valid_to). The lookup side of the SCD2 story: q103 builds the
    * history, this reads it back without scanning N snapshots.
    *
    * Shape: ONE equi-join on the key with the interval test as a join
    * residual — per key the dimension holds one row per value change
    * (bounded, typically ≤ a few), so the residual filters a handful of
    * candidates per fact row and the plan is an ordinary shuffle (or
    * broadcast, if the dim is small) hash join, never a range
    * explosion. Intervals are disjoint per key by construction, so at
    * most one dim row survives per fact row — no dedup pass needed. */
  def pointInTimeJoin(fact: DataFrame, factKey: String, atCol: String,
      dim: DataFrame, dimKey: String,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    val d = dim.select(
      col(dimKey).as("__dk"),
      col(validFromCol).as("__vf"),
      col(validToCol).as("__vt"),
      struct(dim.columns.filterNot(
        Set(dimKey, validFromCol, validToCol)).map(col): _*).as("__dv"))
    fact
      .join(d,
        fact(factKey) === col("__dk") &&
          fact(atCol) >= col("__vf") &&
          (col("__vt").isNull || fact(atCol) < col("__vt")),
        "left")
      .select(fact.columns.map(col) :+ col("__dv"): _*)
  }

  /** Coordinated (join-preserving) Bernoulli sample membership: keep a
    * row iff `hash60(key || tag) % 100 < pct`. Because membership
    * depends only on the KEY VALUE, applying the same (tag, pct) to a
    * fact table's foreign key and the dimension's primary key yields
    * samples with intact referential integrity — every sampled order's
    * customer is sampled — so sampled joins are exact joins of samples
    * and per-group sums scale by 100/pct unbiasedly. Independent
    * uniform sampling of each table would keep only pct² of join pairs
    * and orphan the rest. Narrow per-row compute, no shuffle, stable as
    * the tables grow (yesterday's sample never reshuffles). */
  def coordinatedKeep(key: Column, tag: String, pct: Int): Column =
    pmod(TextOps.hash60(concat(key.cast("string"), lit(tag))),
      lit(100L)) < pct

  /** Per-field disagreement matrix across feed records of the same
    * entities — the diagnostic you run BEFORE trusting
    * [[goldenRecord]]'s survivorship: for each field, how many
    * entities have a value at all, and how many have ≥2 DISTINCT
    * non-null values across their feed records (i.e. the feeds
    * actively contradict each other, rather than merely omit).
    *
    * Shape: ONE hash aggregation per entity computing every field's
    * exact distinct count simultaneously (count(DISTINCT f) skips
    * nulls in both engines), then a second tiny aggregation over
    * entities, unpivoted to one row per field. The entity frame is
    * |entities| rows regardless of feed fan-in; no per-field passes. */
  def fieldConflicts(records: DataFrame, keyCols: Seq[String],
      fieldCols: Seq[String]): DataFrame = {
    val perEntity = records
      .groupBy(keyCols.map(col): _*)
      .agg(countDistinct(fieldCols.head).as(s"d_${fieldCols.head}"),
        fieldCols.tail.map(f => countDistinct(col(f)).as(s"d_$f")): _*)
    // coalesce: countIf is sum-based, so an EMPTY records frame would
    // emit NULL counts — the stable-report contract wants zeros
    val aggs = fieldCols.flatMap(f => Seq(
      coalesce(Aggregates.countIf(col(s"d_$f") >= 1), lit(0L))
        .as(s"v_$f"),
      coalesce(Aggregates.countIf(col(s"d_$f") >= 2), lit(0L))
        .as(s"c_$f")))
    val one = perEntity.agg(aggs.head, aggs.tail: _*)
    // stack, not a union of per-field selects: a union would re-plan
    // (and re-run) the whole aggregation subtree once per field
    one.select(expr(
      s"stack(${fieldCols.size}, " +
        fieldCols.map(f => s"'$f', `v_$f`, `c_$f`").mkString(", ") +
        ") as (field, n_with_value, n_conflicted)"))
  }

  /** SCD2 validity-interval integrity audit: per defect class, how
    * many `[valid_from, valid_to)` rows violate the history contract —
    * `overlap` (interval runs past the next one's start), `gap`
    * (history has a hole before the next interval), `bad_bounds`
    * (empty or inverted interval), `open_not_last` (a null valid_to
    * anywhere but the final interval — two "current" versions). The
    * check a lake runs on every regenerated dimension before letting
    * [[pointInTimeJoin]] trust disjointness.
    *
    * Shape: one window (lead over the per-key interval order) + one
    * aggregation; every defect is a flag on a single consecutive pair,
    * so the audit is one shuffle on the key regardless of history
    * depth. Emits all four classes (zero counts included) so the
    * report schema is stable. */
  def scdAudit(dim: DataFrame, keyCol: String,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(validFromCol))
    val vt = col(validToCol)
    val nf = lead(col(validFromCol), 1).over(w)
    val flagged = dim.select(
      (vt.isNotNull && nf.isNotNull && vt > nf).as("overlap"),
      (vt.isNotNull && nf.isNotNull && vt < nf).as("gap"),
      (vt.isNotNull && vt <= col(validFromCol)).as("bad_bounds"),
      (vt.isNull && nf.isNotNull).as("open_not_last"))
    // coalesce: an EMPTY dimension must still report four zero rows
    // (countIf is sum-based and yields NULL over zero rows)
    val one = flagged.agg(
      coalesce(Aggregates.countIf(col("overlap")), lit(0L))
        .as("overlap"),
      coalesce(Aggregates.countIf(col("gap")), lit(0L)).as("gap"),
      coalesce(Aggregates.countIf(col("bad_bounds")), lit(0L))
        .as("bad_bounds"),
      coalesce(Aggregates.countIf(col("open_not_last")), lit(0L))
        .as("open_not_last"))
    // stack, not a union of per-defect selects (see fieldConflicts)
    one.select(expr(
      "stack(4, 'overlap', overlap, 'gap', gap, " +
        "'bad_bounds', bad_bounds, 'open_not_last', open_not_last) " +
        "as (defect, n_rows)"))
  }

  /** Clustering-agreement statistics between two label columns by pair
    * counting: the contingency-table reductions behind the Rand index
    * and ARI — how much two independent groupings of the same rows
    * (two dedup algorithms, a heuristic vs a model) agree, without
    * aligning their label vocabularies.
    *
    * Returns ONE row: `n`, `pairs_total` = C(n,2), `pairs_both` =
    * Σ_ij C(n_ij,2) (pairs co-grouped by both), `pairs_a` / `pairs_b`
    * (pairs co-grouped by each side), `rand_index` (one division of
    * exact integers), and `ari` (the standard adjusted form — the
    * expression tree is mirrored verbatim in the q203 oracle so the
    * IEEE arithmetic is bit-identical).
    *
    * Shape: one hash agg to cells (|A|×|B| rows — tiny), then the A/B
    * marginals and the scalars are aggregations OF THE CELLS, never a
    * second pass over the data; the row-level pair space (C(n,2)) is
    * never materialized. The cells frame is barriered once and feeds
    * all three reductions. */
  def clusterAgreement(df: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    // x*(x-1) is always even, so >>1 is the exact halving — pure
    // integer arithmetic (a double division would round above 2^53),
    // matching the oracle's `//`.
    def c2(x: Column): Column = shiftright(x * (x - 1), 1)
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("nij"))
      .barrier()
    val sc = cells.agg(sum(c2(col("nij"))).cast("long")
        .as("pairs_both"),
      sum(col("nij")).as("n"))
    val sa = cells.groupBy(col(aCol)).agg(sum(col("nij")).as("ai"))
      .agg(sum(c2(col("ai"))).as("pairs_a"))
    val sb = cells.groupBy(col(bCol)).agg(sum(col("nij")).as("bj"))
      .agg(sum(c2(col("bj"))).as("pairs_b"))
    val d = (c: String) => col(c).cast("double")
    sc.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .withColumn("pairs_total", c2(col("n")))
      .withColumn("rand_index",
        (d("pairs_total") + lit(2.0) * d("pairs_both") - d("pairs_a") -
          d("pairs_b")) / d("pairs_total"))
      .withColumn("ari",
        (d("pairs_both") - d("pairs_a") * d("pairs_b") /
          d("pairs_total")) /
          ((d("pairs_a") + d("pairs_b")) / lit(2.0) -
            d("pairs_a") * d("pairs_b") / d("pairs_total")))
      .select(col("n"), col("pairs_total"), col("pairs_both"),
        col("pairs_a"), col("pairs_b"), col("rand_index"), col("ari"))
  }
}
