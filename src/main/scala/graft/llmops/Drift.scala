package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.BarrierOps
import graft.ops.Aggregates

/** Distribution-shift statistics for corpus audits: the tests an
  * operator runs before trusting that "today's crawl looks like
  * yesterday's" — a two-sample Kolmogorov–Smirnov statistic per
  * group, fixed-bin chi-square / Hellinger drift, and exact sign
  * tests with Benjamini–Hochberg false-discovery control across a
  * family of cells.
  *
  * Everything is engine-reproducible by construction: counts stay
  * integral until one terminal division, per-group sums fold in a
  * pinned order, sqrt is IEEE-correctly-rounded, and p-values are
  * exact dyadic rationals (the q228 binomial fold) — no libm CDFs
  * and no `ln` (not cross-engine reproducible, q57/q87 decision).
  *
  * Scale shape shared by all three: ONE corpus-sized hash
  * aggregation down to a (group × value/bin) count table, then all
  * window/fold work on that bounded frame. The global windows sit
  * above hash aggregates on bounded domains (a value histogram, the
  * test family) — the structural pattern `tools/plan_audit.py`
  * verifies.
  */
object Drift {

  /** Two-sample Kolmogorov–Smirnov statistic per group vs the REST
    * of the corpus over a discrete statistic `vCol`:
    * D_g = max_v |F_g(v) − F_rest(v)| with the achieving value
    * (smallest on ties). Exact — both ECDFs evaluate at every
    * distinct value, so no sup is missed between sample points.
    * Groups with an empty complement are dropped (no second sample).
    *
    * The corpus-sized work is one (group, value) count aggregation;
    * the ECDF windows run on the #groups × #values grid, which is
    * bounded by the statistic's support (a token count, a length
    * band), not by the corpus. Returns
    * (groupCol, n_grp, n_rest, ks_d, ks_at). */
  def ksByGroup(df: DataFrame, groupCol: String, vCol: String)
      : DataFrame = {
    // three consumers (per-group totals, per-value totals, grid
    // probe) — materialize the count table once; the broadcast build
    // of `cv` forces the checkpoint before the probe join runs
    val c = df.select(col(groupCol).as("g"), col(vCol).as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
      .barrier()
    val ng = c.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val cv = c.groupBy(col("v")).agg(sum(col("cnt")).as("c_all"))
    val tot = ng.agg(sum(col("n_g")).as("n_all"))
    val wg = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = ng.crossJoin(broadcast(cv))
      .join(c, Seq("g", "v"), "left")
      .withColumn("c_own", coalesce(col("cnt"), lit(0L)))
      .withColumn("cum_own", sum(col("c_own")).over(wg))
      .withColumn("cum_rest", sum(col("c_all") - col("c_own")).over(wg))
      .crossJoin(broadcast(tot))
      .withColumn("n_rest", col("n_all") - col("n_g"))
      .filter(col("n_rest") > 0)
      .withColumn("d",
        abs(col("cum_own").cast("double") / col("n_g").cast("double")
          - col("cum_rest").cast("double")
            / col("n_rest").cast("double")))
    val wmax = Window.partitionBy(col("g"))
    dd.withColumn("dmax", max(col("d")).over(wmax))
      .filter(col("d") === col("dmax"))
      .groupBy(col("g").as(groupCol), col("n_g").as("n_grp"),
        col("n_rest"), col("d").as("ks_d"))
      .agg(min(col("v")).as("ks_at"))
  }

  /** Fixed-bin drift per group vs the POOLED corpus: chi-square
    * divergence Σ_b (p_b − q_b)²/q_b and squared Hellinger distance
    * ½ Σ_b (√p_b − √q_b)² over Laplace-smoothed bin shares
    * p_b = (c_b + ½) / (n + B/2). Smoothing keeps empty bins on the
    * support, so every group folds over the SAME B terms in bin
    * order — deterministic doubles, and the drift of a group that
    * IS the corpus stays near zero instead of NaN.
    *
    * The log-free stand-ins for PSI/KL (libm `ln` is not
    * cross-engine reproducible): chi-square is PSI's second-order
    * expansion, Hellinger is bounded in [0, 1]. One corpus-sized
    * (group, bin) aggregation; the fold runs on #groups × B rows.
    * Returns (groupCol, n_docs, chi2_drift, hellinger_sq). */
  def binDrift(df: DataFrame, groupCol: String, binCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 1, s"binDrift: nBins=$nBins must be >= 1")
    val c = df.select(col(groupCol).as("g"), col(binCol).as("b"))
      .groupBy(col("g"), col("b")).agg(count(lit(1)).as("cnt"))
      .barrier()
    val ng = c.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val cb = c.groupBy(col("b")).agg(sum(col("cnt")).as("c_b"))
    val tot = ng.agg(sum(col("n_g")).as("n_all"))
    val bins = df.sparkSession.range(nBins).select(col("id").as("b"))
    val half = lit(nBins.toDouble / 2.0)
    val grid = ng.crossJoin(broadcast(bins))
      .join(c, Seq("g", "b"), "left")
      .withColumn("c_own", coalesce(col("cnt"), lit(0L)))
      .join(broadcast(cb), Seq("b"), "left")
      .withColumn("c_all", coalesce(col("c_b"), lit(0L)))
      .crossJoin(broadcast(tot))
    val p = (col("c_own").cast("double") + lit(0.5)) /
      (col("n_g").cast("double") + half)
    val q = (col("c_all").cast("double") + lit(0.5)) /
      (col("n_all").cast("double") + half)
    grid
      .withColumn("t_chi", (p - q) * (p - q) / q)
      .withColumn("t_hel", (sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q)))
      .groupBy(col("g").as(groupCol), col("n_g").as("n_docs"))
      .agg(Aggregates.orderedSum(col("b"), col("t_chi"))
          .as("chi2_drift"),
        (Aggregates.orderedSum(col("b"), col("t_hel")) * lit(0.5))
          .as("hellinger_sq"))
  }

  /** Which corpus cells have a shifted median? An exact sign test of
    * `vCol` against the GLOBAL lower median per cell, with
    * Benjamini–Hochberg false-discovery control across the family —
    * the multiple-testing discipline a per-(source, lang) audit
    * needs before flagging "shifted" cells at 100 TB (32 cells at
    * α = 0.1 flag ~3 by chance without it).
    *
    * Each cell tests a deterministic fixed-size probe (the `probe`
    * smallest doc-id hashes — the way a 100 TB audit actually runs,
    * and what keeps the binomial tail exact: the FINAL values C(m,k)
    * and 2^m stay in BIGINT for m ≤ 62, but the sequential-product
    * fold's intermediates `acc · (m−k+i)` reach C(62,31)·62 ≈ 2.6e19
    * > 2^63−1, so the fold runs in DECIMAL(38,0) — each step's
    * integral quotient is a binomial coefficient that fits a long,
    * only the pre-division product needs the headroom). p = min(1,
    * 2·P(X ≥ max(wins, losses))/1) with the binomial tail summed by
    * the integral sequential-product fold (q228); BH then ranks the
    * family by p and takes the tail-running-min of p·M/rank.
    *
    * Corpus-sized work: the value histogram for the median and the
    * per-cell hash ranking. Everything after is #cells-sized.
    * Returns (cellCols…, n_probe, m, wins, p_sign, p_bh, reject). */
  def medianShiftBhFdr(df: DataFrame, cellCols: Seq[String],
      idCol: String, vCol: String, probe: Int, alpha: Double)
      : DataFrame = {
    require(probe >= 1 && probe <= 62,
      s"medianShiftBhFdr: probe=$probe must be in [1, 62] " +
        "(exact dyadic p-values need 2^m and the tail sum in BIGINT; " +
        "the C(m,k) fold itself runs in DECIMAL because its " +
        "intermediates exceed BIGINT already at m = 62)")
    val cells = cellCols.map(col)
    // two corpus scans (median histogram, probe ranking) — one
    // materialization; the broadcast build of `med` forces it
    val base = df.select(cells ++ Seq(col(idCol).as("__id"),
        col(vCol).as("__v")): _*)
      .barrier()
    val vh = base.groupBy(col("__v")).agg(count(lit(1)).as("cnt"))
    val tot = vh.agg(sum(col("cnt")).as("n_all"))
    val wcum = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = vh.withColumn("cum", sum(col("cnt")).over(wcum))
      .crossJoin(broadcast(tot))
      .filter(col("cum") * 2 >= col("n_all") + 1)
      .agg(min(col("__v")).as("med"))
    val wcell = Window.partitionBy(cells: _*)
      .orderBy(TextOps.hash60(col("__id").cast("string")), col("__id"))
    val stats = base.withColumn("rn", row_number().over(wcell))
      .filter(col("rn") <= probe)
      .crossJoin(broadcast(med))
      .groupBy(cells: _*)
      .agg(count(lit(1)).as("n_probe"),
        coalesce(Aggregates.countIf(col("__v") =!= col("med")),
          lit(0L)).as("m"),
        coalesce(Aggregates.countIf(col("__v") > col("med")),
          lit(0L)).as("wins"))
    // exact two-sided binomial tail, q228's integral product fold.
    // The fold accumulates in DECIMAL(38,0): each step's quotient
    // acc·(m−k+i) div i is the binomial coefficient C(m−k+i, i) —
    // long-sized for m ≤ 62 — but the product BEFORE the division
    // peaks at C(m,k)·m ≈ 2.6e19 for m = 62, past 2^63−1 (non-ANSI
    // arithmetic would wrap silently and corrupt the BH ranking).
    val keyCols = cells ++ Seq(col("n_probe"), col("m"), col("wins"))
    val scored = stats
      .select(keyCols :+ explode(
        sequence(greatest(col("wins"), col("m") - col("wins")),
          col("m"))).as("k"): _*)
      .withColumn("cmk",
        when(col("k") === 0, lit(1L).cast("decimal(38,0)"))
          .otherwise(expr(
            "aggregate(sequence(1L, k), CAST(1 AS DECIMAL(38,0)), " +
              "(acc, i) -> CAST((acc * (m - k + i)) div i " +
              "AS DECIMAL(38,0)))")))
      .groupBy(keyCols: _*)
      .agg(sum(col("cmk")).cast("long").as("tail_sum"))
      .withColumn("p_sign", least(lit(1.0),
        lit(2.0) * col("tail_sum").cast("double") /
          expr("shiftleft(CAST(1 AS BIGINT), CAST(m AS INT))")
            .cast("double")))
      .barrier()
    val mm = scored.agg(count(lit(1)).as("m_tests"))
    val wRank = Window.orderBy(col("p_sign") +: cells: _*)
    val wTail = Window.orderBy(col("rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.crossJoin(broadcast(mm))
      .withColumn("rank", row_number().over(wRank))
      .withColumn("raw", col("p_sign") * col("m_tests").cast("double")
        / col("rank").cast("double"))
      .withColumn("p_bh", least(lit(1.0), min(col("raw")).over(wTail)))
      .withColumn("reject",
        when(col("p_bh") <= alpha, lit(1)).otherwise(lit(0)))
      .select(cells ++ Seq(col("n_probe"), col("m"), col("wins"),
        col("p_sign"), col("p_bh"), col("reject")): _*)
  }

  /** Split-conformal calibration of a per-row score, with the
    * coverage audit that justifies deploying it as a gate: a
    * deterministic hash split carves out a ~1/calibBuckets
    * calibration slice; the conformal threshold τ is the
    * ⌈(n_cal + 1) · keepNum/keepDen⌉-th smallest DISCRETIZED score
    * (floor(score · scaleTo) — bounded support keeps the order
    * statistic an aggregate + bounded cumsum instead of a global
    * sort, the same trick as [[medianShiftBhFdr]]'s median); the
    * remaining rows audit empirical coverage per group.
    * Exchangeability ⇒ P(score ≤ τ) ≥ keepNum/keepDen on average,
    * so a group whose coverage sits far below the target is NOT
    * exchangeable with the calibration slice — drifted.
    *
    * Corpus-sized work: one narrow projection (score, hash bit) and
    * two aggregations. Integer k via ceiling division; τ selection
    * and the coverage ratio are the only per-group outputs.
    * Returns (groupCol, tau, n_cal, n_eval, n_covered, coverage);
    * an empty calibration slice yields NULL τ and zero coverage,
    * and a non-empty slice too small for the rank yields the
    * τ = Long.MaxValue sentinel (+∞: full coverage — see
    * [[thresholdFromHistogram]]), identically in the oracle. */
  def conformalCoverage(df: DataFrame, idCol: String,
      groupCol: String, scoreCol: String, scaleTo: Int,
      calibBuckets: Int, keepNum: Int, keepDen: Int): DataFrame = {
    require(scaleTo >= 1 && calibBuckets >= 2,
      s"conformalCoverage: scaleTo=$scaleTo calibBuckets=" +
        s"$calibBuckets")
    val base = df.select(col(groupCol).as("g"),
        discretized(col(scoreCol), scaleTo).as("q"),
        isCalibration(col(idCol), calibBuckets).as("is_cal"))
      .barrier()
    val vh = base.filter(col("is_cal")).groupBy(col("q"))
      .agg(count(lit(1)).as("cnt"))
    val tau = thresholdFromHistogram(vh, keepNum, keepDen)
    base.filter(!col("is_cal"))
      .crossJoin(broadcast(tau))
      .groupBy(col("g").as(groupCol), col("tau"), col("n_cal"))
      .agg(count(lit(1)).as("n_eval"),
        coalesce(Aggregates.countIf(col("q") <= col("tau")),
          lit(0L)).as("n_covered"))
      .withColumn("coverage", col("n_covered").cast("double")
        / col("n_eval").cast("double"))
  }

  /** Mann–Whitney rank AUC per group vs the rest of the corpus: the
    * exact tie-corrected probability that a random row of the group
    * exceeds a random row of the complement (+ ½ per tie) — the
    * standard nonparametric EFFECT SIZE for "is this slice's
    * distribution stochastically larger", with Cliff's δ = 2·AUC − 1
    * alongside. No ranks are ever materialized: over the value
    * histogram, 2U = Σ_v c_own(v) · (2·rest_below(v) + rest_at(v))
    * stays integral (DECIMAL-summed so 100 TB corpus products cannot
    * overflow a long), and AUC is the single terminal division.
    * Same scale shape as [[ksByGroup]]: one corpus-sized (group,
    * value) aggregation, then bounded-grid windows.
    * Returns (groupCol, n_grp, n_rest, auc, cliffs_delta). */
  def rankAucByGroup(df: DataFrame, groupCol: String, vCol: String)
      : DataFrame = {
    val c = df.select(col(groupCol).as("g"), col(vCol).as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
      .barrier()
    val ng = c.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val cv = c.groupBy(col("v")).agg(sum(col("cnt")).as("c_all"))
    val tot = ng.agg(sum(col("n_g")).as("n_all"))
    val wg = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ng.crossJoin(broadcast(cv))
      .join(c, Seq("g", "v"), "left")
      .withColumn("c_own", coalesce(col("cnt"), lit(0L)))
      .withColumn("c_rest", col("c_all") - col("c_own"))
      .withColumn("cum_rest", sum(col("c_rest")).over(wg))
      .crossJoin(broadcast(tot))
      .withColumn("n_rest", col("n_all") - col("n_g"))
      .filter(col("n_rest") > 0)
      .withColumn("t", col("c_own").cast("decimal(38,0)") *
        (lit(2L) * (col("cum_rest") - col("c_rest")) + col("c_rest"))
          .cast("decimal(38,0)"))
      .groupBy(col("g").as(groupCol), col("n_g").as("n_grp"),
        col("n_rest"))
      .agg(sum(col("t")).as("u2"))
      .withColumn("auc", col("u2").cast("double") /
        (lit(2.0) * (col("n_grp").cast("double")
          * col("n_rest").cast("double"))))
      .withColumn("cliffs_delta", lit(2.0) * col("auc") - lit(1.0))
      .drop("u2")
  }

  /** Energy distance (Székely) per group vs the rest:
    * 2·E|X−Y| − E|X−X'| − E|Y−Y'|, zero iff the two distributions
    * coincide and sensitive to every moment (KS catches location,
    * energy also catches spread/shape). Exact over the discrete
    * support: the three expectations are integral sums over the
    * bounded value-pair grid (#groups × |V|² rows — support-bounded,
    * never corpus²), DECIMAL-summed, with three terminal divisions.
    * Returns (groupCol, n_grp, n_rest, energy). */
  def energyDistanceByGroup(df: DataFrame, groupCol: String,
      vCol: String): DataFrame = {
    val c = df.select(col(groupCol).as("g"), col(vCol).as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
      .barrier()
    val ng = c.groupBy(col("g")).agg(sum(col("cnt")).as("n_g"))
    val cv = c.groupBy(col("v")).agg(sum(col("cnt")).as("c_all"))
    val tot = ng.agg(sum(col("n_g")).as("n_all"))
    val h = ng.crossJoin(broadcast(cv))
      .join(c, Seq("g", "v"), "left")
      .withColumn("c_own", coalesce(col("cnt"), lit(0L)))
      .withColumn("c_rest", col("c_all") - col("c_own"))
      .select(col("g"), col("n_g"), col("v"), col("c_own"),
        col("c_rest"))
      .barrier() // both sides of the value-pair self-join
    val pairs = h
      .select(col("g"), col("n_g"), col("v").as("u"),
        col("c_own").as("au"), col("c_rest").as("bu"))
      .join(broadcast(h.select(col("g"), col("v"),
        col("c_own").as("av"), col("c_rest").as("bv"))), Seq("g"))
      .withColumn("dist", abs(col("u") - col("v")))
    pairs.groupBy(col("g"), col("n_g"))
      .agg(
        sum(col("au").cast("decimal(38,0)") * col("av") * col("dist"))
          .as("sa"),
        sum(col("bu").cast("decimal(38,0)") * col("bv") * col("dist"))
          .as("sb"),
        sum(col("au").cast("decimal(38,0)") * col("bv") * col("dist"))
          .as("sc"))
      .crossJoin(broadcast(tot))
      .withColumn("n_rest", col("n_all") - col("n_g"))
      .filter(col("n_rest") > 0)
      .select(col("g").as(groupCol), col("n_g").as("n_grp"),
        col("n_rest"),
        (lit(2.0) * col("sc").cast("double")
            / (col("n_g").cast("double") * col("n_rest").cast("double"))
          - col("sa").cast("double")
            / (col("n_g").cast("double") * col("n_g").cast("double"))
          - col("sb").cast("double")
            / (col("n_rest").cast("double")
              * col("n_rest").cast("double"))).as("energy"))
  }

  /** floor(score · scaleTo) — the bounded-support discretization all
    * conformal pieces share. */
  private def discretized(score: org.apache.spark.sql.Column,
      scaleTo: Int): org.apache.spark.sql.Column =
    floor(score * lit(scaleTo.toDouble)).cast("long")

  /** The deterministic calibration-split predicate: hash bucket 0 of
    * calibBuckets. */
  private def isCalibration(id: org.apache.spark.sql.Column,
      calibBuckets: Int): org.apache.spark.sql.Column =
    pmod(TextOps.hash60(id.cast("string")),
      lit(calibBuckets.toLong)) === 0

  /** Discretized calibration histogram (q, cnt) of `df` — the entire
    * state a streaming recalibrator has to maintain: bounded by the
    * score support (≤ 2·scaleTo+1 rows), additive under batch union,
    * and sufficient for [[thresholdFromHistogram]]. */
  def calibHistogram(df: DataFrame, idCol: String, scoreCol: String,
      scaleTo: Int, calibBuckets: Int): DataFrame = {
    require(scaleTo >= 1 && calibBuckets >= 2,
      s"calibHistogram: scaleTo=$scaleTo calibBuckets=$calibBuckets")
    df.filter(isCalibration(col(idCol), calibBuckets))
      .groupBy(discretized(col(scoreCol), scaleTo).as("q"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Conformal threshold from a (q, cnt) calibration histogram: the
    * ⌈(n_cal + 1) · keepNum/keepDen⌉-th smallest discretized score,
    * via a cumsum over the bounded histogram. One-row frame
    * (tau, n_cal); NULL τ on an empty histogram. When the slice is
    * non-empty but too small for the rank — ⌈(n_cal+1)·keep⌉ > n_cal,
    * i.e. n_cal < keepNum/(keepDen−keepNum) — split conformal defines
    * τ = +∞ (every score conforms), so τ is the Long.MaxValue
    * sentinel and coverage degrades CONSERVATIVELY to 1, not to the
    * fail-closed 0 a NULL τ would produce (q ≤ NULL is never true —
    * every small calibration slice would read as maximally
    * drifted). */
  def thresholdFromHistogram(vh: DataFrame, keepNum: Int,
      keepDen: Int): DataFrame = {
    require(keepNum >= 1 && keepDen > keepNum,
      s"thresholdFromHistogram: keep=$keepNum/$keepDen")
    val nc = vh.agg(sum(col("cnt")).as("n_cal"))
    val wcum = Window.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vh.withColumn("cum", sum(col("cnt")).over(wcum))
      .crossJoin(broadcast(nc))
      .agg(
        min(when(col("cum") >=
          expr(s"((n_cal + 1) * $keepNum + ${keepDen - 1}) " +
            s"div $keepDen"), col("q"))).as("tau_sel"),
        min(col("n_cal")).as("n_cal"))
      .select(
        coalesce(col("tau_sel"),
          when(col("n_cal") > 0, lit(Long.MaxValue))).as("tau"),
        col("n_cal"))
  }
}
