package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Checkpoints.BarrierOps

/** Reusable aggregation building blocks (SURVEY.md §2.5).
  *
  * Numeric policy for oracle parity: floating-point SUMs are order-dependent
  * under shuffle, so any aggregate that must hash-match an external oracle is
  * computed over an exact DECIMAL cast (order-independent), then cast back to
  * DOUBLE so the output dtype is engine-neutral. Derived ratios divide the
  * exact decimal sums in IEEE double, which is deterministic.
  */
object Aggregates {

  /** Exact, order-independent sum of a double column: sum as DECIMAL then
    * present as DOUBLE. `scale` decimals are kept before summing. */
  def decSum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Conditional row count: the reference's accessed-file-count idiom
    * `sum(when(cond, 1).otherwise(0))` (rucio_datasets_stats.py:317-319). */
  def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  /** Ordered left fold of a double column — the engine's
    * deterministic-sum idiom for values that CANNOT go through the
    * decimal route (products of scores, probabilities): 0.0-seeded
    * Σ x over the group's rows sorted by `ord` (which must be unique
    * per group), so association order is fixed by the sort, never by
    * partition arrival, and any engine folding in the same order
    * reproduces the double bit-for-bit. DuckDB mirror:
    * `list_reduce(list_prepend(0.0, list(x ORDER BY ord)), (a,b)->a+b)`.
    * One shared definition — LanguageModel / Mixture raking /
    * Retrieval RM3 all fold through here, so the idiom cannot drift
    * per call site. */
  def orderedSum(ord: Column, x: Column): Column =
    aggregate(
      transform(sort_array(collect_list(struct(ord.as("o"),
        x.as("v")))),
        s => s.getField("v")),
      lit(0.0), (acc, v) => acc + v)

  /** Deterministic mean of a double column: exact decimal sum, ONE
    * IEEE division, NO rounding — `round(x, n)` on a rational that
    * lands exactly on a half-tie (e.g. 0.2878125 at n=6) is broken
    * differently by different engines; the unrounded division of
    * identical operands is bit-exact everywhere. */
  def decAvg(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1))

  /** Ratio-of-sums, the cpu-efficiency idiom
    * `100*sum(CpuTimeHr)/sum(CoreTime)` (condor_cpu_efficiency.py:394-417).
    * Exact decimal sums; unrounded IEEE arithmetic (see decAvg note).
    * A zero denominator yields NULL — the reference's `rate` UDF
    * returns 'N/A' there (utils.py), and under ANSI mode (Spark 4
    * default) an unguarded division would throw DIVIDE_BY_ZERO on the
    * first all-zero group. */
  def ratioOfSums(num: Column, den: Column, factor: Double = 100.0): Column = {
    val d = sum(den.cast(DecimalType(18, 4))).cast("double")
    when(d === 0.0, lit(null).cast("double"))
      .otherwise(lit(factor) * sum(num.cast(DecimalType(18, 4)))
        .cast("double") / d)
  }

  /** Coalesce-by-priority: first non-null across sources
    * (rucio_datasets_stats.py:269-274 uses when-chains for the same). */
  def coalescePriority(cols: Column*): Column = coalesce(cols: _*)

  /** Deterministic "carry a functionally-dependent column through groupBy":
    * the reference uses non-deterministic `first()`
    * (rucio_datasets_stats.py:320); we use `min` for oracle parity. */
  def carry(c: Column): Column = min(c)

  /** Exact discrete quantiles per group: for each quantile q = num/den,
    * the group's value at rank ceil(q·n) in (valueCol, tieCol) order —
    * the "disc" definition (an actual data value, no interpolation, so
    * no float arithmetic and every engine agrees bit-for-bit; exact
    * median/p90/p99 of token counts per language is the canonical
    * corpus-stats use). One row per group, one column per requested
    * quantile plus `n_rows`.
    *
    * Shape: one exchange on the group key, WindowExec rank + count
    * (sorts/spills per group), then a hash agg folds the rank hits to
    * one row. Exactness costs the per-group sort; the approximate
    * 100 TB path is `approx_percentile` (engine-specific sketch →
    * rows-only verification, q55 precedent) — this is the exact path
    * for when the cut feeds a reproducible gate. Quantiles are given
    * as integer fractions to keep rank arithmetic in exact Long math:
    * ceil(num·n/den) = (num·n + den - 1) div den. */
  def quantilesDisc(df: org.apache.spark.sql.DataFrame, groupCol: String,
      valueCol: String, tieCol: String,
      qs: Seq[(String, Int, Int)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byGroup = Window.partitionBy(col(groupCol))
    val ranked = df
      .withColumn("__rn",
        row_number().over(byGroup.orderBy(col(valueCol), col(tieCol))))
      .withColumn("__n", count(lit(1)).over(byGroup))
    val qCols = qs.map { case (name, num, den) =>
      max(when(col("__rn") ===
          expr(s"(${num}L * __n + ${den - 1}L) div ${den}L"),
        col(valueCol))).as(name)
    }
    ranked.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_rows"), qCols: _*)
  }

  /** Exact weighted median per group over INTEGER value and weight
    * columns: the smallest value (in (value, tie) order) whose running
    * weight reaches half the group's total —
    * `2·cumsum(w) ≥ Σw AND 2·(cumsum(w) − w) < Σw` picks exactly one
    * row per group, in pure integer arithmetic (no 0.5·Σw double, no
    * rounding seam). The weighted generalization of
    * [[quantilesDisc]]: "median doc length weighted by token mass" is
    * a different (and usually more honest) corpus statistic than the
    * unweighted median when lengths are heavy-tailed.
    *
    * Shape: one exchange on the group key; cumsum and group total are
    * two frames over the SAME window order (one WindowExec, spills on
    * monster groups); the threshold filter leaves one row per group —
    * no second aggregation. */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, tieCol: String): DataFrame = {
    val order = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
    val cum = sum(col(weightCol)).over(
      order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val tot = sum(col(weightCol)).over(
      Window.partitionBy(col(groupCol))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    df.select(col(groupCol), col(valueCol), col(weightCol),
        col(tieCol), cum.as("__cum"), tot.as("__tot"))
      .filter(col("__cum") * 2 >= col("__tot") &&
        (col("__cum") - col(weightCol)) * 2 < col("__tot"))
      .select(col(groupCol), col(valueCol).as("w_median"),
        col("__tot").as("total_weight"))
  }

  /** Exact weighted quantiles per group: for each q = num/den, the
    * smallest value (in (value, tie) order) whose running weight
    * reaches q of the group total — `den·cumw ≥ num·totw AND
    * den·(cumw − w) < num·totw` picks exactly one row per quantile,
    * in pure integer arithmetic ([[weightedMedian]] is the
    * num/den = 1/2 case). "p90 doc length weighted by token mass"
    * answers where the TOKENS live, which a row-weighted p90 does not.
    * One exchange on the group key; cumsum and total share the sort;
    * each quantile is a conditional max in ONE final hash agg. */
  def weightedQuantiles(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String, tieCol: String,
      qs: Seq[(String, Int, Int)]): DataFrame = {
    val order = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
    val cum = sum(col(weightCol)).over(
      order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val tot = sum(col(weightCol)).over(
      Window.partitionBy(col(groupCol))
        .rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing))
    val w = df.select(col(groupCol), col(valueCol), col(weightCol),
      cum.as("__cum"), tot.as("__tot"))
    val qCols = qs.map { case (name, num, den) =>
      max(when(
        col("__cum") * den >= col("__tot") * num &&
          (col("__cum") - col(weightCol)) * den < col("__tot") * num,
        col(valueCol))).as(name)
    }
    w.groupBy(col(groupCol))
      .agg(max(col("__tot")).as("total_weight"), qCols: _*)
  }

  /** Robust outlier gate: per-group median / MAD (median absolute
    * deviation) over an INTEGER value column, flagging values with
    * `|x − median| > k·MAD` — the heavy-tail-safe alternative to
    * z-scores (mean/stddev are themselves dragged by the outliers
    * they're supposed to find, and stddev needs a double sqrt; median
    * and MAD stay in exact integer arithmetic end to end). Medians are
    * the lower median (rank `(n+1) div 2` — q83's convention).
    *
    * Shape: two ranked window passes (each one exchange on the group
    * key) + one broadcast-able join of the per-group scalars back, one
    * final hash agg. Output per group: n_rows, median, mad,
    * n_outliers. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String, k: Int = 3): DataFrame = {
    def lowerMedian(in: DataFrame, vCol: String, out: String)
        : DataFrame = {
      val w = Window.partitionBy(col(groupCol))
        .orderBy(col(vCol), col(tieCol))
      val n = Window.partitionBy(col(groupCol))
        .rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
      in.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(n))
        .filter(expr("__rn = (__n + 1) div 2"))
        .select(col(groupCol), col(vCol).as(out))
    }
    val med = lowerMedian(
      df.select(col(groupCol), col(valueCol), col(tieCol)),
      valueCol, "median")
    val devs = df.select(col(groupCol), col(valueCol), col(tieCol))
      .join(med, Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("median")))
    val mad = lowerMedian(devs, "__dev", "mad")
    devs.join(mad, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        max(col("median")).as("median"),
        max(col("mad")).as("mad"),
        countIf(col("__dev") > lit(k) * col("mad")).as("n_outliers"))
  }

  /** Gini concentration coefficient per group over an INTEGER value
    * column: `G = (2·Σ rⱼ·xⱼ − (n+1)·Σxⱼ) / (n·Σxⱼ)` with xⱼ ascending
    * (rank r from a (value, tie) total order). The single-number "is
    * this corpus dominated by a few giant docs/sources?" diagnostic.
    * Numerator and denominator are exact DECIMAL(38,0) integers; the
    * one IEEE division is deterministic on identical operands. All-zero
    * groups → null, never a divide error.
    *
    * Shape: one exchange on the group key (ranking window), one hash
    * agg. */
  def giniCoefficient(df: DataFrame, groupCol: String,
      valueCol: String, tieCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(tieCol))
    val g = df.select(col(groupCol), col(valueCol), col(tieCol))
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(d38)).as("sx"),
        sum(col("__rn").cast(d38) * col(valueCol).cast(d38)).as("srx"))
    val num = lit(2).cast(d38) * col("srx") -
      (col("n").cast(d38) + 1) * col("sx")
    val den = col("n").cast(d38) * col("sx")
    g.select(col(groupCol), col("n").as("n_rows"),
      when(col("sx") === 0, lit(null).cast("double"))
        .otherwise(num.cast("double") / den.cast("double")).as("gini"))
  }

  /** Per-key Pearson correlation over INTEGER (x, y) columns, exact
    * until the final IEEE ops:
    *
    *   r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
    *
    * Five DECIMAL(38,0) sums (order-independent), exact integer
    * numerator and variance terms, then two correctly-rounded square
    * roots and one division — deterministic on identical operands in
    * any engine, unlike built-in `corr()` whose double accumulation
    * is partition-order-dependent. Zero variance on either side →
    * null. Same single-hash-agg shape as [[groupTrendSlope]]. */
  def groupPearson(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame =
    groupPearson(df, Seq(keyCol), xCol, yCol)

  /** Multi-key variant — same contract, composite grouping key (used
    * by the q144 correlation matrix, keyed on the metric PAIR). */
  def groupPearson(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val x = col(xCol).cast(d38)
    val y = col(yCol).cast(d38)
    val g = df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"),
      sum(y * y).as("syy"))
    val n = col("n").cast(d38)
    val num = n * col("sxy") - col("sx") * col("sy")
    val dx = n * col("sxx") - col("sx") * col("sx")
    val dy = n * col("syy") - col("sy") * col("sy")
    g.select(keyCols.map(col) :+ col("n") :+
      when(dx === 0 || dy === 0, lit(null).cast("double"))
        .otherwise(num.cast("double") /
          (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))))
        .as("pearson_r"): _*)
  }

  /** Exact trailing rolling median over INTEGER values on an integer
    * grid: RANGE frame [x − span + 1, x], window contents collected
    * and sorted IN-ROW (bounded by span — never a per-key global
    * sort), median = avg of the two middle ranks (exact: .5 is
    * representable; odd windows collapse both ranks to the middle).
    * The engine-neutral form of `median() OVER (RANGE ...)`, whose
    * result dtype differs between engines. */
  def rollingMedian(df: DataFrame, keyCol: String, xCol: String,
      valCol: String, span: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(xCol))
      .rangeBetween(-(span - 1), 0)
    val arr = sort_array(collect_list(col(valCol)).over(w))
    val sz = size(arr)
    val lo = element_at(arr, ((sz + 1) / 2).cast("int"))
    val hi = element_at(arr, (sz / 2 + 1).cast("int"))
    df.select(col(keyCol), col(xCol), col(valCol),
      ((lo.cast("double") + hi.cast("double")) / 2).as("roll_median"))
  }

  /** Winsorized mean over INTEGER values: values clipped at the exact
    * p05/p95 rank values (disc definition, integer rank math:
    * ceil(q·n) = (q·n rounded up) via integer division), then an
    * exact-decimal mean — the outlier-robust mean that, unlike
    * trimming, keeps n constant. One ranked window + one conditional
    * agg + one key join (cuts table is one row per group — AQE
    * broadcasts it when groups are few); ranks give totality (every
    * non-empty group has both cut values by construction). */
  def winsorizedMean(df: DataFrame, keyCol: String, valCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(valCol), col(tieCol))
    // ranked feeds BOTH the cuts aggregation and the clip-mean join;
    // the lazy localCheckpoint materializes the scan + window once
    // (either consumer alone would otherwise re-run them)
    val ranked = df.select(col(keyCol), col(valCol),
      row_number().over(w).as("rn"),
      count(lit(1)).over(Window.partitionBy(col(keyCol))).as("n"))
      .barrier()
    val cuts = ranked
      .groupBy(col(keyCol))
      .agg(
        min(when(col("rn") === expr("(n + 19) div 20"), col(valCol)))
          .as("lo"),
        min(when(col("rn") === expr("(n * 19 + 19) div 20"),
          col(valCol))).as("hi"),
        max(col("n")).as("n"))
    // join the RANKED rows (they carry keyCol + valCol) back to the
    // cuts, not the raw input — one scan of df total, the window's
    // exchange feeds both the cuts and the clip-mean
    ranked.select(col(keyCol), col(valCol)).join(cuts, keyCol)
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"), max(col("lo")).as("p05"),
        max(col("hi")).as("p95"),
        decAvg(least(greatest(col(valCol), col("lo")), col("hi")))
          .as("wins_mean"))
  }

  /** Per-key OLS regression diagnostics over INTEGER (x, y): slope,
    * intercept, RMSE, and the count of 3σ residual outliers — the
    * "which keys have a trend that does NOT explain their data"
    * question ([[groupTrendSlope]] reports the trend; this reports
    * where the fit breaks). Determinism chain: slope from exact
    * DECIMAL sums (one division), intercept from the same sums (one
    * more), each residual three IEEE ops on identical operands, and
    * the residual-square sum goes through the decimal cast (order-
    * independent) before ONE sqrt. Constant-x keys (undefined slope)
    * are excluded. Two passes over the rows (sums, then residuals
    * via one key join) — never a window. */
  def regressionOutliers(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val x = col(xCol).cast(d38)
    val y = col(yCol).cast(d38)
    val g = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"))
    val n = col("n").cast(d38)
    val den = n * col("sxx") - col("sx") * col("sx")
    val fit = g
      .filter(den =!= 0)
      .select(col(keyCol), col("n"),
        ((n * col("sxy") - col("sx") * col("sy")).cast("double") /
          den.cast("double")).as("b"),
        col("sx").cast("double").as("sxd"),
        col("sy").cast("double").as("syd"))
      .select(col(keyCol), col("n"), col("b"),
        ((col("syd") - col("b") * col("sxd")) / col("n")).as("a"))
    val res = df.join(fit, keyCol)
      .select(col(keyCol), col("n"), col("a"), col("b"),
        (col(yCol).cast("double") - col("a") -
          col("b") * col(xCol).cast("double")).as("res"))
    // DECIMAL(38,6): |res| up to 10^16 squares without overflow —
    // (18,6) would blow up (ANSI throw) at |res| > 10^6, i.e. exactly
    // on the off-trend rows the 3σ gate exists to catch
    val rmse = res.groupBy(col(keyCol))
      .agg(sqrt(sum((col("res") * col("res"))
        .cast(DecimalType(38, 6))).cast("double") / count(lit(1)))
        .as("rmse"))
    res.join(rmse, keyCol)
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"), max(col("a")).as("intercept"),
        max(col("b")).as("slope"), max(col("rmse")).as("rmse"),
        countIf(abs(col("res")) > lit(3.0) * col("rmse"))
          .as("n_outliers"))
  }

  /** Per-key dispersion index (variance-to-mean ratio) over INTEGER
    * values — the burstiness diagnostic: ~1 means Poisson-like
    * arrivals, >1 means bursty (e.g. daily event counts that spike).
    * Population variance over mean, reduced to one exact integer
    * fraction:
    *
    *   VMR = ((n·Σv² − (Σv)²) / n²) / (Σv / n) = (n·Σv² − (Σv)²) / (n·Σv)
    *
    * Three DECIMAL(38,0) sums in one hash agg, one IEEE division at
    * the end (bit-identical cross-engine). Keys whose values sum to
    * zero → NULL (mean 0 has no ratio). */
  def dispersionIndex(df: DataFrame, keyCol: String,
      valCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val v = col(valCol).cast(d38)
    val g = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"))
    val n = col("n").cast(d38)
    val num = n * col("s2") - col("s1") * col("s1")
    val den = n * col("s1")
    g.select(col(keyCol), col("n"),
      when(den === 0, lit(null).cast("double"))
        .otherwise(num.cast("double") / den.cast("double")).as("vmr"))
  }

  /** Per-key mode (most frequent value) with a total tie-break:
    * highest count wins, ties broken by the SMALLEST value. Two hash
    * aggregations — (key, value) counts, then a struct-min per key —
    * and no window function, so no per-key sort and no single-partition
    * risk regardless of key or value cardinality. The struct min orders
    * by (−count, value), which is exactly (count desc, value asc).
    * NULL values are IGNORED (standard aggregate semantics) — without
    * the filter, Spark's struct comparison would rank a null value
    * FIRST in a tie while a rank-based engine formulation ranks it
    * last, a silent cross-engine divergence on nullable columns. Keys
    * whose values are all null drop out, as with min/max. */
  def groupMode(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol), col(valCol))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(keyCol))
      .agg(min(struct((-col("cnt")).as("neg"), col(valCol).as("v")))
        .as("best"))
      .select(col(keyCol), col("best.v").as(s"mode_$valCol"),
        (-col("best.neg")).as("n_mode"))

  /** Per-key OLS trend slope over INTEGER (x, y) columns, exact until
    * the final division:
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * All five sums accumulate in DECIMAL(38,0) (order-independent —
    * a double Σxy differs run to run under shuffle), the numerator and
    * denominator are exact integer products, and only the final
    * quotient is IEEE — deterministic on identical operands in any
    * engine (DuckDB's HUGEINT path produces the same integers). A key
    * whose x never varies has denominator 0 → slope null, never a
    * divide error. One hash aggregation, no window, no second pass —
    * the per-entity trend/drift metric over an event stream. */
  def groupTrendSlope(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val g = df.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      sum(col(xCol).cast(d38)).as("sx"),
      sum(col(yCol).cast(d38)).as("sy"),
      sum((col(xCol).cast(d38) * col(yCol).cast(d38))).as("sxy"),
      sum((col(xCol).cast(d38) * col(xCol).cast(d38))).as("sxx"))
    val num = col("n").cast(d38) * col("sxy") - col("sx") * col("sy")
    val den = col("n").cast(d38) * col("sxx") - col("sx") * col("sx")
    g.select(col(keyCol), col("n"),
      when(den === 0, lit(null).cast("double"))
        .otherwise(num.cast("double") / den.cast("double")).as("slope"))
  }
}
