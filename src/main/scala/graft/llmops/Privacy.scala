package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential-privacy release primitives for corpus metadata.
  *
  * A curated-corpus release ships aggregate statistics (per-language /
  * per-source counts, length histograms) alongside the data; when the
  * underlying rows are user-contributed, those exact counts can leak
  * membership. The standard fix for integer counting queries is the
  * geometric mechanism (Ghosh–Roughgarden–Sundararajan, "Universally
  * utility-maximizing privacy mechanisms", STOC'09): add two-sided
  * geometric noise with P(k) ∝ α^|k|, which is ε-DP for counting
  * queries (L1 sensitivity 1) at ε = −ln α.
  *
  * Engine constraints shape the implementation:
  *
  *  - libm `ln`/`exp` are not cross-engine reproducible (q57/q87
  *    decision), so the noise is sampled with INTEGER-ONLY bit
  *    arithmetic: a Geometric(1/2) variable is exactly the number of
  *    trailing zero bits of a uniform random integer, and the
  *    difference of two iid Geometric(1/2) draws is exactly the
  *    two-sided geometric with α = 1/2 — i.e. ε = ln 2 per release,
  *    with zero floating-point involved.
  *  - The "uniform" bits come from the engine-wide keyed 60-bit md5
  *    hash ([[TextOps.hash60]]) of the class key + a release salt:
  *    30 bits per geometric draw. Keyed noise is PSEUDOrandom — the
  *    derandomization every replayable pipeline uses (the same release
  *    re-run must publish the same numbers, and the oracle must agree
  *    bit-for-bit); the DP guarantee is inherited under the standard
  *    assumption that md5 output is indistinguishable from uniform to
  *    the adversary, and a fresh salt per release epoch prevents noise
  *    reuse across releases (which would average out).
  *
  * Scale shape: the noise is a per-ROW projection over the (small)
  * aggregated class table — the corpus-sized work is the one counting
  * aggregation that precedes it. Nothing here shuffles.
  */
object Privacy {

  /** Trailing-zero count of the low 30 bits of `chunk` (a value in
    * [0, 2^30)): the bit-exact Geometric(1/2) draw. Implemented over
    * `bin()` strings — `bin` renders the minimal binary form in both
    * engines, so setting a sentinel bit at 2^30 makes the trailing-zero
    * run well-defined (and caps the draw at 30) even for chunk = 0. */
  private def geometric30(chunk: Column): Column = {
    val y = bin(chunk + lit(1073741824L))
    (length(y) - length(rtrim(y, "0"))).cast("long")
  }

  /** Two-sided geometric (discrete Laplace) noise with α = 1/2
    * (ε = ln 2 for unit-sensitivity counts), derandomized by
    * hash60(key): noise = G1 − G2 with G1 from the low 30 hash bits
    * and G2 from the next 30. Integer-only; bit-identical in any
    * engine with md5 + bin. */
  def geometricNoise(key: Column): Column = {
    val h = TextOps.hash60(key)
    geometric30(h.bitwiseAND(lit(1073741823L))) -
      geometric30(shiftright(h, 30))
  }

  /** ε=ln2-DP noisy counting release over `keyCols` classes, with
    * small-count suppression: classes whose NOISY count lands below
    * `minRelease` publish NULL (suppression decided on the noisy
    * value, so the decision itself leaks nothing beyond the DP
    * output). `n_true` and `noise` ride along as AUDIT columns for
    * the calibration view this query is — a production release
    * projects them away. */
  def dpNoisyCounts(df: DataFrame, keyCols: Seq[String], salt: String,
      minRelease: Long = 5L): DataFrame =
    dpNoisyFromCounts(
      df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n_true")),
      keyCols, salt, minRelease)

  /** [[dpNoisyCounts]] over an ALREADY-aggregated class table
    * (`keyCols` + `n_true`) — the form an incrementally-maintained
    * count store publishes through (`Streams.noisyClassCounts`).
    * Because the noise is keyed by (class, salt) only, the noisy view
    * over streamed counts is bit-identical to the batch release over
    * the same data — the law StreamingSpec pins. */
  def dpNoisyFromCounts(cls: DataFrame, keyCols: Seq[String],
      salt: String, minRelease: Long = 5L): DataFrame = {
    val key = concat_ws("|", keyCols.map(col) :+ lit(salt): _*)
    cls
      .withColumn("noise", geometricNoise(key))
      .withColumn("n_noisy", col("n_true") + col("noise"))
      .withColumn("suppressed", col("n_noisy") < minRelease)
      .withColumn("n_released",
        when(!col("suppressed"), col("n_noisy")))
  }

  /** k-anonymization by ladder generalization — the op that FIXES a
    * failing k-anonymity audit (q247 measures; this releases): per
    * row, the numeric quasi-identifier `valueCol` is coarsened down a
    * deterministic band ladder (`divisors`, finest first), and the
    * row is released at the FINEST level whose equivalence class
    * (`classCols` + band) reaches size ≥ k. The last ladder rung
    * drops the band entirely (class = `classCols` alone); rows whose
    * class is still below k there are suppressed — the standard
    * generalize-then-suppress scheme (cf. Samarati/Sweeney
    * k-anonymity; the per-row finest-passing-level rule is the
    * single-attribute ladder special case).
    *
    * Returns one row per input row: id, classCols, `level` (ladder
    * index; |divisors| = band dropped, |divisors|+1 = suppressed),
    * `band` (generalized value, NULL once the band is dropped),
    * `class_size` (0 when suppressed), `suppressed`.
    *
    * Scale shape: one |divisors|+1-way row-local fan-out, ONE window
    * count over (level, class) — spillable, no self-join — a min-agg
    * per row, and one join back on (id, level). Everything is
    * corpus × ladder-sized; no driver paths. */
  def kAnonymizeBands(df: DataFrame, idCol: String,
      classCols: Seq[String], valueCol: String,
      divisors: Seq[Long] = Seq(1000L, 2000L, 4000L, 8000L),
      k: Long = 5L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val levels = divisors.zipWithIndex
      .map { case (d, i) => (i, Option(d)) } :+
      ((divisors.size, Option.empty[Long]))
    val lv = levels.toDF("level", "divisor")
    val cls = classCols.map(col)
    val rl = df
      .select((col(idCol) +: cls :+ col(valueCol)): _*)
      .crossJoin(broadcast(lv))
      .withColumn("band",
        when(col("divisor").isNotNull,
          floor(col(valueCol) / col("divisor").cast("double"))
            .cast("long")))
    val sized = rl.withColumn("class_size",
      count(lit(1)).over(Window.partitionBy(
        (col("level") +: cls :+ col("band")): _*)))
    val passing = sized.filter(col("class_size") >= k)
    val finest = passing
      .groupBy(col(idCol)).agg(min(col("level")).as("level"))
    val sel = passing
      .join(finest, Seq(idCol, "level"))
      .select(col(idCol), col("level"), col("band"),
        col("class_size"))
    df.select((col(idCol) +: cls): _*)
      .join(sel, Seq(idCol), "left")
      .select((col(idCol) +: cls) ++ Seq(
        coalesce(col("level"), lit(divisors.size + 1)).as("level"),
        col("band"),
        coalesce(col("class_size"), lit(0L)).as("class_size"),
        col("class_size").isNull.as("suppressed")): _*)
  }
}
