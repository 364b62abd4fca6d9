package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *    the adversary, and a fresh salt PER RELEASE (not per epoch — two
  *    releases inside one epoch under one salt would reuse noise)
  *    prevents draws from repeating across releases. As defense in
  *    depth, every release form also folds a MECHANISM TAG into the
  *    hashed key (`cnt`, `cnt:u<m>`, `sum:c<clip>`, `sum:c<clip>:u<m>`),
  *    so even a mistakenly-shared salt never gives two DIFFERENT
  *    release forms (counts vs sums, clamped vs unclamped) the same
  *    draw over the same classes — without the tag, subtracting the
  *    two published values would cancel the noise and reveal the exact
  *    difference of the true statistics noiselessly. The tag does NOT
  *    make salt reuse safe for the SAME form re-released over changed
  *    data (that is still ε-additive at best); it closes the
  *    cross-form cancellation channel only.
  *
  * Caveats the guarantee carries (stated, not hidden):
  *
  *  - **The salt must be SECRET and high-entropy.** The noise is a
  *    deterministic function of (class key, salt); an adversary who
  *    knows the salt recomputes the noise exactly and recovers the
  *    true count, reducing ε to zero. The shippable `dp_release` job
  *    therefore REFUSES to run without an explicit `--salt` and
  *    projects the audit columns (`n_true`, `noise`) away; only
  *    library callers building calibration views see them.
  *  - **Truncation delta.** Each geometric draw is capped at 30 (the
  *    30-bit budget per side), so the release is (ε, δ)-DP with
  *    δ ≈ 2·2⁻³¹ ≈ 10⁻⁹ rather than pure ε-DP — the probability mass
  *    of the clipped tail.
  *  - **Unit of privacy.** [[dpNoisyCounts]] is ε-DP at ROW level
  *    (add/remove one row). When one contributor can own many rows —
  *    every web corpus — use [[dpUserLevelCounts]], which bounds each
  *    contributor to m rows first and releases with a stated
  *    user-level ε = m·ln 2 (sequential composition over the ≤ m
  *    affected unit-sensitivity coordinates).
  *
  * Scale shape: the noise is a per-ROW projection over the (small)
  * aggregated class table — the corpus-sized work is the one counting
  * aggregation that precedes it (plus, for the user-level form, one
  * spillable per-contributor window). Nothing else shuffles.
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

  /** NULL-explicit, length-prefixed encoding of a class key: each
    * column renders as `v<len>:<value>` (or the bare sentinel `n`
    * when NULL), concatenated. Unambiguous by construction — the
    * length prefix stops a value containing a separator character
    * from colliding two distinct classes into one noise draw, and
    * the sentinel keeps NULL keys noised (a bare `concat_ws` would
    * silently SKIP NULLs, and the matching `a || '|' || b` oracle
    * expression would NULL the noise out entirely). Mirrored
    * verbatim in the q276/q281/q285 DuckDB SQL. */
  def classKey(keyCols: Seq[String]): Column =
    concat(keyCols.map { c =>
      val cs = col(c).cast("string")
      coalesce(
        concat(lit("v"), length(cs).cast("string"), lit(":"), cs),
        lit("n"))
    }: _*)

  /** ε=ln2-DP (row-level; see [[dpUserLevelCounts]] for user-level)
    * noisy counting release over `keyCols` classes, with small-count
    * suppression: classes whose NOISY count lands below `minRelease`
    * publish NULL (suppression decided on the noisy value, so the
    * decision itself leaks nothing beyond the DP output). `n_true`
    * and `noise` ride along as AUDIT columns for the calibration
    * view this query is — a production release projects them away
    * (the `dp_release` job form does). */
  def dpNoisyCounts(df: DataFrame, keyCols: Seq[String], salt: String,
      minRelease: Long = 5L): DataFrame =
    dpNoisyFromCounts(
      df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n_true")),
      keyCols, salt, minRelease)

  /** [[dpNoisyCounts]] over an ALREADY-aggregated class table
    * (`keyCols` + `n_true`) — the form an incrementally-maintained
    * count store publishes through (`Streams.noisyClassCounts`).
    * Because the noise is keyed by (class, salt, mechanism tag) only,
    * the noisy view over streamed counts is bit-identical to the batch
    * release over the same data — the law StreamingSpec pins.
    *
    * `mechanismTag` is the release-form component of the noise key
    * (default `cnt` = row-level counts); the user-level wrapper passes
    * `cnt:u<m>` so a clamped and an unclamped release under one salt
    * never share a draw. Override only to namespace a custom release
    * form — never to deduplicate noise across forms. */
  def dpNoisyFromCounts(cls: DataFrame, keyCols: Seq[String],
      salt: String, minRelease: Long = 5L,
      mechanismTag: String = Privacy.mechanismTagOf(None, None))
      : DataFrame = {
    val key = concat(classKey(keyCols), lit("|" + salt + "|" + mechanismTag))
    cls
      .withColumn("noise", geometricNoise(key))
      .withColumn("n_noisy", col("n_true") + col("noise"))
      .withColumn("suppressed", col("n_noisy") < minRelease)
      .withColumn("n_released",
        when(!col("suppressed"), col("n_noisy")))
  }

  /** USER-level DP noisy counting release: bound each contributor's
    * influence FIRST — keep at most `maxPerContributor` (= m) rows
    * per `contributorCol` value — then release the per-class counts
    * through the geometric mechanism. After the clamp, adding or
    * removing one contributor moves the class-count vector by at most
    * m in L1 (spread over at most m unit-sensitivity coordinates), so
    * the release is user-level ε-DP with **ε = m·ln 2** by sequential
    * composition — finite and stated, where the unclamped release's
    * user-level ε is unbounded (one contributor with 1000 rows moves
    * a count by 1000; PrivacySpec pins the contrast). m = 1 gives
    * ε = ln 2 exactly.
    *
    * The clamp is deterministic in every way that matters: rows are
    * ranked per contributor by the encoded class key, so which CLASS
    * each kept row lands in — hence every released count — is
    * replay-stable even though ties within a class are arbitrary
    * (tied rows are interchangeable for counting). Same window in
    * the DuckDB oracle.
    *
    * Scale shape: one spillable per-contributor window (partitionBy
    * contributor — millions of small partitions, never global) + the
    * counting aggregation + the per-row noise projection. */
  def dpUserLevelCounts(df: DataFrame, keyCols: Seq[String],
      contributorCol: String, salt: String,
      maxPerContributor: Int = 1, minRelease: Long = 5L): DataFrame = {
    require(maxPerContributor >= 1,
      s"maxPerContributor must be >= 1, got $maxPerContributor")
    require(!keyCols.contains(contributorCol),
      s"contributorCol '$contributorCol' must be disjoint from keyCols " +
        s"$keyCols: the clamp partitions by contributor and counts by " +
        "class — one column cannot be both")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(contributorCol))
      .orderBy(classKey(keyCols))
    val clamped = df
      .select(col(contributorCol) +: keyCols.map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerContributor)
    dpNoisyFromCounts(
      clamped.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("n_true")),
      keyCols, salt, minRelease,
      mechanismTag = mechanismTagOf(None, Some(maxPerContributor)))
  }

  /** ε=ln2-DP noisy SUM release over `keyCols` classes — the release
    * mechanism for per-class TOTALS (token counts, byte sizes) rather
    * than row counts. Two standard steps make the integer-only
    * geometric mechanism apply:
    *
    *  1. per-row CLIPPING: `valueCol` is clamped to [0, clip] (the
    *     bounded-contribution step every DP sum needs; rows above the
    *     clip are counted in the `n_clipped` audit column and rows
    *     below 0 — clamped up to the floor — in `n_floor_clipped`, so
    *     the operator's bias is measurable in BOTH directions, not
    *     hidden);
    *  2. UNIT quantization: the clipped sum S is released in units of
    *     `clip` — published value = clip · (⌊S/clip⌋ + noise). One
    *     row moves S by at most clip, and ⌊S/clip⌋ by at most 1, so
    *     ⌊S/clip⌋ is a unit-sensitivity integer query and the α=1/2
    *     two-sided geometric gives row-level ε = ln 2 exactly (same
    *     truncation delta as the counting release). The quantization
    *     error (< clip) is the price of exact integer ε — the same
    *     magnitude as the noise's own scale (clip·|noise|), so
    *     nothing is lost at release resolution.
    *
    * Suppression on the NOISY unit count, as in [[dpNoisyCounts]].
    * Audit columns (sum_true, n_clipped, n_floor_clipped, units_true,
    * noise) ride for the calibration view; the `dp_release --sum-col`
    * job form ships only (keys, suppressed, sum_released). Scale
    * shape: one clip projection + one counting aggregation + a
    * class-table projection.
    *
    * `mechanismTag` defaults to `sum:c<clip>` (the clip is part of
    * the release form — two different clips over the same classes are
    * different queries and must not share noise); the user-level
    * wrapper passes `sum:c<clip>:u<m>`. */
  def dpNoisySums(df: DataFrame, keyCols: Seq[String],
      valueCol: String, clip: Long, salt: String,
      minReleaseUnits: Long = 5L, mechanismTag: String = ""): DataFrame = {
    require(clip >= 1L, s"clip must be >= 1, got $clip")
    val mech =
      if (mechanismTag.isEmpty) mechanismTagOf(Some(clip), None)
      else mechanismTag
    val v = col(valueCol).cast("long")
    val clipped = df.withColumn("__v",
      least(greatest(v, lit(0L)), lit(clip)))
    val cls = clipped.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__v")).as("sum_true"),
        sum(when(v > clip, 1L).otherwise(0L)).as("n_clipped"),
        sum(when(v < 0L, 1L).otherwise(0L)).as("n_floor_clipped"))
    val key = concat(classKey(keyCols), lit("|" + salt + "|" + mech))
    cls
      .withColumn("units_true", expr(s"sum_true div $clip"))
      .withColumn("noise", geometricNoise(key))
      .withColumn("units_noisy", col("units_true") + col("noise"))
      .withColumn("suppressed", col("units_noisy") < minReleaseUnits)
      .withColumn("sum_released",
        when(!col("suppressed"), col("units_noisy") * clip))
  }

  /** USER-level DP noisy SUM release — the fourth cell of the
    * {counts, sums} × {row, user} release matrix: clamp each
    * contributor to `maxPerContributor` (= m) rows (the
    * [[dpUserLevelCounts]] window, ranked by the encoded class key —
    * replay-stable class sums), clip each kept row's value to
    * [0, clip], and release the per-class clipped sums in clip-units
    * as in [[dpNoisySums]]. One contributor with r_c clamped rows in
    * class c moves that class's clipped sum by ≤ r_c·clip, hence its
    * unit count by ≤ r_c + 1 (the +1 is a floor-boundary crossing);
    * summing over the ≤ m affected classes, the unit-count vector
    * moves by ≤ 2m in L1 (m + 1 when the contribution is
    * concentrated in one class), so the release is user-level
    * ε ≤ 2m·ln 2 — finite and stated, vs unbounded without the
    * clamp. */
  def dpUserLevelSums(df: DataFrame, keyCols: Seq[String],
      contributorCol: String, valueCol: String, clip: Long,
      salt: String, maxPerContributor: Int = 1,
      minReleaseUnits: Long = 5L): DataFrame = {
    require(maxPerContributor >= 1,
      s"maxPerContributor must be >= 1, got $maxPerContributor")
    require(!keyCols.contains(contributorCol) &&
        contributorCol != valueCol,
      s"contributorCol '$contributorCol' must be disjoint from keyCols " +
        s"$keyCols and valueCol '$valueCol': the clamp partitions by " +
        "contributor, groups by class, and sums the value — one column " +
        "cannot play two of those roles")
    import org.apache.spark.sql.expressions.Window
    // ranked by (class key, value): for SUMS, class-key ties are not
    // interchangeable (different values), but (class, value) ties
    // are — so every released sum is replay-stable under any
    // tie-break, same argument as the counts clamp one level up
    val w = Window.partitionBy(col(contributorCol))
      .orderBy(classKey(keyCols), col(valueCol).cast("long"))
    val clamped = df
      .select(col(contributorCol) +: (keyCols.map(col) :+
        col(valueCol)): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerContributor)
      .drop("__rn", contributorCol)
    dpNoisySums(clamped, keyCols, valueCol, clip, salt,
      minReleaseUnits,
      mechanismTag = mechanismTagOf(Some(clip), Some(maxPerContributor)))
  }

  /** ln 2, the per-unit ε of the α = 1/2 geometric mechanism — a
    * pinned literal (audit metadata, not a data-path libm call). */
  val EpsUnit: Double = 0.6931471805599453

  /** RELEASE-BUDGET LEDGER — the enforcement layer the mechanism tag
    * is defense-in-depth for. The tag stops two different release
    * FORMS from sharing noise; nothing in the mechanism stops an
    * operator from re-releasing the SAME form over changed data under
    * one salt (ε-additive at best, exact-difference leak at worst).
    * The ledger records every release (salt, mechanism, key columns,
    * ε in ln2 units, wall-clock) in a parquet dir next to the release
    * destination; [[ledgerGuard]] refuses a salt already present
    * unless the caller explicitly accepts the composition
    * (`allowReuse` — documented as ε-ADDITIVE: the composed ε over a
    * salt is the SUM of its rows' ε, which [[ledgerComposedView]]
    * reports per salt).
    *
    * Guarding alone burns nothing — the record lands at APPEND time,
    * so callers should use [[ledgerBurn]] (guard + append in one
    * call, before the release frame is computed): a crash after the
    * burn wastes a salt rather than silently allowing a replay —
    * fail-safe in the only direction privacy accounting can afford.
    * Single-writer per ledger dir, like every store in the engine. */
  def ledgerGuard(spark: SparkSession, ledgerDir: String, salt: String,
      allowReuse: Boolean): Unit = {
    val fs = new org.apache.hadoop.fs.Path(ledgerDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(ledgerDir))) {
      // explicit schema: an existing-but-fileless ledger dir (crash
      // after mkdir, before the first append's files landed) is an
      // EMPTY ledger, not a schema-inference error
      val used = spark.read.schema(ledgerSchema).parquet(ledgerDir)
        .filter(col("salt") === salt).count()
      require(used == 0 || allowReuse,
        s"dp ledger $ledgerDir already records $used release(s) " +
          s"under this salt — a reused salt composes ε additively " +
          "(and re-releasing the same form over changed data can " +
          "leak exact differences). Pass allow-reuse only if that " +
          "composed budget is intended; otherwise use a fresh salt.")
    }
  }

  /** The exact release-form tag each release folds into its noise key
    * — derived HERE, the single authority both the release functions
    * and the ledger use, so a ledger row's `mechanism` can always be
    * joined back to the release form (including the clip and m, which
    * are part of the form: two clips over the same classes are
    * different queries). `sumClip` = Some(clip) for a sums release,
    * None for counts; `maxPerContributor` = Some(m) for the
    * user-level forms. */
  def mechanismTagOf(sumClip: Option[Long],
      maxPerContributor: Option[Int]): String =
    (sumClip, maxPerContributor) match {
      case (Some(c), Some(m)) => s"sum:c$c:u$m"
      case (Some(c), None)    => s"sum:c$c"
      case (None, Some(m))    => s"cnt:u$m"
      case (None, None)       => "cnt"
    }

  /** The stated ε of a release form, in ln 2 units — same derivation
    * authority as [[mechanismTagOf]]: 1 for the row-level forms
    * (counts and clipped sums both have unit L1 sensitivity after
    * their clip), m for user-level counts, 2m for user-level sums
    * (the floor-boundary crossing; see [[dpUserLevelSums]]). */
  def epsLn2UnitsOf(sumClip: Option[Long],
      maxPerContributor: Option[Int]): Double =
    (sumClip, maxPerContributor) match {
      case (Some(_), Some(m)) => 2.0 * m
      case (None, Some(m))    => m.toDouble
      case _                  => 1.0
    }

  /** Guard + burn in ONE call — the form the `dp_release` job uses:
    * refuse a recorded salt (unless `allowReuse`), then append the
    * release record immediately, BEFORE the release frame is
    * computed. A crash after the burn wastes a salt rather than
    * silently allowing a replay — fail-safe in the only direction
    * privacy accounting can afford. The recorded `mechanism` is the
    * exact [[mechanismTagOf]] tag the release will fold into its
    * noise key, so the ledger reconstructs per-form budgets without
    * guessing. */
  def ledgerBurn(spark: SparkSession, ledgerDir: String, salt: String,
      keyCols: Seq[String], sumClip: Option[Long],
      maxPerContributor: Option[Int], allowReuse: Boolean): Unit = {
    ledgerGuard(spark, ledgerDir, salt, allowReuse)
    ledgerAppend(spark, ledgerDir, salt,
      mechanismTagOf(sumClip, maxPerContributor), keyCols,
      epsLn2UnitsOf(sumClip, maxPerContributor))
  }

  /** The ledger's pinned on-disk schema ([[ledgerAppend]] writes it;
    * guard and view read with it explicitly — never inferred). */
  private val ledgerSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("salt",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("mechanism",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("key_cols",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("eps_ln2_units",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("epsilon",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("released_at_ms",
        org.apache.spark.sql.types.LongType)))

  /** Append one release record to the ledger (see [[ledgerGuard]]).
    * `epsLn2Units` is the release's stated ε in ln 2 units: 1 for
    * row-level counts/sums, m for user-level counts, 2m for
    * user-level sums. */
  def ledgerAppend(spark: SparkSession, ledgerDir: String,
      salt: String, mechanism: String, keyCols: Seq[String],
      epsLn2Units: Double): Unit = {
    import spark.implicits._
    Seq((salt, mechanism, keyCols.mkString(","), epsLn2Units,
      epsLn2Units * EpsUnit, System.currentTimeMillis()))
      .toDF("salt", "mechanism", "key_cols", "eps_ln2_units",
        "epsilon", "released_at_ms")
      .coalesce(1).write.mode("append").parquet(ledgerDir)
  }

  /** Composed-ε view over a ledger: per salt, the number of releases
    * and the SUM of their ε (sequential composition — the budget an
    * adversary holding all the releases gets to spend). */
  def ledgerComposedView(spark: SparkSession, ledgerDir: String)
      : DataFrame =
    spark.read.schema(ledgerSchema).parquet(ledgerDir)
      .groupBy(col("salt"))
      .agg(count(lit(1)).as("n_releases"),
        sum(col("eps_ln2_units")).as("eps_ln2_units"),
        sum(col("epsilon")).as("epsilon_composed"),
        sort_array(collect_set(col("mechanism"))).as("mechanisms"))

  /** k-anonymization by ladder generalization — the op that FIXES a
    * failing k-anonymity audit (q247 measures; this releases): the
    * numeric quasi-identifier `valueCol` is coarsened down a
    * deterministic band ladder (`divisors`, finest first), releasing
    * ITERATIVELY from the finest level: at each level, equivalence
    * classes (`classCols` + band) are counted over the rows NOT YET
    * released at a finer level, and classes reaching size ≥ k release
    * all their remaining rows at that level. The last ladder rung
    * drops the band entirely (class = `classCols` alone); rows whose
    * class is still below k there are suppressed — the standard
    * generalize-then-suppress scheme (cf. Samarati/Sweeney
    * k-anonymity).
    *
    * The iterative count is what makes the published table actually
    * k-anonymous: counting each level over ALL rows fanned out to it
    * (the naive one-shot formulation) lets a level-L class "pass"
    * on the strength of rows that are in fact released at a finer
    * level, publishing a sub-k — even singleton — remainder at L
    * (5 rows in band [0,1000) + 1 in [1000,2000) under one class:
    * the lone row must NOT ship at the divisor-2000 level with
    * class_size 6). Here every published (level, class, band) group
    * has ≥ k rows by construction; PrivacySpec pins the mixed-
    * sublevel fixture.
    *
    * Returns one row per input row: id, classCols, `level` (ladder
    * index; |divisors| = band dropped, |divisors|+1 = suppressed),
    * `band` (generalized value, NULL once the band is dropped),
    * `class_size` (rows actually published in the row's group; 0
    * when suppressed), `suppressed`.
    *
    * Scale shape: |divisors|+1 rounds, each ONE window count over
    * (class, band) on a SHRINKING remainder — spillable, no
    * self-join — with a barrier per round (the sized frame feeds
    * both the release slice and the next round; without it the
    * diamond recomputes the prefix per level). One final join back
    * on id. Everything is ≤ corpus-sized; no driver paths. */
  def kAnonymizeBands(df: DataFrame, idCol: String,
      classCols: Seq[String], valueCol: String,
      divisors: Seq[Long] = Seq(1000L, 2000L, 4000L, 8000L),
      k: Long = 5L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Checkpoints.BarrierOps
    val cls = classCols.map(col)
    val ladder: Seq[Option[Long]] =
      divisors.map(Option(_)) :+ Option.empty[Long]
    var remaining = df.select((col(idCol) +: cls :+ col(valueCol)): _*)
    val released = ladder.zipWithIndex.map { case (div, lvl) =>
      val banded = remaining.withColumn("band",
        div.map(d =>
            floor(col(valueCol) / lit(d).cast("double")).cast("long"))
          .getOrElse(lit(null).cast("long")))
      val sized = banded.withColumn("class_size",
        count(lit(1)).over(Window.partitionBy(cls :+ col("band"): _*)))
        .barrier() // feeds both the release slice and the next round
      remaining = sized.filter(col("class_size") < k)
        .select((col(idCol) +: cls :+ col(valueCol)): _*)
      sized.filter(col("class_size") >= k)
        .select(col(idCol), lit(lvl).cast("int").as("level"),
          col("band"), col("class_size"))
    }.reduce(_ unionByName _)
    df.select((col(idCol) +: cls): _*)
      .join(released, Seq(idCol), "left")
      .select((col(idCol) +: cls) ++ Seq(
        coalesce(col("level"), lit(divisors.size + 1)).as("level"),
        col("band"),
        coalesce(col("class_size"), lit(0L)).as("class_size"),
        col("class_size").isNull.as("suppressed")): _*)
  }
}
