package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-size frequency sketches.
  *
  * The count-min sketch here is deliberately built from md5-derived
  * hashes (the repo-wide `hash60` convention) instead of an engine RNG,
  * which buys something unusual for a sketch: the whole structure is
  * bit-reproducible in ANY engine, so q155 hash-matches a DuckDB oracle
  * replicating the build and the probe — the estimate itself is
  * cross-engine verified, not just rows-only checked (contrast q55/q153,
  * whose HLL/Bloom internals are engine-private).
  *
  * Scale shape: the build aggregates into a key domain bounded by
  * d×w (e.g. 4×256 = 1024 cells), so partial aggregation collapses the
  * token stream map-side and the exchange carries at most d·w rows PER
  * MAPPER PARTITION regardless of corpus size or vocabulary — this is
  * what replaces the full-vocabulary shuffle of exact counting (q120
  * heavy hitters) when 100 TB of text meets a billion-term vocabulary.
  * Probing joins the (tiny, broadcast) sketch against the probe terms'
  * d buckets; a CMS never undercounts, so `cms_n >= exact_n` always.
  */
object Sketches {

  /** The d·w bucket coordinates of one term: row i hashes
    * `"$i:" + term` so rows are pairwise-independent-ish while staying
    * engine-reproducible (`('0x'||substr(md5(i||':'||t),1,15))::BIGINT
    * % w` in DuckDB — hash60 is 60-bit positive, so `%` agrees). */
  private def bucketStructs(termCol: Column, d: Int, w: Int): Column =
    array((0 until d).map { i =>
      struct(lit(i).as("hrow"),
        (TextOps.hash60(concat(lit(s"$i:"), termCol)) % w).as("bucket"))
    }: _*)

  /** Build the sketch: one pass over the term stream, d coordinates per
    * term, groupBy over the bounded (hrow, bucket) domain. Output is at
    * most d·w rows — broadcastable by construction. */
  def countMinBuild(terms: DataFrame, termCol: String, d: Int,
      w: Int): DataFrame =
    terms
      .select(explode(bucketStructs(col(termCol), d, w)).as("hb"))
      .groupBy(col("hb.hrow").as("hrow"), col("hb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Additive merge: a CMS is LINEAR in its input — counters of the
    * union are the sums of counters — so shard- or batch-local
    * sketches combine exactly (not approximately-on-approximate: the
    * merged sketch is bit-identical to one built over the union, which
    * the spec pins). This is what makes the sketch maintainable
    * incrementally (streaming store) and buildable per-partition at
    * 100 TB without ever co-shuffling the raw term streams. */
  def countMinMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("hrow"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate the frequency of each probe term: min over the d
    * rows of the term's bucket counters. Absent buckets count 0 (a term
    * the sketch never saw estimates 0 only if at least one of its
    * buckets is empty). The sketch side is ≤ d·w rows → broadcast. */
  def countMinEstimate(probes: DataFrame, termCol: String,
      sketch: DataFrame, d: Int, w: Int): DataFrame = {
    val keep = probes.columns.map(col)
    probes
      .select(keep :+
        explode(bucketStructs(col(termCol), d, w)).as("hb"): _*)
      .join(broadcast(sketch),
        col("hb.hrow") === sketch("hrow") &&
          col("hb.bucket") === sketch("bucket"), "left")
      .groupBy(keep: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_n"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per group: the k
    * smallest DISTINCT `hashCol` values (Bar-Yossef et al. 2002 —
    * the same sketch q168 uses for source overlap, factored as a
    * maintainable structure). ≤ k rows per group by construction.
    *
    * Scale shape: one distinct (map-side combinable) + one per-group
    * top-k window whose rank-≤-k filter compiles to WindowGroupLimit
    * (partial top-k BEFORE the exchange — each mapper ships at most
    * k rows per group, never its hash stream). */
  def kmvBuild(items: DataFrame, groupCol: String, hashCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(hashCol))
    items.select(col(groupCol), col(hashCol)).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(groupCol), col(hashCol))
  }

  /** Merge two KMV sketches: kmv_k(A ∪ B) = the k smallest of
    * distinct(kmv_k(A) ∪ kmv_k(B)) — EXACTLY the sketch a single
    * pass over A ∪ B would build (the spec pins this law), because
    * any value among the union's k smallest is among its own side's
    * k smallest. Like [[countMinMerge]], this is what makes the
    * sketch incrementally maintainable: per-shard/per-day sketches
    * combine losslessly without re-touching the streams. */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCol: String,
      hashCol: String, k: Int): DataFrame =
    kmvBuild(a.unionByName(b), groupCol, hashCol, k)

  /** Distinct-count estimate from a KMV sketch over `hash60` values
    * (uniform on [0, 2⁶⁰)): with n = sketch size and h_k = its
    * largest value, the estimate is (k−1)·2⁶⁰/h_k, and EXACT (= n)
    * while the sketch is not yet full (n < k). One IEEE division of
    * exactly-representable operands — engine-reproducible, which is
    * why this estimator can be oracled where HLL (q55) cannot. */
  def kmvDistinctEstimate(sketch: DataFrame, groupCol: String,
      hashCol: String, k: Int): DataFrame =
    sketch.groupBy(col(groupCol))
      .agg(count(lit(1)).as("k_used"), max(col(hashCol)).as("hk"))
      .select(col(groupCol), col("k_used"),
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit((k - 1).toDouble) *
            lit(1152921504606846976.0) / col("hk").cast("double"))
          .as("est_distinct"))

  /** Deterministic Bloom bit positions for a key: hash60(key# i) mod m
    * for i = 1..h — md5-derived like every sketch here, so the exact
    * bit layout (and therefore every false positive) is reproducible
    * in any engine. */
  private def bloomPositions(key: Column, m: Int, h: Int): Column =
    array((1 to h).map(i =>
      TextOps.hash60(concat(key.cast("string"), lit("#" + i))) % m): _*)

  /** Bloom bit-set sketch, materialized: the DISTINCT set positions
    * (≤ m rows) of every key — the relational bitset
    * [[bloomJoinAudit]] probes, exposed as a build/merge/probe
    * triple so the filter can be maintained incrementally (the
    * streaming decontamination build side: benchmark/eval shingles
    * arrive over time, training-side probes run against the store).
    * Merge is distinct-union — the relational OR — which is
    * associative, commutative and IDEMPOTENT, so per-shard/per-day
    * filters combine losslessly and replayed batches are harmless
    * (the group-MinHash store's delivery argument). */
  def bloomBuild(items: DataFrame, keyCol: String, m: Int = 4096,
      h: Int = 3): DataFrame =
    items.select(explode(bloomPositions(col(keyCol), m, h)).as("pos"))
      .distinct()

  /** OR of two bit sets: distinct union of position rows. */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** Membership probe of distinct probe keys against a built bit
    * set: (probeKey, may_contain) — may_contain true iff all h bits
    * are set (one broadcast of the ≤ m-row filter + one count
    * aggregation, the [[bloomJoinAudit]] probe shape without the
    * truth join). */
  def bloomMayContain(probe: DataFrame, probeKey: String,
      bits: DataFrame, m: Int = 4096, h: Int = 3): DataFrame =
    probe.select(col(probeKey).as("k")).distinct()
      .select(col("k"), explode(bloomPositions(col("k"), m, h))
        .as("pos"))
      .join(broadcast(bits.withColumn("__hit", lit(1))), Seq("pos"),
        "left")
      .groupBy(col("k"))
      .agg(sum(coalesce(col("__hit"), lit(0))).as("n_set"))
      .select(col("k").as(probeKey),
        (col("n_set") === h).as("may_contain"))

  /** Bloom-filter join pruning, RELATIONALLY: the build side's bit
    * SET (≤ m rows — broadcast, the filter itself) semi-joins the
    * probe side's per-key positions; a key "passes" iff all h of its
    * bits are set — bit-for-bit the classic broadcast-bitset Bloom,
    * expressed as one broadcast join + one count aggregation so no
    * UDF, no driver bitset, and the probe side is touched once. The
    * audit a planner wants before trusting the filter: keys passing,
    * true matches (exact semi join), false positives, and the FP rate
    * among true negatives. m and h are part of the declared contract
    * (mirrored in the oracle), so the FP count is engine-exact — the
    * only Bloom in the registry whose *mistakes* hash-match. */
  def bloomJoinAudit(build: DataFrame, probe: DataFrame,
      buildKey: String, probeKey: String, m: Int = 4096, h: Int = 3)
      : DataFrame = {
    val bits = bloomBuild(build, buildKey, m, h)
    // per-key bit membership: LEFT join each probe position against
    // the broadcast bit set (≤ m rows — it IS the filter, the ONLY
    // broadcast bounded by the sketch parameter) and count hits in
    // the same aggregation that collapses the h positions — keys with
    // zero set bits survive the left join, so no key list is ever
    // joined back (a `passed` key set is bounded only by the match
    // rate: a saturated filter would broadcast the whole probe side).
    // The truth flag broadcasts the BUILD key set — small by
    // construction (it is the side worth building a Bloom from).
    val probeKeys = probe.select(col(probeKey).as("k")).distinct()
    val truth = build.select(col(buildKey).as("k")).distinct()
      .select(col("k"), lit(1).as("__true"))
    probeKeys
      .select(col("k"), explode(bloomPositions(col("k"), m, h)).as("pos"))
      .join(broadcast(bits.withColumn("__hit", lit(1))), Seq("pos"),
        "left")
      .groupBy(col("k"))
      .agg(sum(coalesce(col("__hit"), lit(0))).as("n_set"))
      .select(col("k"),
        when(col("n_set") === h, 1).otherwise(0).as("__pass"))
      .join(broadcast(truth), Seq("k"), "left")
      .agg(
        count(lit(1)).as("n_probe_keys"),
        sum(coalesce(col("__pass"), lit(0))).cast("long").as("n_pass"),
        sum(coalesce(col("__true"), lit(0))).cast("long").as("n_true"))
      .select(col("n_probe_keys"), col("n_pass"), col("n_true"),
        (col("n_pass") - col("n_true")).as("n_false_pos"),
        when(col("n_probe_keys") === col("n_true"), lit(0.0))
          .otherwise((col("n_pass") - col("n_true")).cast("double") /
            (col("n_probe_keys") - col("n_true")).cast("double"))
          .as("fp_rate"))
  }

  /** Deterministic quantile-sample sketch per group: the VALUES of the
    * k rows whose `hash60(key)` is smallest — a uniform-without-
    * replacement sample whose membership is a pure function of the
    * data (no `rand()`), so any engine draws the SAME sample and the
    * quantile estimates are hash-oracled, where a t-digest/KLL's
    * internals could not be.
    *
    * Same scale shape as [[kmvBuild]]: the rank-≤-k filter compiles to
    * WindowGroupLimit, so each mapper ships at most k rows per group.
    * Same merge law too (bottom-k of a union = bottom-k of the merged
    * bottom-k's, SketchesSpec pins it): per-shard/per-day sketches
    * combine losslessly, which is what makes this the 100 TB route to
    * "p50/p90 per key" — the exact per-group sort (q83) touches every
    * row; this touches k per group after a map-side prune. */
  def quantileSampleBuild(items: DataFrame, groupCol: String,
      keyCol: String, valueCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("h"))
    items
      .select(col(groupCol),
        TextOps.hash60(col(keyCol).cast("string")).as("h"),
        col(valueCol).as("v"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(groupCol), col("h"), col("v"))
  }

  /** Merge two quantile-sample sketches (disjoint or overlapping
    * shards): distinct-by-(h,v) union, then bottom-k again. */
  def quantileSampleMerge(a: DataFrame, b: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("h"))
    a.unionByName(b).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(groupCol), col("h"), col("v"))
  }

  /** Priority sampling (Duffield–Lund–Thorup, JACM 2007): the
    * weighted companion of [[quantileSampleBuild]]. Each row gets
    * priority w/u with u = hash60(key)/2⁶⁰ ∈ (0,1]; the k highest
    * priorities are the sample, τ = the (k+1)-th priority, and
    * Σ max(w, τ) over the sample is an UNBIASED estimator of any
    * group's total weight — the standard sketch for "how many tokens
    * does this slice hold" questions answered from k rows instead of
    * a full scan.
    *
    * Everything is IEEE mult/div/compare on exactly-representable
    * inputs (integer weights, md5-derived u), so sample membership, τ,
    * and the estimate reproduce bit-for-bit in any engine — the
    * estimator's ERROR is hash-oracled (q199). The estimator sum folds
    * over ≤ k values in rank order (bounded, deterministic order).
    * Output per group: n, k_used, tau, est_sum, exact_sum, rel_err —
    * the exact side is the audit; at 100 TB only the sample ships.
    * Scale shape: the rank-≤-k+1 filter compiles to WindowGroupLimit,
    * so each mapper ships at most k+1 rows per group. */
  def prioritySampleSummary(items: DataFrame, groupCol: String,
      keyCol: String, weightCol: String, k: Int): DataFrame = {
    val base = items.select(col(groupCol),
      col(keyCol).cast("string").as("key"),
      col(weightCol).cast("long").as("w"))
    val u = (TextOps.hash60(col("key")).cast("double") /
      lit(1152921504606846976.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("pri").desc, col("key"))
    val ranked = base
      .withColumn("pri", col("w").cast("double") / u)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k + 1)
    val tau = ranked.groupBy(col(groupCol))
      .agg(when(count(lit(1)) === (k + 1), min(col("pri")))
        .otherwise(lit(0.0)).as("tau"))
    val est = ranked.filter(col("rk") <= k)
      .join(tau, groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("k_used"),
        min(col("tau")).as("tau"),
        aggregate(
          transform(
            sort_array(collect_list(struct(col("rk"),
              greatest(col("w").cast("double"), col("tau")).as("wa")))),
            s => s.getField("wa")),
          lit(0.0), (acc, v) => acc + v).as("est_sum"))
    val exact = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("w")).as("exact_sum"))
    est.join(exact, groupCol)
      .select(col(groupCol), col("n"), col("k_used"), col("tau"),
        col("est_sum"), col("exact_sum"),
        (abs(col("est_sum") - col("exact_sum").cast("double")) /
          col("exact_sum").cast("double")).as("rel_err"))
  }

  /** Type-1 (pure-indexing) quantile estimates from a sample sketch:
    * value at rank ceil(q·n) of the sorted sample — no interpolation,
    * so the estimate IS a data value and engine-exact. `qs` are
    * (label, fraction) pairs; output one `<label>` column each plus
    * `n_sample`. The sample is ≤ k values per group, so the per-group
    * sort is bounded regardless of corpus size. */
  def quantileSampleEstimate(sketch: DataFrame, groupCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    val agged = sketch.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_sample"),
        sort_array(collect_list(col("v"))).as("vs"))
    agged.select(
      col(groupCol) +: col("n_sample") +: qs.map { case (label, q) =>
        element_at(col("vs"),
          ceil(lit(q) * col("n_sample")).cast("int")).as(label)
      }: _*)
  }
}
