package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mixture weights: turn per-domain corpus counts into
  * sampling weights `w_d ∝ n_d^α` (α = 0.5 here — the standard
  * "temperature" that up-weights small domains/languages so a tail
  * language isn't drowned by the head; α=1 is proportional, α=0 is
  * uniform). The output is what a data-loader consumes to sample
  * domains during training.
  *
  * Determinism contract: `sqrt` is IEEE-754 correctly rounded in every
  * engine, and the normalizing denominator is a LEFT FOLD over the
  * groups in group-key order (sort_array + `aggregate`, the same
  * ordered-fold idiom as the vector math in `Similarity`) — never a
  * parallel double sum whose association depends on partitioning. The
  * group list is aggregated to ONE row (#groups = #languages/domains,
  * trivially small at any corpus size; the heavy work is the count
  * aggregation, one exchange) and joined back as a broadcast scalar.
  *
  * α other than 1/2 needs `pow`, whose last-bit rounding is
  * engine-specific — callers wanting that trade bit-reproducibility
  * for generality; this operator deliberately stays on `sqrt`.
  */
object Mixture {

  /** Per-`groupCol` doc counts and normalized sqrt-law weights:
    * (group, n_docs, w_raw = sqrt(n), weight = w_raw / Σ w_raw). */
  def sqrtMixtureWeights(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val denom = counts
      .agg(sort_array(collect_list(struct(col(groupCol), col("n_docs"))))
        .as("gs"))
      .select(aggregate(col("gs"), lit(0.0),
        (acc, g) => acc + sqrt(g.getField("n_docs").cast("double")))
        .as("denom"))
    counts.crossJoin(broadcast(denom))
      .select(col(groupCol), col("n_docs"),
        sqrt(col("n_docs").cast("double")).as("w_raw"),
        (sqrt(col("n_docs").cast("double")) / col("denom")).as("weight"))
  }

  /** Two-dimensional mixture raking (Deming–Stephan iterative
    * proportional fitting): per-(rowCol, colCol) sampling weights
    * fitted so the weighted mass matches UNIFORM target marginals in
    * BOTH dimensions at once — the two-constraint generalization of
    * temperature mixing ([[sqrtMixtureWeights]] can hit a language
    * target OR a source target; a training mix usually has to hit
    * both: "equal language shares AND equal source shares"). `iters`
    * alternating row/column scaling rounds (3 is the classic
    * near-convergence default; the fixed count is part of the
    * declared contract so the oracle can unroll it).
    *
    * Scale shape: ONE corpus-sized count aggregation builds the cell
    * table (#rows × #cols — domain dimensions, trivially small at any
    * corpus size, barriered once); every iteration is two
    * aggregations + two broadcast joins ON THE CELL TABLE, so
    * iteration cost is independent of corpus size. Determinism: cell
    * counts are exact longs; every double sum is an ordered fold over
    * the OTHER dimension's key (the [[sqrtMixtureWeights]] idiom), so
    * weights are bit-reproducible in any engine.
    *
    * Returns (rowCol, colCol, n, weight, fitted_share) with
    * fitted_share = weight·n / N — after convergence its row sums ≈
    * 1/#rows and column sums ≈ 1/#cols. */
  def ipfWeights(df: DataFrame, rowCol: String, colCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"ipfWeights: iters=$iters")
    import graft.core.Checkpoints.BarrierOps
    val cells = df.groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).as("n")).barrier()
    // integer totals: plain sums are exact; the one-row frame
    // broadcasts as the target-marginal scalar source — barriered,
    // it is referenced by every scaling step
    val tot = cells.agg(sum(col("n")).as("n_total"),
      countDistinct(col(rowCol)).as("nr"),
      countDistinct(col(colCol)).as("nc"))
      .barrier()
    def orderedMass(over: String): Column =
      graft.ops.Aggregates.orderedSum(col(over),
        col("w") * col("n").cast("double"))
    def scale(cur: DataFrame, by: String, other: String,
        targetDen: Column): DataFrame = {
      val sums = cur.groupBy(col(by)).agg(orderedMass(other).as("mass"))
      cur.join(sums, Seq(by))
        .crossJoin(broadcast(tot))
        .select(col(rowCol), col(colCol), col("n"),
          (col("w") * (col("n_total").cast("double") / targetDen) /
            col("mass")).as("w"))
    }
    val w0 = cells.withColumn("w", lit(1.0))
    // barrier per round — the iterative-operator discipline (q54 /
    // PageRank): each round's cell frame feeds the next round's two
    // aggregations AND its two joins; without the barrier the plan
    // multiplies ~4× per round (measured 205 exchanges at 3 rounds)
    val fitted = (1 to iters).foldLeft(w0) { (cur, _) =>
      scale(scale(cur, rowCol, colCol, col("nr").cast("double")),
        colCol, rowCol, col("nc").cast("double"))
        .barrier()
    }
    fitted.crossJoin(broadcast(tot))
      .select(col(rowCol), col(colCol), col("n"),
        col("w").as("weight"),
        (col("w") * col("n").cast("double") /
          col("n_total").cast("double")).as("fitted_share"))
  }

  /** [[ipfWeights]] with EXPLICIT target marginal shares — the full
    * raking API ("40% en, 30% code, …" × "no source above 25%"),
    * uniform being the special case the oracled q237 pins. Shares are
    * caller-supplied constants (the mix designer's spec sheet, not
    * data); a key observed in the data but absent from its share list
    * gets target share 0 and rakes to weight 0 — "outside the target
    * mix" — and once a group's whole mass is zeroed the guard keeps
    * its weights at 0 instead of dividing by the zero mass. Shares
    * need not sum to 1; each dimension's fit targets share·N mass.
    * Same barrier-per-round discipline and ordered-fold determinism
    * as [[ipfWeights]]. */
  def ipfWeightsToTargets(df: DataFrame, rowCol: String,
      colCol: String, rowShares: Seq[(String, Double)],
      colShares: Seq[(String, Double)], iters: Int = 3): DataFrame = {
    require(iters >= 1, s"ipfWeightsToTargets: iters=$iters")
    require(rowShares.nonEmpty && colShares.nonEmpty,
      "ipfWeightsToTargets: both share lists required (use ipfWeights" +
        " for uniform targets)")
    import graft.core.Checkpoints.BarrierOps
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df.groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).as("n")).barrier()
    val tot = cells.agg(sum(col("n")).as("n_total")).barrier()
    def shareTable(shares: Seq[(String, Double)], key: String) =
      shares.toDF(key, "__share")
    val rs = shareTable(rowShares, rowCol)
    val cs = shareTable(colShares, colCol)
    def orderedMass(over: String): Column =
      graft.ops.Aggregates.orderedSum(col(over),
        col("w") * col("n").cast("double"))
    def scale(cur: DataFrame, by: String, other: String,
        shares: DataFrame): DataFrame = {
      val sums = cur.groupBy(col(by)).agg(orderedMass(other).as("mass"))
      cur.join(sums, Seq(by))
        .join(broadcast(shares), Seq(by), "left")
        .crossJoin(broadcast(tot))
        .select(col(rowCol), col(colCol), col("n"),
          when(col("mass") === 0.0, lit(0.0)).otherwise(
            col("w") * (col("n_total").cast("double") *
              coalesce(col("__share"), lit(0.0))) / col("mass"))
            .as("w"))
    }
    val w0 = cells.withColumn("w", lit(1.0))
    val fitted = (1 to iters).foldLeft(w0) { (cur, _) =>
      scale(scale(cur, rowCol, colCol, rs), colCol, rowCol, cs)
        .barrier()
    }
    fitted.crossJoin(broadcast(tot))
      .select(col(rowCol), col(colCol), col("n"),
        col("w").as("weight"),
        (col("w") * col("n").cast("double") /
          col("n_total").cast("double")).as("fitted_share"))
  }

  /** Materialize the mixture: deterministic hash-Bernoulli sampling of
    * `df` at per-group rates `min(1, weight · factor)` derived from
    * [[sqrtMixtureWeights]]. A doc is kept iff
    * `hash60(id ∥ salt) mod 10^6 < floor(rate · 10^6)` — a pure
    * function of the row, so the sample is REPRODUCIBLE (same corpus →
    * same sample on any cluster layout, resumable mid-job) and
    * composable (two pipelines sampling with the same salt draw the
    * same docs; disjoint salts draw independent ones). No `rand()`,
    * whose per-partition seeding changes with the split layout.
    *
    * The rate table is #groups rows — broadcast; the corpus side is
    * one narrow filter, no shuffle. Returns the sampled rows of `df`
    * with `rate` and `thr` attached. */
  def mixtureSample(df: DataFrame, groupCol: String, idCol: String,
      factor: Double = 2.0, salt: String = ":mix"): DataFrame = {
    val rates = sqrtMixtureWeights(df, groupCol)
      .select(col(groupCol),
        least(lit(1.0), col("weight") * factor).as("rate"))
      .withColumn("thr", floor(col("rate") * 1000000.0).cast("long"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(TextOps.hash60(
        concat(col(idCol).cast("string"), lit(salt))) % 1000000L
        < col("thr"))
  }

  /** Fractional epoch upsampling: each group's docs are repeated
    * `epochs = weight · scale` times per training pass — integer part
    * as full copies, fractional part as a deterministic hash-Bernoulli
    * extra copy (`hash60(id ∥ salt) mod 10^6 < floor(frac · 10^6)`),
    * so the EXPECTED group mass is exact while every draw is
    * reproducible. This is how a data loader honors non-integer
    * mixture weights without global shuffling: the explode is per-row,
    * the copy index rides along for downstream interleaving, and a doc
    * with zero copies this pass simply emits no rows.
    *
    * Output: `df`'s rows × copies with `n_copies` and `copy` (0-based)
    * attached. */
  def epochUpsample(df: DataFrame, groupCol: String, idCol: String,
      scale: Double = 10.0, salt: String = ":ep"): DataFrame = {
    val eps = sqrtMixtureWeights(df, groupCol)
      .select(col(groupCol), (col("weight") * scale).as("epochs"))
      .withColumn("base", floor(col("epochs")).cast("long"))
      .withColumn("fthr",
        floor((col("epochs") - floor(col("epochs"))) * 1000000.0)
          .cast("long"))
    df.join(broadcast(eps), Seq(groupCol))
      .withColumn("n_copies",
        col("base") + when(TextOps.hash60(
          concat(col(idCol).cast("string"), lit(salt))) % 1000000L
          < col("fthr"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn("copy",
        explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("base", "fthr")
  }

  /** Deterministic k-per-group sample: each group's docs rank by the
    * hash priority `hash60(id ∥ salt)` (id tie-break) and the top `k`
    * survive with their rank — the "uniform eval subset per
    * language/domain" draw. Same reproducibility contract as
    * [[mixtureSample]] (pure row function, no `rand()`), and the
    * rank-≤-k filter compiles to WindowGroupLimit: partial top-k
    * runs BEFORE the exchange, so a billion-doc group ships only k
    * rows per map partition, not the group. */
  def groupKSample(df: DataFrame, groupCol: String, idCol: String,
      k: Int, salt: String = ":ks"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(TextOps.hash60(
        concat(col(idCol).cast("string"), lit(salt))), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic train/val/test split assignment: bucket =
    * `hash60(id ∥ salt) mod 100`, split = train below `trainPct`, val
    * below `trainPct + valPct`, else test. The same
    * pure-function-of-the-row contract as [[mixtureSample]]: the split
    * is REPRODUCIBLE on any cluster layout, a re-run assigns every doc
    * identically, and — the property rand()-based splits break — a doc
    * added tomorrow never moves yesterday's docs between splits, so
    * eval sets stay stable as the corpus grows. One narrow projection,
    * no shuffle. */
  def trainSplit(df: DataFrame, idCol: String, trainPct: Int = 80,
      valPct: Int = 10, salt: String = ":split"): DataFrame = {
    val bucket = TextOps.hash60(
      concat(col(idCol).cast("string"), lit(salt))) % 100
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Source-interleaved curriculum order: rank docs WITHIN each group
    * by (`scoreCol` desc, id), then emit the global training order
    * that round-robins the groups at each rank — position 1..G are
    * the per-group best docs, the next G the second-best, and so on.
    * This is the deterministic "quality-first but source-balanced"
    * ordering a curriculum data loader wants: no source ever floods a
    * training window, and the order is a pure function of the corpus.
    *
    * The global position over the (rank, group) total order uses
    * [[Sharding.globalRowNumber]]'s prefix decomposition — the rank
    * domain is bounded by the largest group, so no single-partition
    * window anywhere. Returns the first `topK` positions. */
  def curriculumOrder(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, topK: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val ranked = df
      .select(col(idCol), col(groupCol), col(scoreCol))
      .withColumn("src_rank", row_number().over(w))
    Sharding.globalRowNumber(ranked, "src_rank", groupCol)
      .filter(col("rn") <= topK)
      .select(col("rn").as("position"), col(idCol), col(groupCol),
        col("src_rank"), col(scoreCol))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023), the
    * data-engine form: per-domain losses come from ONE corpus-sized
    * pass of [[LanguageModel.lmScore]] against the reference slice
    * (loss = 1 − deterministic mean score), and the multiplicative-
    * weights trajectory over those frozen losses is then replayed for
    * `rounds` rounds on the bounded domain table. Two deliberate
    * departures from the paper, both for cross-engine determinism:
    * the update is the POLYNOMIAL MWU form `w · (1 + η·excess)`
    * (libm `exp` is not bit-reproducible across engines — the same
    * decision that keeps the whole LM family log-free), and the
    * excess loss is against the unweighted domain-mean rather than a
    * per-round proxy model (the engine curates data; it does not
    * train the proxy). Each round renormalizes over the
    * domain-ordered fold and mixes `eps` of uniform, exactly as the
    * paper's smoothing step does.
    *
    * 100 TB shape: the scoring pass is the only corpus-sized work;
    * everything after is O(#domains × rounds) on a barriered bounded
    * frame with one-row broadcast normalizers — iteration cost is
    * corpus-independent by construction (the q237 IPF discipline).
    *
    * Returns one row per (round 1..rounds, domain): scored-doc count,
    * loss, excess, and the post-round mixture weight. Documents the
    * scorer drops (no bigrams) are absent from the counts, matching
    * the oracle. */
  def doremiWeights(docs: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, domainCol: String, rounds: Int = 4,
      eta: Double = 0.5, eps: Double = 0.1): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"doremiWeights: rounds=$rounds out of range")
    import graft.core.Checkpoints.BarrierOps
    val scored = LanguageModel.lmScore(docs, ref, idCol, textCol,
      carryCols = Seq(domainCol))
    val loss = scored.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        graft.ops.Aggregates.orderedSum(col(idCol), col("score"))
          .as("ssum"))
      .select(col(domainCol), col("n_docs"),
        (lit(1.0) - col("ssum") / col("n_docs").cast("double"))
          .as("loss"))
      .barrier()
    val tot = loss.agg(
      graft.ops.Aggregates.orderedSum(col(domainCol), col("loss"))
        .as("lsum"),
      count(lit(1)).as("k")).barrier()
    val base = loss.crossJoin(broadcast(tot))
      .select(col(domainCol), col("n_docs"), col("loss"), col("k"),
        (col("loss") - col("lsum") / col("k").cast("double"))
          .as("excess"))
      .barrier()
    val w0 = base.withColumn("w",
      lit(1.0) / col("k").cast("double"))
    val perRound = (1 to rounds).scanLeft(w0) { (cur, _) =>
      val up = cur.withColumn("wu",
        col("w") * (lit(1.0) + lit(eta) * col("excess")))
      val z = up.agg(
        graft.ops.Aggregates.orderedSum(col(domainCol), col("wu"))
          .as("z"))
      // barrier per round — the ipfWeights discipline: each round's
      // frame feeds both the normalizer aggregation and the join
      up.crossJoin(broadcast(z))
        .select(col(domainCol), col("n_docs"), col("loss"), col("k"),
          col("excess"),
          ((lit(1.0) - lit(eps)) * col("wu") / col("z") +
            lit(eps) / col("k").cast("double")).as("w"))
        .barrier()
    }
    perRound.zipWithIndex.drop(1).map { case (r, i) =>
      r.select(lit(i).as("round"), col(domainCol), col("n_docs"),
        col("loss"), col("excess"), col("w").as("weight"))
    }.reduce(_.unionByName(_))
  }
}
