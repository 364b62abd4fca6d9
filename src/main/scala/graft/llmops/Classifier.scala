package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Hashed linear classifier — the fastText shape (`wordNgrams=2`,
  * `bucket=B` feature hashing) that quality-gates corpora in
  * CCNet-style pipelines: INFERENCE over a weight table
  * ([[hashedBigramMargin]] with the deterministic pseudo-model,
  * [[marginWithWeights]] with a trained one) and TRAINING
  * ([[trainHashedLogistic]]) — full-batch gradient descent on a
  * logistic surrogate, engineered for the engine's two contracts:
  *
  *  - **Determinism without libm.** The true sigmoid needs `exp`,
  *    which is not cross-engine reproducible (the q57/q87 decision),
  *    so the link is the FAST SIGMOID σ̂(z) = 1/2 + z/(2(1+|z|)) —
  *    same fixed points (σ̂(0)=1/2, →0/1 at ±∞), same monotonicity,
  *    and only +,·,/,|·| — IEEE ops that are bit-identical in any
  *    engine. Gradient and margin folds sum FLOOR-QUANTIZED terms
  *    (units of 10⁻¹²): each term `floor(v · 10¹²)` is the same
  *    integer in every engine because the product is the same IEEE
  *    double and floor has no tie cases — unlike a double→DECIMAL
  *    cast, whose semantics measurably differ (DuckDB rounds
  *    v·10^s computed in DOUBLE arithmetic; Java/Spark rounds the
  *    exact binary expansion — they disagree below the 17th digit).
  *    The integer terms sum exactly (order-independent, map-side
  *    combinable — never a per-group collect_list), so every epoch
  *    is replay- and oracle-exact at any parallelism. The 10⁻¹²
  *    quantization is part of the algorithm, not an approximation
  *    bolted on: ~1e-12 per-term truncation is five orders below
  *    any gradient signal.
  *  - **Scale shape.** Featurization is ONE explode + one (doc,
  *    bucket) count — computed once and barriered, with the per-doc
  *    normalizer carried in closed form from the token array (2n−1
  *    features for n tokens), so no per-doc window or sort anywhere
  *    (r14). Each epoch is two corpus-sized hash aggregations
  *    (per-doc margin, per-bucket gradient) plus one BROADCAST join
  *    of the ≤ B-row weight table; weights barrier per epoch so the
  *    plan stays epoch-sized. E epochs = E linear passes — no
  *    driver-side loops over data, no all-pairs anything.
  */
object Classifier {

  /** Rational sigmoid surrogate σ̂(z) = 1/2 + z/(2(1+|z|)) ∈ (0,1):
    * the libm-free link function of [[trainHashedLogistic]]. */
  def fastSigmoid(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Integer bucket weight of the deterministic pseudo-model:
    * w(bucket) = (bucket · 2654435761) mod 1001 − 500 ∈ [−500, 500]
    * (Knuth's multiplicative constant scrambles adjacent buckets).
    * Exposed so specs and oracles can replay it. */
  def bucketWeight(bucket: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    (bucket * lit(2654435761L)) % lit(1001L) - lit(500L)

  /** Per-document linear margin over hashed unigram + bigram
    * features: margin = Σ w(h(f) mod B) / (500 · n_feats) ∈ [−1, 1].
    * The sum is integral (order-free, exact at any parallelism); the
    * single division is the only IEEE op. No sigmoid on purpose —
    * exp is not cross-engine reproducible, and gating/ranking only
    * needs the monotone margin.
    *
    * One token explode + one hash aggregation per document; weights
    * are computed inline (a trained B-row table would broadcast).
    * Returns (idCol, carryCols…, n_feats, margin). */
  def hashedBigramMargin(df: DataFrame, idCol: String,
      textCol: String, carryCols: Seq[String], buckets: Int)
      : DataFrame = {
    require(buckets >= 1, s"hashedBigramMargin: buckets=$buckets")
    val keep = col(idCol) +: carryCols.map(col)
    explodeFeatures(df, keep, textCol)
      .withColumn("wi", bucketWeight(
        pmod(TextOps.hash60(col("f")), lit(buckets.toLong))))
      .groupBy(keep: _*)
      .agg(sum(col("wi")).as("sw"), count(lit(1)).as("n_feats"))
      .withColumn("margin", col("sw").cast("double") /
        (lit(500.0) * col("n_feats").cast("double")))
      .drop("sw")
  }

  /** ONE explode of unigrams ++ bigrams — a single corpus scan (a
    * union of two explodes would read the text column twice).
    * Bigram feature = "w1 w2": tokens are space-split, so a joined
    * bigram can never collide with a unigram. The SHARED
    * featurization of scorer and trainer — a gate scoring with
    * trained weights must hash exactly the features the trainer
    * weighted.
    *
    * `withCount = true` additionally emits `__nf`, the doc's TOTAL
    * feature count, computed in closed form from the token array
    * BEFORE the explode: n tokens yield n unigrams + (n−1) bigrams =
    * 2n−1 features (n = 1 gives 1; n = 0 explodes no rows, so the
    * negative literal never surfaces). This is exactly the
    * `sum(cnt) OVER (PARTITION BY doc)` the per-doc normalization
    * used to compute with a window — same long, zero extra exchange,
    * zero sort (the r14 optimization: the window was one full
    * Exchange + Sort per featurization). */
  private def explodeFeatures(df: DataFrame, keep: Seq[Column],
      textCol: String, withCount: Boolean = false): DataFrame = {
    val tk = df.select(keep :+ TextOps.tokens(col(textCol)).as("t"): _*)
    val bigr = when(size(col("t")) >= 2, zip_with(
      slice(col("t"), lit(1), size(col("t")) - 1),
      slice(col("t"), lit(2), size(col("t")) - 1),
      (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    val nf =
      if (withCount)
        Seq((size(col("t")) * lit(2) - lit(1)).cast("long").as("__nf"))
      else Seq.empty
    tk.select(keep ++ nf :+ explode(concat(col("t"), bigr)).as("f"): _*)
  }

  /** The trainer's design matrix: one row per (doc, bucket) with
    * x = cnt/n_feats (fastText's mean-of-feature-vectors
    * normalization — a long doc does not out-vote a short one) and
    * the label as `y` ∈ {0,1} double. One explode + one hash
    * aggregation — the per-doc normalizer is the closed-form 2n−1
    * feature total carried from the token array, so there is no
    * window and no sort here (r14).
    *
    * PRECONDITION: `idCol` must be unique per input row (one text per
    * doc id). The closed form is per-ROW; the old window summed per
    * PARTITION BY id — with duplicate ids the two normalizers (and
    * the resulting x) diverge, and differing __nf values would split
    * the group. Every caller (trainHashedLogistic via corpus ids,
    * the q290-295 queries) satisfies this by construction. */
  def hashedFeatures(df: DataFrame, idCol: String, labelCol: String,
      textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"hashedFeatures: buckets=$buckets")
    val base = df.select(col(idCol),
      col(labelCol).cast("double").as("y"), col(textCol))
    // per-doc total feature count rides along from the token array
    // (2n−1, see explodeFeatures) instead of a post-agg window —
    // sum(cnt) over the doc IS that total, so x is bit-identical and
    // the featurization drops one Exchange + Sort
    explodeFeatures(base, Seq(col(idCol), col("y")), textCol,
        withCount = true)
      .withColumn("bucket",
        pmod(TextOps.hash60(col("f")), lit(buckets.toLong)))
      .groupBy(col(idCol), col("y"), col("__nf"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("x", col("cnt").cast("double") /
        col("__nf").cast("double"))
      .select(col(idCol), col("y"), col("bucket"), col("x"))
  }

  /** TRAIN the hashed-bigram gate: full-batch gradient descent on the
    * fast-sigmoid logistic surrogate over [[hashedFeatures]], `lr`
    * fixed, weights zero-initialized (margin 0 → σ̂ = 1/2 for every
    * doc, so epoch 1's gradient is the pure class-direction
    * (1/2 − y)·x). Returns the weight table (bucket, w) — at most
    * `buckets` rows, broadcastable by construction — which
    * [[marginWithWeights]] (or a `--clf-min-margin` release gate)
    * consumes.
    *
    * Per epoch: margin m_d = (Σ_b ⌊w_b·x_db·10¹²⌋)/10¹² (exact
    * integer fold), residual r_d = σ̂(m_d) − y_d, gradient
    * g_b = ((Σ_d ⌊r_d·x_db·10¹²⌋)/10¹²)/N (exact integer fold),
    * update w_b ← w_b − lr·g_b. Epochs barrier so the plan is
    * epoch-sized, not 2^epochs; the feature table is computed once
    * and barriered. Every fold is order-independent (integer-exact),
    * so training is replay-deterministic at any parallelism and
    * shuffle layout — the property the q290 oracle hash-checks end
    * to end. */
  def trainHashedLogistic(df: DataFrame, idCol: String,
      labelCol: String, textCol: String, buckets: Int,
      epochs: Int = 3, lr: Double = 1.0, l2: Double = 0.0)
      : DataFrame = {
    require(epochs >= 1, s"trainHashedLogistic: epochs=$epochs")
    require(l2 >= 0.0 && lr * l2 < 1.0,
      s"trainHashedLogistic: l2=$l2 (decay 1−lr·l2 must stay in (0,1])")
    import graft.core.Checkpoints.BarrierOps
    val feats =
      hashedFeatures(df, idCol, labelCol, textCol, buckets).barrier()
    // labels are a contract, not a convention: a NULL or non-{0,1}
    // label would flow through the residual into the gradient sum and
    // silently poison every weight (NULL) or skew the fit (y=3) —
    // fail fast instead. The bad-label count piggybacks on the N
    // aggregation (one pass, one bounded two-value action — not an
    // extra corpus scan)
    val head = feats.agg(
        countDistinct(col(idCol)).as("n"),
        sum(when(col("y").isNull ||
          (col("y") =!= 0.0 && col("y") =!= 1.0), 1L)
          .otherwise(0L)).as("bad"))
      .first()
    require(head.isNullAt(1) || head.getLong(1) == 0L,
      s"trainHashedLogistic: label column '$labelCol' must be 0/1 " +
        "and non-NULL for every row")
    val nDocs = head.getLong(0).toDouble
    val spark = df.sparkSession
    var weights = spark.range(0).select(col("id").as("bucket"),
      col("id").cast("double").as("w"))
    // Epoch shape (kept from r13 — re-derived and re-measured this
    // round): margin by hash aggregation + residual join-back. The
    // r14 window-margin variant (id-repartitioned persisted feats +
    // partition-local window, zero per-epoch exchanges) was built and
    // A/B-measured ~40% SLOWER at sf0.1 (the one-time repartition +
    // columnar cache build outweigh the removed exchanges at E=3-5,
    // and the residual frame below auto-broadcasts locally), so it
    // was rejected; see OPTIMIZATION_r14.md for the numbers.
    (1 to epochs).foreach { _ =>
      val m = feats
        .join(broadcast(weights), Seq("bucket"), "left")
        .groupBy(col(idCol), col("y"))
        .agg(quantizedFoldDiv(
          coalesce(col("w"), lit(0.0)) * col("x")).as("m"))
      val r = m.select(col(idCol),
        (fastSigmoid(col("m")) - col("y")).as("r"))
      val g = feats.join(r, Seq(idCol))
        .groupBy(col("bucket"))
        .agg((quantizedFoldDiv(col("r") * col("x"))
          / lit(nDocs)).as("g"))
      // L2 weight decay as the standard multiplicative shrink
      // w ← w·(1 − lr·λ) − lr·g: one extra broadcast-side multiply
      // per epoch, still a pure IEEE product so the integer-fold
      // replay contract is untouched (the decay factor is a pinned
      // double literal both engines parse identically). λ = 0 keeps
      // the factor at exactly 1.0 — a no-op by IEEE identity
      val decay = 1.0 - lr * l2
      weights = weights.join(g, Seq("bucket"), "full")
        .select(col("bucket"),
          (coalesce(col("w"), lit(0.0)) * lit(decay)
            - lit(lr) * coalesce(col("g"), lit(0.0))).as("w"))
        .barrier()
    }
    weights
  }

  /** The tie-free deterministic double fold (see object doc): sum of
    * ⌊v·10¹²⌋ as exact integers (DECIMAL(38,0) so a 100 TB corpus
    * cannot overflow a long), divided back by 10¹². AGGREGATE
    * expression — use inside agg(). */
  private def quantizedFoldDiv(v: Column): Column =
    sum(floor(v * lit(1.0e12)).cast(DecimalType(38, 0)))
      .cast("double") / lit(1.0e12)


  /** Score with a TRAINED weight table: per-doc margin
    * m = (Σ_b ⌊w_b·(cnt_b/n_feats)·10¹²⌋)/10¹² through the same
    * featurization and the same tie-free quantized fold as the
    * trainer — so a training-set doc's gate margin is bit-identical
    * to its last training margin. Same plan shape as
    * [[hashedBigramMargin]] plus one broadcast of the ≤ B-row weight
    * table. Returns (idCol, carryCols…, n_feats, margin).
    *
    * PRECONDITION: `idCol` unique per input row, as in
    * [[hashedFeatures]] — the closed-form n_feats is per-row, where
    * the pre-r14 window summed across duplicate ids. */
  def marginWithWeights(df: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String], weights: DataFrame, buckets: Int)
      : DataFrame = {
    require(buckets >= 1, s"marginWithWeights: buckets=$buckets")
    val keep = col(idCol) +: carryCols.map(col)
    // the per-doc feature total (normalizer AND n_feats output) is the
    // closed-form 2n−1 carried from the token array (explodeFeatures
    // withCount) — both per-doc windows the scorer used to run are
    // gone, so the plan is explode → one hash aggregation → broadcast
    // weight join → one hash aggregation, no Sort anywhere (r14)
    val cnt = explodeFeatures(df, keep, textCol, withCount = true)
      .withColumn("bucket",
        pmod(TextOps.hash60(col("f")), lit(buckets.toLong)))
      .groupBy(keep ++ Seq(col("__nf"), col("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("x", col("cnt").cast("double") /
        col("__nf").cast("double"))
    cnt.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(keep: _*)
      .agg(max(col("__nf")).as("n_feats"),
        quantizedFoldDiv(
          coalesce(col("w"), lit(0.0)) * col("x")).as("margin"))
  }

  /** HELD-OUT threshold selection — the step between
    * [[trainHashedLogistic]] and a `--clf-min-margin` release gate
    * that stops the threshold from being read off the training set
    * (where the fit is optimistic by construction; ClassifierSpec
    * plants an overfit corpus and pins the divergence): split the
    * corpus deterministically (`Mixture.trainSplit` — hash-bucket
    * assignment, stable as the corpus grows), train on the `train`
    * side only, score the UNSEEN `val` side through
    * [[marginWithWeights]], and emit one row per candidate threshold
    * θ with the numbers an operator reads to pick the gate: held-out
    * pass count / pass rate, confusion counts against the label
    * (tp/fp/fn at margin ≥ θ), precision and recall. The `test` side
    * is never touched — it stays in reserve for a final audit after
    * the threshold is frozen.
    *
    * The candidate grid is DERIVED from the held-out margins —
    * `gridSize`+1 equi-spaced points over [min, max] of the observed
    * distribution (θ_i = mn + (mx−mn)·(i/k), the same IEEE ops in
    * the same order in the oracle, so the data-dependent grid still
    * replays bit-for-bit) — because the trained margins live in a
    * narrow data-dependent band (E lr-scaled mean-gradient steps
    * from zero init): any fixed literal grid degenerates to
    * all-pass/all-fail rows at some corpus scale. Every emitted
    * count is an exact integer; pass_rate / precision / recall are
    * single IEEE divisions (NULL when the denominator is 0 — no
    * passes, or no positives), so the table oracle-replays
    * bit-for-bit (q293). Scale shape: one training run (E linear
    * passes), one scoring pass over the val slice, one 2-value
    * min/max aggregate, then a |val| × (k+1) broadcast cross join
    * into a (k+1)-group hash aggregation — map-side combinable, the
    * grid side is a bounded broadcast frame. */
  def holdoutThresholdTable(df: DataFrame, idCol: String,
      labelCol: String, textCol: String, buckets: Int,
      gridSize: Int = 8, epochs: Int = 3, lr: Double = 1.0,
      trainPct: Int = 80, valPct: Int = 10,
      splitSalt: String = ":split", l2: Double = 0.0): DataFrame = {
    require(gridSize >= 1,
      s"holdoutThresholdTable: gridSize=$gridSize")
    val split = Mixture.trainSplit(df, idCol, trainPct, valPct,
      splitSalt)
    val w = trainHashedLogistic(
      split.filter(col("split") === "train"),
      idCol, labelCol, textCol, buckets, epochs, lr, l2)
    val scored = marginWithWeights(
      split.filter(col("split") === "val"),
      idCol, textCol, Seq(labelCol), w, buckets)
    val th = scored
      .agg(min(col("margin")).as("mn"), max(col("margin")).as("mx"))
      .select(explode(sequence(lit(0), lit(gridSize))).as("i"),
        col("mn"), col("mx"))
      .select((col("mn") + (col("mx") - col("mn"))
        * (col("i").cast("double") / lit(gridSize.toDouble)))
        .as("threshold"))
    val pass = col("margin") >= col("threshold")
    val y1 = col(labelCol).cast("double") === 1.0
    def cnt(cond: Column): Column =
      sum(when(cond, 1L).otherwise(0L))
    scored
      .select(col(labelCol), col("margin"))
      .crossJoin(broadcast(th))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_docs"),
        cnt(pass).as("n_pass"),
        cnt(pass && y1).as("tp"),
        cnt(pass && !y1).as("fp"),
        cnt(!pass && y1).as("fn"))
      .withColumn("pass_rate", col("n_pass").cast("double") /
        col("n_docs").cast("double"))
      .withColumn("precision",
        when(col("n_pass") > 0L, col("tp").cast("double") /
          col("n_pass").cast("double")))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0L, col("tp").cast("double") /
          (col("tp") + col("fn")).cast("double")))
  }
}
