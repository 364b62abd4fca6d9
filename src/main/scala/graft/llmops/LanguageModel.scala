package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.BarrierOps
import graft.ops.Aggregates

/** Count-based language-model scoring for corpus curation — the
  * CCNet-style "score every document against a clean reference model"
  * step and the DSIR-style "importance-weight every document toward a
  * target distribution" step, re-expressed as pure count arithmetic.
  *
  * DELIBERATELY LOG-FREE (the q57/q87 decision, same rationale):
  * perplexity and log-likelihood ratios need `ln`, whose last-bit
  * rounding is libm-specific, so cross-engine hash verification would
  * be impossible. The engine keeps the rational analogs —
  *
  *  - [[lmScore]]: the MEAN Laplace-smoothed bigram probability
  *    (arithmetic mean instead of the geometric mean perplexity
  *    implies) plus the out-of-vocabulary bigram rate. Both order
  *    documents by in-distribution-ness exactly as a screening filter
  *    needs; every per-bigram probability is ONE division of exact
  *    integers and the per-doc sum folds in position order, so
  *    results are bit-identical across engines.
  *  - [[dsirWeights]]: the mean per-token probability RATIO between
  *    target and raw hashed-feature distributions (the rational
  *    analog of DSIR's mean log-ratio; Xie et al. 2023 select by
  *    rank, and the ratio mean ranks monotonically where the
  *    per-token ratios do).
  *
  * Scale shapes:
  *  - Bigram/prefix count tables are reference-vocabulary-sized; the
  *    score join shuffles corpus bigrams on (w1,w2) then w1 — linear,
  *    term-shardable, with AQE free to broadcast the count side when
  *    the reference is small.
  *  - DSIR feature tables are BOUNDED at `buckets` rows by
  *    construction (hashed features), so both distributions broadcast
  *    at any corpus size; the only corpus-sized work is one token
  *    explode + one per-doc fold.
  *  - Per-doc folds are one hash aggregation keyed by the doc id —
  *    no windows, no driver state.
  */
object LanguageModel {

  import TextOps.{hash60, tokens}

  /** One row per consecutive token pair: (idCol, pos, w1, w2).
    * Documents with fewer than 2 tokens contribute no rows. */
  def bigrams(df: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    val tk = tokens(col(textCol))
    val keep = col(idCol) +: carryCols.map(col)
    df.select(keep :+ posexplode(
        when(size(tk) >= 2,
          zip_with(slice(tk, lit(1), size(tk) - 1),
            slice(tk, lit(2), size(tk) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as(Seq("pos", "bg")): _*)
      .select(keep ++ Seq(col("pos").cast("long").as("pos"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2")): _*)
  }

  /** Reference bigram counts: (w1, w2, c). */
  def bigramCounts(ref: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    bigrams(ref, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))

  /** The Laplace-smoothed reference model: (w1, w2, c, c1, p) with
    * `p = (c+1)/(c1+V)` — prefix counts derived from the bigram table
    * (Σ_w2 c(w1,w2)), V = |distinct reference tokens|. Integer counts
    * and ONE division keep every probability bit-exact. */
  def bigramModel(ref: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // barrier the count table: it feeds BOTH the prefix derivation
    // and the final join — without it the explode+agg subtree plans
    // (and runs) twice
    val rc = bigramCounts(ref, idCol, textCol).barrier()
    val pc = rc.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
    val v = ref
      .select(explode(tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).as("V"))
    rc.join(pc, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("w1"), col("w2"), col("c"), col("c1"),
        ((col("c") + 1L).cast("double") /
          (col("c1") + col("V")).cast("double")).as("p"))
  }

  /** Per-document rational LM score against a reference slice:
    * (idCol, n_bigrams, n_oov, score) where score = mean smoothed
    * bigram probability under [[bigramModel]](ref) and n_oov counts
    * bigrams absent from the reference. Unseen prefixes fall back to
    * the uniform 1/V (c=c1=0 in the same formula). Documents with no
    * bigrams are dropped (score undefined). An EMPTY reference (V=0)
    * scores every document 0.0 rather than dividing by zero. */
  def lmScore(docs: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, carryCols: Seq[String] = Nil): DataFrame = {
    // the bigram count table is a dimension build consumed TWICE
    // (directly, and via the prefix derivation) — barriered so the
    // reference explode+agg subtree runs once. pc and v each have a
    // single consumer in the score join, so barriers there would buy
    // nothing and cost a localCheckpoint materialization each
    // (measured ~0.2 s off q232's warm floor when removed).
    val rc = bigramCounts(ref, idCol, textCol).barrier()
    val pc = rc.groupBy(col("w1")).agg(sum(col("c")).as("c1"))
    val v = ref
      .select(explode(tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).as("V"))
    scoreJoin(docs, rc, pc, v, idCol, textCol, carryCols)
  }

  /** [[lmScore]] against a FROZEN model — the streaming / repeated-
    * scoring variant: `model` is a [[bigramModel]] output read as a
    * plain dimension frame, `vocabSize` its reference vocabulary
    * size. No reference scan per call; semantics identical to
    * [[lmScore]] (unseen-prefix fallback, V=0 pins scores 0.0). */
  def lmScoreFrozen(docs: DataFrame, model: DataFrame, vocabSize: Long,
      idCol: String, textCol: String, carryCols: Seq[String] = Nil)
      : DataFrame = {
    val rc = model.select(col("w1"), col("w2"), col("c"))
    // c1 repeats on every (w1, w2) model row — one distinct recovers
    // the prefix table without re-aggregating anything
    val pc = model.select(col("w1"), col("c1")).distinct()
    val v = docs.sparkSession.range(1)
      .select(lit(vocabSize).as("V"))
    scoreJoin(docs, rc, pc, v, idCol, textCol, carryCols)
  }

  /** Reference vocabulary size for [[lmScoreFrozen]] — one scalar off
    * a dimension-sized distinct (a driver action by design: the model
    * freeze is a once-per-release step, not per-batch work). */
  def refVocabSize(ref: DataFrame, textCol: String): Long =
    ref.select(explode(tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)

  private def scoreJoin(docs: DataFrame, rc: DataFrame, pc: DataFrame,
      v: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String]): DataFrame = {
    val bg = bigrams(docs, idCol, textCol, carryCols)
    val scored = bg
      .join(rc, Seq("w1", "w2"), "left")
      .join(pc, Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .select((col(idCol) +: carryCols.map(col)) ++ Seq(col("pos"),
        col("c"),
        when(col("V") === 0L, lit(0.0)).otherwise(
          (coalesce(col("c"), lit(0L)) + 1L).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("V")).cast("double"))
          .as("p")): _*)
    scored
      .groupBy(col(idCol) +: carryCols.map(col): _*)
      .agg(count(lit(1)).as("n_bigrams"),
        coalesce(Aggregates.countIf(col("c").isNull), lit(0L))
          .as("n_oov"),
        (orderedSum(col("pos"), col("p"), "p") /
          count(lit(1)).cast("double")).as("score"))
  }

  /** Fixed-decile score-band histogram per language — the q233 /
    * `lm_calibration` calibration artifact an operator reads to pick
    * a [[CorpusRelease.releaseAndAuditLm]] cutoff: (langCol, band,
    * n_docs, min_score, max_score) with band = min(⌊score·10⌋, 9).
    * One further hash aggregation over [[lmScore]] — never a
    * per-language global sort (the quantile variant is q191's ntile
    * shape, deliberately not repeated here). */
  def scoreBands(docs: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, langCol: String): DataFrame =
    bandHistogram(
      lmScore(docs, ref, idCol, textCol, carryCols = Seq(langCol)),
      langCol)

  /** The band-histogram aggregation itself, over any frame carrying
    * (langCol, score) — ONE definition shared by [[scoreBands]] and
    * the streaming store (`Streams.toScoreBandStore`), so the "store
    * equals the q233 histogram" claim is structural, not a parallel
    * copy that can drift. */
  def bandHistogram(scored: DataFrame, langCol: String): DataFrame =
    scored.groupBy(col(langCol),
        least(floor(col("score") * 10).cast("long"), lit(9L))
          .as("band"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))

  /** Per-document DSIR-style importance weight toward a target slice:
    * (idCol, n_toks, weight). Features are `hash60(token) % buckets`;
    * weight = mean over token positions of the smoothed probability
    * ratio `p_target(f)/p_raw(f)` with
    * `p(f) = (count(f)+1)/(total+buckets)`. Every per-feature ratio
    * is computed as exactly two double products and one division on
    * integer-sourced operands — identical IEEE rounding in any
    * engine. Raw counts cover every observed feature, so only the
    * target side needs the missing-feature fallback. */
  def dsirWeights(docs: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"dsirWeights: buckets=$buckets")
    def feats(df: DataFrame): DataFrame =
      df.select(col(idCol), posexplode(tokens(col(textCol)))
          .as(Seq("pos", "tok")))
        .select(col(idCol), col("pos").cast("long").as("pos"),
          pmod(hash60(col("tok")), lit(buckets.toLong)).as("ft"))
    val raw = feats(docs).barrier()
    val tgt = feats(target)
    val rawCounts = raw.groupBy(col("ft")).agg(count(lit(1)).as("cr"))
    val tgtCounts = tgt.groupBy(col("ft")).agg(count(lit(1)).as("ct"))
    val totals = rawCounts.agg(sum(col("cr")).as("R"))
      .crossJoin(tgtCounts.agg(
        coalesce(sum(col("ct")), lit(0L)).as("T")))
    // feature table: ≤ buckets rows whatever the corpus size, and a
    // SINGLE consumer (the broadcast into the per-doc join) — no
    // barrier: its subtree reads the barriered raw explode, so
    // nothing corpus-sized re-plans, and a checkpoint here would
    // just add a materialization (the q232 single-consumer lesson)
    val ratios = rawCounts
      .join(tgtCounts, Seq("ft"), "left")
      .crossJoin(broadcast(totals))
      .select(col("ft"),
        ((coalesce(col("ct"), lit(0L)) + 1L).cast("double") *
          (col("R") + buckets.toLong).cast("double") /
          ((col("cr") + 1L).cast("double") *
            (col("T") + buckets.toLong).cast("double"))).as("r"))
    raw
      .join(broadcast(ratios), Seq("ft"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        (orderedSum(col("pos"), col("r"), "r") /
          count(lit(1)).cast("double")).as("weight"))
  }

  /** Position-ordered double sum — [[Aggregates.orderedSum]], kept
    * as a local alias so call sites read as the scoring math. */
  private def orderedSum(ord: Column, x: Column,
      fieldName: String): Column = Aggregates.orderedSum(ord, x)
}
