package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Checkpoints.BarrierOps

/** The composed corpus-release pipeline — what a training-data user
  * actually runs before cutting a dataset: exact dedup (keep the
  * lowest-id copy per byte-identical text, q40's fingerprint) →
  * 5-rule quality waterfall (TextOps.filterWaterfall's gates) →
  * passage-level duplicated-span scrub (TextOps.removeDupSpans) →
  * per-source release summary. Every stage is an independently
  * oracled operator; this is the q65-style composition at job level,
  * registered as `corpus_release` in [[graft.jobs.JobRunner]].
  * The [[releaseAndAuditLm]]/[[summaryLm]] variant (q235,
  * `corpus_release_lm`) inserts the CCNet-shaped reference-model
  * score gate ([[LanguageModel.lmScore]]) between the waterfall and
  * the scrub.
  *
  * Scale shape: the md5 window keys on the text fingerprint (uniform;
  * byte-identical mass collapses to one key each), the gate is the
  * waterfall's one shingle-df shuffle, the scrub re-runs span
  * detection over SURVIVORS only (the post-gate corpus — spans are
  * defined against what ships, not against dropped spam), and the
  * summary is one grouped aggregation. No driver-side state.
  */
object CorpusRelease {

  /** The dedup + waterfall frames both pipeline variants start from,
    * each boundary lazily checkpointed: the gate scans its input
    * twice (per-row rules + shingle df) and downstream consumers
    * (scrub, LM gate, audit) scan these frames several times more —
    * without the barrier Catalyst re-inlines the ENTIRE upstream
    * pipeline into every consumer and the composed plan multiplies
    * (measured 43 exchanges; with barriers each stage keeps its own
    * audited shape). Same trade-off note as Retrieval.bm25TopK.
    * Returns (tagged, ff): all docs with exact-dup flags; survivors
    * of exact dedup with their first-failing rule. */
  private def taggedAndGated(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(md5(col(textCol)))
    val tagged = docs
      .withColumn("__first", min(col(idCol)).over(w))
      .withColumn("__exact_dup", col(idCol) =!= col("__first"))
      .barrier()
    val exact = tagged.filter(!col("__exact_dup"))
    val ff = exact
      .join(TextOps.waterfallFirstFail(exact, idCol, textCol), Seq(idCol))
      .barrier()
    (tagged, ff)
  }

  private def staged(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val (tagged, ff) = taggedAndGated(docs, idCol, textCol)
    val rel = TextOps.removeDupSpans(
      ff.filter(col("ff") === 6).drop("ff"), idCol, textCol)
    (tagged, ff, rel)
  }

  /** The CCNet-shaped variant: after the waterfall, score every
    * survivor against the reference model learned from the
    * SURVIVORS' own `langCol = refLang` slice
    * ([[LanguageModel.lmScore]] — the reference is built post-dedup
    * post-gate, so spam and exact dups never pollute the model) and
    * keep docs with `score >= minScore`. The span scrub then runs
    * over LM-passing docs only (spans are defined against what
    * ships). Every waterfall survivor IS scored: rule 1 guarantees
    * ≥30 tokens, so the ≥2-token bigram precondition always holds
    * and the lmScore frame has no missing docs. An empty reference
    * slice scores everything 0.0 — with minScore > 0 the release is
    * empty, deterministically, rather than unfiltered.
    * Returns (tagged, ff, lms, rel). */
  private def stagedLm(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, refLang: String, minScore: Double)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (tagged, ff) = taggedAndGated(docs, idCol, textCol)
    val surv = ff.filter(col("ff") === 6).drop("ff")
    // scored survivors feed the gate filter AND the audit join —
    // barrier so the bigram explode + model build runs once
    val lms = LanguageModel
      .lmScore(surv, surv.filter(col(langCol) === refLang), idCol,
        textCol)
      .barrier()
    val pass = surv.join(
      lms.filter(col("score") >= minScore).select(col(idCol)),
      Seq(idCol))
    val rel = TextOps.removeDupSpans(pass, idCol, textCol)
    (tagged, ff, lms, rel)
  }

  private def releasedFrom(rel: DataFrame, docs: DataFrame,
      idCol: String, sourceCol: String): DataFrame =
    rel.join(docs.select(col(idCol), col(sourceCol)), Seq(idCol))

  private def summaryFrom(tagged: DataFrame, ff: DataFrame,
      rel: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val stages = tagged.select(col(idCol), col(sourceCol),
        col("__exact_dup"))
      .join(ff.select(col(idCol), col("ff")), Seq(idCol), "left")
      .join(rel.select(col(idCol), col("n_tokens"), col("n_removed")),
        Seq(idCol), "left")
    stages.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_in"),
        sum(when(col("__exact_dup"), 1L).otherwise(0L))
          .as("n_exact_dropped"),
        sum(when(!col("__exact_dup") && col("ff") =!= 6, 1L)
          .otherwise(0L)).as("n_gate_dropped"),
        sum(when(col("ff") === 6, 1L).otherwise(0L)).as("n_released"),
        sum(coalesce(col("n_removed"), lit(0L))).as("tokens_scrubbed"),
        sum(coalesce(col("n_tokens") - col("n_removed"), lit(0L)))
          .as("tokens_released"))
  }

  private def summaryLmFrom(tagged: DataFrame, ff: DataFrame,
      lms: DataFrame, rel: DataFrame, idCol: String, sourceCol: String,
      minScore: Double): DataFrame = {
    val stages = tagged.select(col(idCol), col(sourceCol),
        col("__exact_dup"))
      .join(ff.select(col(idCol), col("ff")), Seq(idCol), "left")
      .join(lms.select(col(idCol),
        // never NULL for ff=6 docs (see stagedLm invariant) — the
        // coalesce keeps a hypothetical gap in the dropped bucket
        // instead of vanishing from both counts
        coalesce(col("score"), lit(0.0)).as("score")), Seq(idCol),
        "left")
      .join(rel.select(col(idCol), col("n_tokens"), col("n_removed")),
        Seq(idCol), "left")
    stages.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_in"),
        sum(when(col("__exact_dup"), 1L).otherwise(0L))
          .as("n_exact_dropped"),
        sum(when(!col("__exact_dup") && col("ff") =!= 6, 1L)
          .otherwise(0L)).as("n_gate_dropped"),
        sum(when(col("ff") === 6 && col("score") < minScore, 1L)
          .otherwise(0L)).as("n_lm_dropped"),
        sum(when(col("ff") === 6 && col("score") >= minScore, 1L)
          .otherwise(0L)).as("n_released"),
        sum(coalesce(col("n_removed"), lit(0L))).as("tokens_scrubbed"),
        sum(coalesce(col("n_tokens") - col("n_removed"), lit(0L)))
          .as("tokens_released"))
  }

  /** Released documents: (idCol, n_tokens, n_removed, text_deduped,
    * sourceCol) for every doc that survives exact dedup + the
    * waterfall, with duplicated spans scrubbed. */
  def released(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val (_, _, rel) = staged(docs, idCol, textCol)
    releasedFrom(rel, docs, idCol, sourceCol)
  }

  /** Per-source release audit: docs in, dropped at each stage, docs
    * and tokens out. `tokens_scrubbed` counts tokens removed by the
    * span scrub from RELEASED docs only. */
  def summary(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val (tagged, ff, rel) = staged(docs, idCol, textCol)
    summaryFrom(tagged, ff, rel, idCol, sourceCol)
  }

  /** Both outputs off ONE staged pass — the export job's entry point:
    * calling [[released]] and [[summary]] separately re-runs the
    * md5 window, the waterfall shuffle, and the span scrub (the
    * job's three heaviest stages) once per output; here the shared
    * checkpointed frames serve both. */
  def releaseAndAudit(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): (DataFrame, DataFrame) = {
    val (tagged, ff, rel) = staged(docs, idCol, textCol)
    (releasedFrom(rel, docs, idCol, sourceCol),
      summaryFrom(tagged, ff, rel, idCol, sourceCol))
  }

  /** The LM-gated release (exact dedup → waterfall → CCNet-style
    * reference-model score gate → span scrub), both outputs off one
    * staged pass. The audit gains an `n_lm_dropped` stage column;
    * `n_released` counts docs that passed BOTH gates. `minScore` is a
    * calibration-run constant (CCNet fits its perplexity cutoffs on a
    * sample the same way — the mean smoothed probability scale moves
    * with reference vocabulary size, so the cutoff is data-dependent
    * by nature; q233's band histogram is the calibration artifact). */
  def releaseAndAuditLm(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String, refLang: String,
      minScore: Double): (DataFrame, DataFrame) = {
    val (tagged, ff, lms, rel) =
      stagedLm(docs, idCol, textCol, langCol, refLang, minScore)
    (releasedFrom(rel, docs, idCol, sourceCol),
      summaryLmFrom(tagged, ff, lms, rel, idCol, sourceCol, minScore))
  }

  /** Per-source audit of the LM-gated release (the `corpus_release_lm`
    * job frame). */
  def summaryLm(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String, refLang: String,
      minScore: Double): DataFrame = {
    val (tagged, ff, lms, rel) =
      stagedLm(docs, idCol, textCol, langCol, refLang, minScore)
    summaryLmFrom(tagged, ff, lms, rel, idCol, sourceCol, minScore)
  }
}
