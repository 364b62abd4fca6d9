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
  *
  * Scale shape: the md5 window keys on the text fingerprint (uniform;
  * byte-identical mass collapses to one key each), the gate is the
  * waterfall's one shingle-df shuffle, the scrub re-runs span
  * detection over SURVIVORS only (the post-gate corpus — spans are
  * defined against what ships, not against dropped spam), and the
  * summary is one grouped aggregation. No driver-side state.
  */
object CorpusRelease {

  /** The three staged frames every consumer derives from, each
    * boundary lazily checkpointed: the gate scans its input twice
    * (per-row rules + shingle df) and the scrub three times
    * (positions, coverage, rebuild) — without the barrier Catalyst
    * re-inlines the ENTIRE upstream pipeline into every consumer and
    * the composed plan multiplies (measured 43 exchanges; with
    * barriers each stage keeps its own audited shape). Same
    * trade-off note as Retrieval.bm25TopK. Returns
    * (tagged, ff, rel): all docs with exact-dup flags; survivors of
    * exact dedup with their first-failing rule; the scrubbed
    * released docs. */
  private def staged(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val w = Window.partitionBy(md5(col(textCol)))
    val tagged = docs
      .withColumn("__first", min(col(idCol)).over(w))
      .withColumn("__exact_dup", col(idCol) =!= col("__first"))
      .barrier()
    val exact = tagged.filter(!col("__exact_dup"))
    val ff = exact
      .join(TextOps.waterfallFirstFail(exact, idCol, textCol), Seq(idCol))
      .barrier()
    val rel = TextOps.removeDupSpans(
      ff.filter(col("ff") === 6).drop("ff"), idCol, textCol)
    (tagged, ff, rel)
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
}
