package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Checkpoints.BarrierOps

/** Sparse lexical retrieval over the corpus: BM25 scoring of a small
  * query set against every document — the retrieval side of a
  * dedup/decontamination/RAG-indexing pipeline (find the corpus
  * documents most similar to an eval question, rank candidate
  * contexts). The dense twin lives in [[Similarity]].
  *
  * Scoring is RATIONAL BM25: the standard Robertson idf is
  * `ln((N-df+0.5)/(df+0.5))` — but `ln`'s last-bit rounding is libm-
  * specific, so (same decision as the q57 TF-IDF score and the q82
  * mixture α) the engine keeps the UNLOGGED odds ratio
  * `(N-df+0.5)/(df+0.5)` as the rarity weight. Per-query rankings —
  * the operator's contract — are preserved for single-term queries
  * and near-preserved for multi-term ones (the log is monotone
  * per-term; only cross-term additive trade-offs shift), and every
  * arithmetic step (integer-sourced doubles, one division per factor,
  * a fold in sorted term order) is bit-identical across engines.
  *
  * Shape at 100 TB: the token explode feeds (a) per-(doc, term) tf for
  * QUERY TERMS ONLY — the probe list is broadcast, so the corpus side
  * filters before any shuffle and only matching (doc, term) pairs ever
  * move — and (b) per-term document frequencies, again only for the
  * probe terms (a handful of rows; broadcast back). Corpus-level
  * scalars (N, avgdl) are one agg row cross-joined as a broadcast.
  * The only corpus-sized shuffle is the per-(query, doc) score fold.
  */
object Retrieval {

  /** Top-`k` documents per query by rational BM25.
    *
    * `queries`: (queryIdCol, termCol) — one row per query term.
    * Output: (query_id, doc_id, score, rk), rk = 1..k by
    * (score desc, doc_id) — a total order, re-runs hash-match. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, queryIdCol: String, termCol: String,
      k1: Double = 1.2, b: Double = 0.75, k: Int = 5): DataFrame = {
    val toks = docs.select(col(idCol),
      size(TextOps.tokens(col(textCol))).cast("long").as("dl"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextOps.tokens(col(textCol))).cast("long")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    val probeTerms = queries.select(col(termCol).as("term")).distinct()
    val matched = toks.join(broadcast(probeTerms), Seq("term"))
    // tf is consumed TWICE (score fold + document frequencies below);
    // without the lazy localCheckpoint Catalyst inlines the whole
    // corpus scan + explode subtree into both consumers and neither
    // static planning nor AQE deduplicates the pair (verified on the
    // executed plan) — at 100 TB that recomputes the heaviest stage.
    // The checkpoint materializes tf once, both branches read blocks.
    val tf = matched.groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .barrier()
    bm25FromTf(tf, stats, queries, idCol, queryIdCol, termCol, k1, b, k)
  }

  /** [[bm25TopK]] over a PRE-BUILT query-term-filtered tf table
    * (one row per (doc, term, dl) with its count) and a one-row
    * (n_docs, avgdl) stats frame — the entry point for pipelines that
    * already materialized the postings/tf stage (q112's table, or a
    * composition like q163 that derives the probe terms from the same
    * explode): the corpus is tokenized ONCE instead of once per
    * consumer. Scoring, fold order, and ranking are byte-identical to
    * [[bm25TopK]], which delegates here. */
  def bm25FromTf(tf: DataFrame, stats: DataFrame, queries: DataFrame,
      idCol: String, queryIdCol: String, termCol: String,
      k1: Double, b: Double, k: Int): DataFrame = {
    // tf already holds exactly one row per (doc, term) — document
    // frequency is a count over it, not a second corpus scan
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val perTerm = tf
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(termCol).as("term"))), Seq("term"))
      .select(col("query_id"), col(idCol),
        ((col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
          (col("df").cast("double") + 0.5) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl").cast("double") /
              col("avgdl")))).as("s"),
        col("term"))
    // fold per (query, doc) in sorted term order: the double sum is
    // association-fixed, never partition-order-dependent
    val scored = perTerm
      .groupBy(col("query_id"), col(idCol))
      .agg(aggregate(
        transform(
          sort_array(collect_list(struct(col("term"), col("s")))),
          x => x.getField("s")),
        lit(0.0), (acc, v) => acc + v).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    scored.select(col("query_id"), col(idCol), col("score"),
      row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }
}
