package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-depth weight for [[rbo10]]: Σ_{d=m..10} (2520/d)·2^(10−d) —
    * a common doc at max-rank m contributes to every overlap depth
    * d ≥ m, so its total scaled weight is this suffix sum. */
  private val rboSuffixWeight: Column = {
    val cd = (1 to 10).map(dd => (2520 / dd) * (1 << (10 - dd)))
    val suffix = (1 to 10).map(m => cd.drop(m - 1).sum.toLong)
    (1 to 10).foldLeft(lit(0L)) { (acc, m) =>
      when(col("m") === m, lit(suffix(m - 1))).otherwise(acc)
    }
  }

  /** RM3 pseudo-relevance feedback: expand each query with the terms
    * its own top-`fbDocs` BM25 results are about. The relevance model
    * weights each feedback-doc term by the doc's retrieval score
    * times the term's in-doc frequency — `P_rm(t|q) ∝ Σ_d score_d ·
    * tf(t,d)/dl_d` — normalized by `Σ_d score_d` (exact because
    * `Σ_t tf/dl = 1` per doc), then interpolated with the uniform
    * original-query model at `origWeight`. Original terms absent from
    * every feedback doc survive via the interpolation (the base term
    * set is the union). Log-free throughout (the scores are the
    * rational-BM25 doubles; products, one division, ordered folds),
    * so the expansion hash-matches across engines.
    *
    * Shape at 100 TB: the first pass is [[bm25TopK]] (audited there);
    * everything after runs on the FEEDBACK SLICE — #queries × fbDocs
    * docs semi-join the corpus scan, so the second tokenize touches a
    * bounded set; folds order by doc id, ranks by (weight desc, term)
    * — total order, re-runs hash-match.
    *
    * Output: (query_id, term, weight, rk ≤ fbTerms). Queries whose
    * probe matches nothing yield no rows (no feedback to learn from). */
  def rm3Expansion(docs: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, queryIdCol: String, termCol: String,
      k1: Double = 1.2, b: Double = 0.75, fbDocs: Int = 5,
      fbTerms: Int = 10, origWeight: Double = 0.5): DataFrame = {
    require(origWeight >= 0.0 && origWeight <= 1.0,
      s"rm3Expansion: origWeight=$origWeight")
    // dedupe the query-term list up front: duplicate (query, term)
    // rows would double-count the term in the BM25 fold, inflate the
    // original-model denominator nq, AND fan out the interpolation
    // join into duplicate output rows eating fbTerms slots
    val qDistinct = queries
      .select(col(queryIdCol), col(termCol)).distinct()
    val q = qDistinct.select(col(queryIdCol).as("query_id"),
      col(termCol).as("term"))
    // top feeds the feedback-doc id set, the contribution join, AND
    // the per-query denominator — one bm25 pass, barriered
    val top = bm25TopK(docs, qDistinct, idCol, textCol, queryIdCol,
        termCol, k1, b, fbDocs)
      .select(col("query_id"), col(idCol), col("score"))
      .barrier()
    val fbIds = top.select(col(idCol)).distinct()
    val toks = docs.join(fbIds, Seq(idCol), "left_semi")
      .select(col(idCol),
        size(TextOps.tokens(col(textCol))).cast("long").as("dl"),
        explode(TextOps.tokens(col(textCol))).as("term"))
    val ftf = toks.groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    def fold(ord: Column, x: Column, f: String): Column =
      graft.ops.Aggregates.orderedSum(ord, x)
    val num = top.join(ftf, Seq(idCol))
      .select(col("query_id"), col("term"), col(idCol),
        (col("score") * (col("tf").cast("double") /
          col("dl").cast("double"))).as("c"))
      .groupBy(col("query_id"), col("term"))
      .agg(fold(col(idCol), col("c"), "c").as("num"))
    val den = top.groupBy(col("query_id"))
      .agg(fold(col(idCol), col("score"), "s").as("den"))
    val qn = q.groupBy(col("query_id")).agg(count(lit(1)).as("nq"))
    val baseTerms = num.select(col("query_id"), col("term"))
      .unionByName(q).distinct()
    val w = baseTerms
      .join(num, Seq("query_id", "term"), "left")
      .join(den, Seq("query_id"))
      .join(broadcast(qn), Seq("query_id"))
      .join(q.withColumn("__orig", lit(1)),
        Seq("query_id", "term"), "left")
      .select(col("query_id"), col("term"),
        (lit(origWeight) *
          when(col("__orig").isNotNull,
            lit(1.0) / col("nq").cast("double")).otherwise(lit(0.0)) +
          lit(1.0 - origWeight) *
            (coalesce(col("num"), lit(0.0)) / col("den")))
          .as("weight"))
    w.withColumn("rk",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("weight").desc, col("term"))).cast("int"))
      .filter(col("rk") <= fbTerms)
  }

  /** Truncated rank-biased overlap at depth 10 with persistence
    * p = 1/2, normalized so identical lists score 1.0 — the
    * label-free way to compare two RANKERS (BM25 vs dense, full-dim
    * vs truncated-dim) query by query: top-weighted, defined even
    * when the lists share little. Unlike q200's labeled metrics, RBO
    * needs no ground truth.
    *
    * Engine-exact by the dyadic trick: p = 1/2 makes every depth
    * weight p^{d+1}/d a dyadic rational; scaling by lcm(1..10)·2^11
    * turns each common doc's contribution into an INTEGER lookup on
    * its max rank (suffix-summed weights), summed exactly and divided
    * ONCE by the identical-list maximum (2520·1023).
    *
    * Inputs are rank lists (query_id, cand_id, rk ≤ 10); both sides
    * are nQueries×10 rows, so the comparison join is trivially
    * bounded — the expense lives in whatever produced the rankings.
    * Queries with disjoint lists surface with rbo = 0. */
  def rbo10(a: DataFrame, b: DataFrame): DataFrame = {
    // a feeds both the query universe and the comparison join —
    // barrier so the (often expensive) ranking pipeline behind it is
    // materialized once, not re-planned per consumer; both rank lists
    // and the per-query aggregate are nQueries×10-bounded, so every
    // join here broadcasts.
    val aa = a.select(col("query_id"), col("cand_id"),
      col("rk").as("ra")).barrier()
    val qs = aa.select(col("query_id")).distinct()
    val joined = aa
      .join(broadcast(b.select(col("query_id"), col("cand_id"),
        col("rk").as("rb"))), Seq("query_id", "cand_id"))
      .withColumn("m", greatest(col("ra"), col("rb")))
    val per = joined.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_common"),
        sum(rboSuffixWeight).as("s_scaled"))
    qs.join(broadcast(per), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("s_scaled"), lit(0L)).as("s_scaled"),
        (coalesce(col("s_scaled"), lit(0L)).cast("double") /
          lit(2577960.0)).as("rbo"))
  }
}
