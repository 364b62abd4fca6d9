package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Checkpoints.BarrierOps

/** Corpus-composition diagnostics over the unigram token distribution:
  * lexical diversity per source, pairwise distributional distance
  * between sources, and core-vocabulary coverage. These are the
  * "what changed in the mix" monitors a training-data pipeline runs
  * per snapshot — drift in any of them flags a scrape/filter bug
  * before a model ever trains on the data.
  *
  * Determinism contract (the repo-wide oracle-parity rules): every
  * statistic is integer/decimal-exact up to ONE final IEEE division
  * (or division-product chain evaluated in one fixed association), so
  * results are bit-identical on any engine and any partitioning. No
  * logs — entropy-style diversity is expressed as Gini–Simpson
  * (1 − Σp², a rational function of counts) rather than Shannon
  * entropy, whose `ln` rounds differently across libm builds.
  *
  * Scale shape: everything reduces over the (source, token) count
  * table — one shuffle to build, map-side combinable; the per-source
  * tables that follow are #sources/#tokens-bounded. The pairwise
  * distance joins the count table with itself on token (hash join on
  * the same exchange) and the totals table is a broadcast scalar per
  * source. Nothing is quadratic in documents.
  */
object CorpusDiversity {

  private def tokenCounts(df: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    df.select(col(groupCol), explode(TextOps.tokens(col(textCol)))
        .as("term"))
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-group lexical diversity: token count, type count, type–token
    * ratio, and Gini–Simpson index 1 − Σ(cnt/N)² = 1 − Σcnt²/N².
    * Σcnt² is summed as DECIMAL(38,0) (cnt² overflows BIGINT once a
    * token's count passes ~3·10⁹ — reachable per source at 100 TB),
    * then divided once as DOUBLE. */
  def tokenDiversity(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val c = tokenCounts(df, groupCol, textCol)
    val nTok = col("n_tokens").cast("double")
    c.groupBy(col(groupCol))
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum((col("cnt") * col("cnt")).cast(DecimalType(38, 0)))
          .as("sumsq"))
      .select(col(groupCol),
        col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / nTok).as("ttr"),
        (lit(1.0) - col("sumsq").cast("double") / (nTok * nTok))
          .as("gini_simpson"))
  }

  /** Pairwise total-variation distance between the unigram
    * distributions of every two groups: TV(a,b) = ½ Σ_t |p_a(t) −
    * p_b(t)|. Computed exactly over integers by cross-multiplying
    * with the totals — per shared term |cnt_a·N_b − cnt_b·N_a|, plus
    * the unmatched mass (N_a − Σ_shared cnt_a)·N_b and symmetrically —
    * all in DECIMAL(38,0), with ONE double division by 2·N_a·N_b at
    * the end. TV is the right drift metric here precisely because it
    * needs no logs: 0 = identical mixes, 1 = disjoint vocabularies.
    *
    * Pair skeleton comes from the totals table (groups², trivially
    * small) so group pairs sharing no token still appear with their
    * exact TV rather than dropping out. */
  def tvDistance(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    // the count table feeds THREE consumers (totals + both join
    // sides); the lazy checkpoint stops Catalyst re-running the
    // corpus tokenize+aggregate per consumer (q141/bm25 precedent —
    // groups×vocab rows, orders of magnitude below the corpus)
    val c = tokenCounts(df, groupCol, textCol).barrier()
    val totals = c.groupBy(col(groupCol))
      .agg(sum(col("cnt")).as("total"))
    val a = c.select(col(groupCol).as("source_a"), col("term"),
      col("cnt").as("cnt_a"))
    val b = c.select(col(groupCol).as("source_b"), col("term"),
      col("cnt").as("cnt_b"))
    val ta = totals.select(col(groupCol).as("source_a"),
      col("total").as("ta"))
    val tb = totals.select(col(groupCol).as("source_b"),
      col("total").as("tb"))
    val shared = a.join(b, Seq("term"))
      .filter(col("source_a") < col("source_b"))
      .join(broadcast(ta), Seq("source_a"))
      .join(broadcast(tb), Seq("source_b"))
      .groupBy(col("source_a"), col("source_b"), col("ta"), col("tb"))
      .agg(
        count(lit(1)).as("n_shared_terms"),
        // cast BEFORE the cross-product: cnt·N overflows BIGINT once
        // a head token's count times the sibling's total passes 2⁶³
        // (trivially reached at 100 TB), so the products are born
        // DECIMAL(38,0) — ~10³⁸ headroom, same range as the oracle's
        // HUGEINT
        sum(abs(col("cnt_a").cast(DecimalType(38, 0)) * col("tb") -
          col("cnt_b").cast(DecimalType(38, 0)) * col("ta")))
          .as("mdiff"),
        sum(col("cnt_a")).as("sa"),
        sum(col("cnt_b")).as("sb"))
      .drop("ta", "tb")
    val skeleton = ta.crossJoin(broadcast(tb))
      .filter(col("source_a") < col("source_b"))
    val num = coalesce(col("mdiff"), lit(0).cast(DecimalType(38, 0))) +
      ((col("ta") - coalesce(col("sa"), lit(0L)))
        .cast(DecimalType(38, 0)) * col("tb") +
        (col("tb") - coalesce(col("sb"), lit(0L)))
          .cast(DecimalType(38, 0)) * col("ta"))
    skeleton
      .join(shared, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_shared_terms"), lit(0L)).as("n_shared_terms"),
        (num.cast("double") /
          (lit(2.0) * col("ta").cast("double") * col("tb").cast("double")))
          .as("tv_dist"))
  }

  /** Core-vocabulary coverage: fraction of each group's token MASS
    * covered by the corpus-global top-`k` tokens (ties broken by
    * token text, total order). Head-vocabulary coverage collapsing is
    * the classic symptom of boilerplate/template contamination; a
    * source whose coverage spikes vs its siblings is mostly markup.
    *
    * The top-k is a TakeOrdered over the global term counts (never a
    * full sort) and re-enters as a broadcast k-row dimension. */
  def coreTokenCoverage(df: DataFrame, groupCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    val tok = df.select(col(groupCol),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val top = tok.groupBy(col("term")).agg(count(lit(1)).as("gcnt"))
      .orderBy(col("gcnt").desc, col("term"))
      .limit(k)
      .select(col("term"))
    val per = tok.groupBy(col(groupCol)).agg(count(lit(1)).as("n_tokens"))
    val covered = tok.join(broadcast(top), Seq("term"))
      .groupBy(col(groupCol)).agg(count(lit(1)).as("covered_tokens"))
    per.join(covered, Seq(groupCol), "left")
      .select(col(groupCol), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        (coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("coverage"))
  }

  /** Greedy maximum-coverage document selection (the facility-location
    * / set-cover primitive of coreset picking): k rounds, each picking
    * the document whose shingle set adds the MOST not-yet-covered
    * shingles, ties broken (gain DESC, doc ASC) so two engines agree
    * row-for-row. The classic (1 − 1/e) greedy — the count-based
    * diversity counterpart of the embedding-space MMR (q240): MMR
    * diversifies against pairwise similarity, this maximizes covered
    * VOCABULARY mass, the objective behind submodular data-selection
    * pipelines.
    *
    * Round discipline is [[graft.llmops.Similarity.mmrTopK]]'s: the
    * doc×shingle postings table is computed ONCE and barriered; each
    * round is one anti-join against the covered set + one gain
    * aggregation + a TakeOrdered(1) winner, with the covered set and
    * winner barriered so round r+1's plan starts from materialized
    * frames instead of re-expanding r rounds of joins. Per-round cost
    * is one pass over the (shrinking) uncovered postings; k is small
    * by contract. A round where every remaining doc adds zero new
    * shingles selects nothing and stops — identical in the oracle
    * (the empty-gain LIMIT 1).
    *
    * Returns (round, doc_id, gain, covered_total), round = 1..k. */
  def maxCoverageSelect(df: DataFrame, idCol: String, textCol: String,
      k: Int = 4): DataFrame = {
    require(k >= 1, s"maxCoverageSelect: k=$k")
    val postings = df
      .select(col(idCol).as("doc"),
        explode(TextOps.shingleHashes(col(textCol))).as("sh"))
      .barrier()
    var covered: Option[DataFrame] = None
    var chosenIds: Option[DataFrame] = None
    var out: Option[DataFrame] = None
    (1 to k).foreach { r =>
      val uncovered = covered
        .map(c => postings.join(c, Seq("sh"), "left_anti"))
        .getOrElse(postings)
      val candidates = chosenIds
        .map(ids => uncovered.join(ids, Seq("doc"), "left_anti"))
        .getOrElse(uncovered)
      val win = candidates.groupBy(col("doc"))
        .agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc"))
        .limit(1)
        .select(lit(r).as("round"), col("doc"), col("gain"))
        .barrier()
      val winShingles = postings
        .join(win.select(col("doc")), Seq("doc"), "left_semi")
        .select(col("sh"))
      covered = Some(covered
        .map(_.unionByName(winShingles).distinct())
        .getOrElse(winShingles.distinct())
        .barrier())
      chosenIds = Some(chosenIds
        .map(_.unionByName(win.select(col("doc"))))
        .getOrElse(win.select(col("doc"))))
      // covered_total = running covered-set size, read off the
      // barriered covered frame (a one-row count broadcast — no
      // global window over the k-row output)
      val total = covered.get.agg(count(lit(1)).as("covered_total"))
      val winOut = win.crossJoin(broadcast(total))
      out = Some(out.map(_.unionByName(winOut)).getOrElse(winOut))
    }
    out.get.select(col("round"), col("doc").as(idCol), col("gain"),
      col("covered_total"))
  }
}
