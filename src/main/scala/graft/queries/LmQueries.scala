package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{CorpusRelease, LanguageModel}

/** Count-based language-model curation family (llmops/LanguageModel):
  * CCNet-style reference-model scoring and DSIR-style importance
  * weighting, in the engine's log-free rational form (libm `ln` is
  * not cross-engine reproducible — q57/q87 decision). The clean
  * reference slice is `lang = 'en'`; every query degrades gracefully
  * (and identically in the oracle) when that slice is empty.
  */
object LmQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** DuckDB fragment: 60-bit md5 hash (TextOps.hash60). */
  private def dkHash60(e: String): String =
    s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** DuckDB fragment: 0.0-seeded position-ordered double fold — the
    * engine's deterministic-sum idiom (bm25TopK / q162). */
  private def dkOrderedSum(x: String, ord: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list($x ORDER BY $ord)), (a, b) -> a + b)"

  /** Shared CTEs: per-doc token arrays, positional bigrams, and the
    * lang='en' reference model counts (bigram, prefix, vocabulary). */
  private val dkLmBase =
    """tk AS (SELECT doc_id, lang, string_split(text,' ') AS t
      |       FROM documents),
      |bg AS (SELECT doc_id, lang, CAST(i AS BIGINT) AS pos,
      |              t[i+1] AS w1, t[i+2] AS w2
      |       FROM tk, unnest(range(0, len(t)-1)) r(i)),
      |rbg AS (SELECT w1, w2, count(*) AS c FROM bg
      |        WHERE lang = 'en' GROUP BY 1, 2),
      |rpc AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1
      |        FROM rbg GROUP BY 1),
      |vv AS (SELECT count(DISTINCT tok) AS v FROM
      |         (SELECT unnest(t) AS tok FROM tk WHERE lang = 'en'))""".stripMargin

  /** Shared CTE tail: per-bigram smoothed probability + per-doc score. */
  private val dkLmScore =
    s"""sc AS (SELECT b.doc_id, b.pos, rbg.c,
      |          CASE WHEN vv.v = 0 THEN 0.0
      |               ELSE CAST(COALESCE(rbg.c, 0) + 1 AS DOUBLE)
      |                  / CAST(COALESCE(rpc.c1, 0) + vv.v AS DOUBLE)
      |          END AS p
      |        FROM bg b
      |        LEFT JOIN rbg ON b.w1 = rbg.w1 AND b.w2 = rbg.w2
      |        LEFT JOIN rpc ON b.w1 = rpc.w1
      |        CROSS JOIN vv),
      |ds AS (SELECT doc_id, count(*) AS n_bigrams,
      |              count(*) FILTER (WHERE c IS NULL) AS n_oov,
      |              ${dkOrderedSum("p", "pos")}
      |                / CAST(count(*) AS DOUBLE) AS score
      |       FROM sc GROUP BY 1)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // The reference bigram model itself: Laplace-smoothed
    // probabilities over the lang='en' slice, top 100 bigrams by
    // count with a total-order tiebreak. Integer counts + ONE
    // division per row — bit-exact; the count tables are
    // vocabulary-sized, so at 100 TB this is a dimension build, not a
    // corpus shuffle.
    QueryDef(
      "q231_bigram_lm",
      Some(s"""
        WITH $dkLmBase
        SELECT w1, w2, c, c1,
               CAST(c + 1 AS DOUBLE) / CAST(c1 + vv.v AS DOUBLE) AS p
        FROM rbg JOIN rpc USING (w1) CROSS JOIN vv
        ORDER BY c DESC, w1, w2 LIMIT 100"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        LanguageModel
          .bigramModel(docs.filter(col("lang") === "en"), "doc_id",
            "text")
          .orderBy(col("c").desc, col("w1"), col("w2"))
          .limit(100)
      }),

    // CCNet-style per-document scoring: mean smoothed bigram
    // probability + OOV-bigram count under the reference model — the
    // quality screen that ranks documents by in-distribution-ness
    // before sampling a training mix. One corpus bigram explode, two
    // count-table joins, one per-doc fold.
    QueryDef(
      "q232_lm_score",
      Some(s"""
        WITH $dkLmBase,
        $dkLmScore
        SELECT * FROM ds"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        LanguageModel.lmScore(docs, docs.filter(col("lang") === "en"),
          "doc_id", "text")
      }),

    // Score-band histogram per language: fixed decile bands of the
    // q232 score with exact min/max per band — the scale-safe
    // screening summary (a quantile-based head/middle/tail split per
    // language is q191's ntile shape; fixed bands need ONE hash
    // aggregation and no per-language global sort). min/max of
    // identical doubles are bit-exact, so the whole report
    // hash-matches.
    QueryDef(
      "q233_lm_score_bands",
      Some(s"""
        WITH $dkLmBase,
        $dkLmScore,
        lg AS (SELECT doc_id, min(lang) AS lang FROM tk GROUP BY 1)
        SELECT lang,
               LEAST(CAST(floor(score * 10) AS BIGINT), 9) AS band,
               count(*) AS n_docs,
               min(score) AS min_score, max(score) AS max_score
        FROM ds JOIN lg USING (doc_id)
        GROUP BY 1, 2"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        LanguageModel.scoreBands(docs,
          docs.filter(col("lang") === "en"), "doc_id", "text", "lang")
      }),

    // DSIR-style importance weights: per document, the mean smoothed
    // probability ratio of its hashed unigram features between the
    // lang='en' target and the raw corpus — rank-descending weight is
    // the data-selection order. Both feature tables are bounded at
    // 4096 rows by construction and broadcast at any corpus size.
    QueryDef(
      "q234_dsir_weights",
      Some(s"""
        WITH tk AS (SELECT doc_id, lang, string_split(text,' ') AS t
                    FROM documents),
        tok AS (SELECT doc_id, lang, CAST(i AS BIGINT) AS pos,
                       ${dkHash60("t[i+1]")} % 4096 AS ft
                FROM tk, unnest(range(0, len(t))) r(i)),
        rc AS (SELECT ft, count(*) AS cr FROM tok GROUP BY 1),
        tc AS (SELECT ft, count(*) AS ct FROM tok
               WHERE lang = 'en' GROUP BY 1),
        tot AS (SELECT (SELECT count(*) FROM tok) AS r_total,
                       (SELECT count(*) FROM tok WHERE lang = 'en')
                         AS t_total),
        ratios AS (SELECT rc.ft,
                     CAST(COALESCE(tc.ct, 0) + 1 AS DOUBLE)
                       * CAST(tot.r_total + 4096 AS DOUBLE)
                       / (CAST(rc.cr + 1 AS DOUBLE)
                          * CAST(tot.t_total + 4096 AS DOUBLE)) AS r
                   FROM rc LEFT JOIN tc ON rc.ft = tc.ft
                   CROSS JOIN tot)
        SELECT doc_id, count(*) AS n_toks,
               ${dkOrderedSum("r", "pos")}
                 / CAST(count(*) AS DOUBLE) AS weight
        FROM tok JOIN ratios USING (ft)
        GROUP BY 1"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        LanguageModel.dsirWeights(docs,
          docs.filter(col("lang") === "en"), "doc_id", "text")
      }),

    // The LM-gated corpus release (CorpusRelease.summaryLm, CCNet's
    // actual pipeline shape): exact dedup → waterfall gate → score
    // every survivor against the reference model learned from the
    // survivors' own lang='en' slice → keep score ≥ 0.035 (a
    // calibration-run constant; q233 is the calibration artifact) →
    // span scrub over what ships → per-source audit. The oracle
    // replays ALL five stages relationally, so the composed job is
    // hash-verified end-to-end, not just its pieces (q189's bar,
    // extended by the LM stage).
    QueryDef(
      "q235_corpus_release_lm",
      Some(s"""
        WITH firsts AS (SELECT doc_id, text, source, lang,
                          min(doc_id) OVER (PARTITION BY md5(text))
                            AS first_id
                        FROM documents),
        exact AS (SELECT doc_id, text, source, lang FROM firsts
                  WHERE doc_id = first_id),
        et AS (SELECT doc_id, text, lang, string_split(text,' ') toks
               FROM exact),
        b AS (SELECT doc_id,
                     CAST(len(toks) AS BIGINT) nt,
                     CAST(length(replace(text,' ','')) AS BIGINT) nc,
                     CAST(len(list_distinct(toks)) AS BIGINT) nd,
                     CAST(len(list_filter(toks, x -> list_contains(
                       ['the','a','of','and','to','in','is','it'], x)))
                       AS BIGINT) he
              FROM et),
        shl AS (SELECT doc_id,
                  CASE WHEN len(toks) >= 3
                       THEN list_distinct(list_transform(
                              range(1, len(toks)-1),
                              i -> ('0x'||substr(md5(array_to_string(
                                     toks[i:i+2],' ')),1,15))::BIGINT))
                       ELSE []::BIGINT[] END AS arr
                FROM et),
        m AS (SELECT doc_id, count(*) nsh,
                     count(*) FILTER (WHERE cdf > 1) ndup
              FROM (SELECT doc_id, sh,
                           count(*) OVER (PARTITION BY sh) cdf
                    FROM (SELECT doc_id, unnest(arr) sh FROM shl))
              GROUP BY 1),
        ff AS (SELECT doc_id, CASE
                 WHEN nt < 30 THEN 1
                 WHEN nc*10 < nt*42 OR nc*10 > nt*49 THEN 2
                 WHEN he*32 < nt THEN 3
                 WHEN (nt-nd)*20 > nt*13 THEN 4
                 WHEN coalesce(ndup,0)*5 > coalesce(nsh,0)*4 THEN 5
                 ELSE 6 END AS f
               FROM b LEFT JOIN m USING (doc_id)),
        surv AS (SELECT et.doc_id, et.lang, et.toks,
                        CAST(len(et.toks) AS BIGINT) nt
                 FROM et JOIN ff USING (doc_id) WHERE f = 6),
        sbg AS (SELECT doc_id, lang, CAST(i AS BIGINT) AS pos,
                       toks[i+1] AS w1, toks[i+2] AS w2
                FROM surv, unnest(range(0, len(toks)-1)) r(i)),
        rbg AS (SELECT w1, w2, count(*) AS c FROM sbg
                WHERE lang = 'en' GROUP BY 1, 2),
        rpc AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1
                FROM rbg GROUP BY 1),
        vv AS (SELECT count(DISTINCT tok) AS v FROM
                 (SELECT unnest(toks) AS tok FROM surv
                  WHERE lang = 'en')),
        sc AS (SELECT s.doc_id, s.pos,
                 CASE WHEN vv.v = 0 THEN 0.0
                      ELSE CAST(COALESCE(rbg.c, 0) + 1 AS DOUBLE)
                         / CAST(COALESCE(rpc.c1, 0) + vv.v AS DOUBLE)
                 END AS p
               FROM sbg s
               LEFT JOIN rbg ON s.w1 = rbg.w1 AND s.w2 = rbg.w2
               LEFT JOIN rpc ON s.w1 = rpc.w1
               CROSS JOIN vv),
        ds AS (SELECT doc_id,
                      ${dkOrderedSum("p", "pos")}
                        / CAST(count(*) AS DOUBLE) AS score
               FROM sc GROUP BY 1),
        pass AS (SELECT surv.doc_id, surv.toks, surv.nt
                 FROM surv JOIN ds USING (doc_id)
                 WHERE ds.score >= 0.035),
        sp AS (SELECT doc_id, toks, nt, unnest(range(1, nt - 1)) AS p
               FROM pass WHERE nt >= 3),
        pg AS (SELECT doc_id, p,
                      ('0x'||substr(md5(array_to_string(
                        toks[p:p+2],' ')),1,15))::BIGINT AS gh
               FROM sp),
        sharedg AS (SELECT gh FROM (
                      SELECT gh, count(DISTINCT doc_id) c
                      FROM pg GROUP BY 1) WHERE c > 1),
        cov0 AS (SELECT DISTINCT doc_id, unnest([p, p+1, p+2]) AS ci
                 FROM pg JOIN sharedg USING (gh)),
        covl AS (SELECT doc_id, count(*) AS nrem FROM cov0 GROUP BY 1),
        rel AS (SELECT pa.doc_id, pa.nt,
                       CAST(coalesce(c.nrem, 0) AS BIGINT) AS nrem
                FROM pass pa LEFT JOIN covl c USING (doc_id)),
        stage AS (SELECT f0.source,
                         (f0.doc_id <> f0.first_id) AS exdup,
                         ff.f, COALESCE(ds.score, 0) AS score,
                         rel.nt, rel.nrem
                  FROM firsts f0
                  LEFT JOIN ff ON f0.doc_id = ff.doc_id
                  LEFT JOIN ds ON f0.doc_id = ds.doc_id
                  LEFT JOIN rel ON f0.doc_id = rel.doc_id)
        SELECT source,
               count(*) AS n_in,
               count(*) FILTER (WHERE exdup) AS n_exact_dropped,
               count(*) FILTER (WHERE NOT exdup AND f <> 6)
                 AS n_gate_dropped,
               count(*) FILTER (WHERE f = 6 AND score < 0.035)
                 AS n_lm_dropped,
               count(*) FILTER (WHERE f = 6 AND score >= 0.035)
                 AS n_released,
               CAST(sum(coalesce(nrem, 0)) AS BIGINT)
                 AS tokens_scrubbed,
               CAST(sum(coalesce(nt - nrem, 0)) AS BIGINT)
                 AS tokens_released
        FROM stage GROUP BY 1"""),
      (s, d) =>
        CorpusRelease.summaryLm(t(s, d, "documents"), "doc_id",
          "text", "source", "lang", "en", 0.035)),

    // DoReMi-style domain reweighting (Mixture.doremiWeights): frozen
    // per-source losses from ONE q232 scoring pass, then 4 rounds of
    // polynomial multiplicative weights (w·(1+η·excess), η=0.5) with
    // ε=0.1 uniform smoothing — exp-free for cross-engine parity, the
    // same reason the scoring itself is log-free. The oracle unrolls
    // all 4 rounds, each with the domain-ordered normalizing fold, so
    // the whole weight trajectory is hash-verified. Every constant is
    // CAST to DOUBLE (DuckDB folds bare decimal literals exactly;
    // Spark folds them in binary64 — the q240 hazard).
    QueryDef(
      "q252_doremi_weights",
      Some {
        val w0 = "CAST(1.0 AS DOUBLE) / CAST(k AS DOUBLE)"
        def round(i: Int, prev: String) = s"""
          u$i AS (SELECT domain, n_docs, loss, excess, k,
                    w * (CAST(1.0 AS DOUBLE)
                         + CAST(0.5 AS DOUBLE) * excess) AS wu
                  FROM $prev),
          z$i AS (SELECT ${dkOrderedSum("wu", "domain")} AS z
                  FROM u$i),
          w$i AS (SELECT domain, n_docs, loss, excess, k,
                    (CAST(1.0 AS DOUBLE) - CAST(0.1 AS DOUBLE))
                      * wu / z
                      + CAST(0.1 AS DOUBLE) / CAST(k AS DOUBLE) AS w
                  FROM u$i CROSS JOIN z$i)"""
        s"""
        WITH $dkLmBase,
        $dkLmScore,
        dm AS (SELECT doc_id, min(source) AS domain
               FROM documents GROUP BY 1),
        ld AS (SELECT dm.domain, count(*) AS n_docs,
                 CAST(1.0 AS DOUBLE)
                   - ${dkOrderedSum("score", "ds.doc_id")}
                     / CAST(count(*) AS DOUBLE) AS loss
               FROM ds JOIN dm ON ds.doc_id = dm.doc_id
               GROUP BY 1),
        tt AS (SELECT ${dkOrderedSum("loss", "domain")} AS lsum,
                 count(*) AS k FROM ld),
        b0 AS (SELECT domain, n_docs, loss,
                 loss - lsum / CAST(k AS DOUBLE) AS excess, k,
                 $w0 AS w
               FROM ld CROSS JOIN tt),
        ${round(1, "b0")},
        ${round(2, "w1")},
        ${round(3, "w2")},
        ${round(4, "w3")}
        SELECT 1 AS round, domain, n_docs, loss, excess,
               w AS weight FROM w1
        UNION ALL SELECT 2, domain, n_docs, loss, excess, w FROM w2
        UNION ALL SELECT 3, domain, n_docs, loss, excess, w FROM w3
        UNION ALL SELECT 4, domain, n_docs, loss, excess, w FROM w4"""
      },
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.llmops.Mixture.doremiWeights(docs,
          docs.filter(col("lang") === "en"), "doc_id", "text",
          "source", rounds = 4, eta = 0.5, eps = 0.1)
          .withColumnRenamed("source", "domain")
      })
  )
}
