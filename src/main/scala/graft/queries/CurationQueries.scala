package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{Sharding, TextOps}

/** Corpus-release operators: benchmark decontamination, cross-document
  * repetition filtering, and deterministic shard export — the stages
  * between "curated corpus" and "dataset a trainer consumes".
  */
object CurationQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** DuckDB CTE: per-doc DISTINCT 3-shingle hash60 array (parity with
    * `TextOps.shingles` + `array_distinct`; empty array below 3
    * tokens), with `source` riding along for eval/train splits. */
  private val dkShArr =
    """t AS (SELECT doc_id, source, string_split(text,' ') toks
      |      FROM documents),
      |shl AS (SELECT doc_id, source,
      |         CASE WHEN len(toks) >= 3
      |              THEN list_distinct(list_transform(range(1, len(toks)-1),
      |                     i -> ('0x'||substr(md5(
      |                            array_to_string(toks[i:i+2],' ')),1,15))::BIGINT))
      |              ELSE []::BIGINT[] END AS arr
      |        FROM t)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Benchmark decontamination: training docs (source <> 'src0')
    // probed against the eval set (source = 'src0') for shared
    // 3-gram shingles. The eval shingle set is broadcast — the corpus
    // side never shuffles for the probe.
    QueryDef(
      "q72_decontaminate",
      Some(s"""
        WITH $dkShArr,
        esh AS (SELECT DISTINCT unnest(arr) AS esh FROM shl
                WHERE source = 'src0'),
        x AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_shingles,
                     unnest(CASE WHEN len(arr) = 0
                            THEN [NULL]::BIGINT[] ELSE arr END) AS sh
              FROM shl WHERE source <> 'src0')
        SELECT x.doc_id, x.n_shingles,
               count(e.esh) AS n_hit,
               count(e.esh) > 0 AS contaminated
        FROM x LEFT JOIN esh e ON x.sh = e.esh
        GROUP BY 1, 2"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        TextOps.decontaminate(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text")
      }),

    // Bloom-filter decontamination — q72's scale path for eval suites
    // too big to broadcast exactly (sketch ≈ 1.2 bytes/shingle at 1%
    // fpp). Sketch contents are engine-specific → rows-only check
    // (q55 precedent); the spec proves no-false-negatives against the
    // exact operator.
    QueryDef(
      "q153_decontaminate_bloom",
      None,
      (s, d) => {
        val docs = t(s, d, "documents")
        TextOps.bloomDecontaminate(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text")
      }),

    // Multi-n contamination curve: q72's overlap summary swept over
    // shingle widths 3/5/8/13 in one corpus pass — hits persisting to
    // long n are verbatim leakage, hits dying at n=5 are phrase noise.
    // Both sides scan once (row-local per-n fan-out from one token
    // split); the eval (n, shingle) set broadcasts and the corpus
    // probes it with a broadcast semi-join — no corpus shuffle.
    QueryDef(
      "q277_contamination_curve",
      Some(s"""
        WITH nn AS (SELECT unnest([3, 5, 8, 13]) AS n),
        t AS (SELECT doc_id, source, string_split(text,' ') AS toks
              FROM documents),
        sarr AS (SELECT doc_id, source, nn.n,
                   CASE WHEN len(toks) >= nn.n
                        THEN list_distinct(list_transform(
                               range(1, len(toks)-nn.n+2),
                               i -> ('0x'||substr(md5(array_to_string(
                                      toks[i:i+nn.n-1],' ')),1,15))::BIGINT))
                        ELSE []::BIGINT[] END AS arr
                 FROM t CROSS JOIN nn),
        esh AS (SELECT DISTINCT n, unnest(arr) AS esh FROM sarr
                WHERE source = 'src0'),
        ec AS (SELECT n, count(*) AS n_eval_shingles FROM esh GROUP BY 1),
        td AS (SELECT n, count(*) AS n_train_docs FROM sarr
               WHERE source <> 'src0' AND len(arr) > 0 GROUP BY 1),
        tsh AS (SELECT doc_id, n, unnest(arr) AS sh FROM sarr
                WHERE source <> 'src0'),
        cont AS (SELECT t.n, count(DISTINCT t.doc_id) AS n_contaminated
                 FROM tsh t JOIN esh e ON t.n = e.n AND t.sh = e.esh
                 GROUP BY 1)
        SELECT td.n, COALESCE(ec.n_eval_shingles, 0) AS n_eval_shingles,
               td.n_train_docs,
               COALESCE(cont.n_contaminated, 0) AS n_contaminated,
               CASE WHEN td.n_train_docs > 0
                    THEN CAST(COALESCE(cont.n_contaminated, 0) AS DOUBLE)
                         / CAST(td.n_train_docs AS DOUBLE)
                    ELSE 0.0 END AS frac_contaminated
        FROM td LEFT JOIN ec USING (n) LEFT JOIN cont USING (n)"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        TextOps.contaminationCurve(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text")
      }),

    // Cross-document duplicate n-gram fraction: the share of each
    // doc's shingles that occur in >1 document corpus-wide — catches
    // boilerplate mass that pairwise near-dup detection cannot.
    QueryDef(
      "q73_dup_ngram_fraction",
      Some(s"""
        WITH $dkShArr,
        x AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_ngrams,
                     unnest(CASE WHEN len(arr) = 0
                            THEN [NULL]::BIGINT[] ELSE arr END) AS sh
              FROM shl),
        f AS (SELECT doc_id, n_ngrams,
                     count(sh) OVER (PARTITION BY sh) AS df
              FROM x)
        SELECT doc_id, n_ngrams,
               count(*) FILTER (WHERE df > 1) AS n_dup,
               CASE WHEN n_ngrams > 0
                    THEN CAST(count(*) FILTER (WHERE df > 1) AS DOUBLE)
                         / CAST(n_ngrams AS DOUBLE)
                    ELSE 0.0 END AS dup_fraction
        FROM f GROUP BY 1, 2"""),
      (s, d) =>
        TextOps.dupNgramFraction(t(s, d, "documents"), "doc_id", "text")),

    // Deterministic shard manifest: hash-assigned shards with count,
    // token mass, and hash-range endpoints per shard (the release
    // summary of Sharding.writeSharded's layout).
    QueryDef(
      "q74_shard_manifest",
      Some("""
        WITH h AS (SELECT text,
                     ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
                       AS k
                   FROM documents)
        SELECT CAST(k % 32 AS INT) AS shard,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text,' '))) AS BIGINT)
                 AS total_tokens,
               min(k) AS min_key, max(k) AS max_key
        FROM h GROUP BY 1"""),
      (s, d) =>
        Sharding.shardManifest(t(s, d, "documents"), "doc_id", "text", 32)),

    // Length-distribution histogram: per (lang, log2 token-count
    // bucket) doc counts, token mass, and the bucket's share of its
    // language — the curriculum/mixture diagnostic every corpus
    // release reports. The log2 bucket is computed as
    // length(bin(n)) - 1: pure INTEGER arithmetic in both engines
    // (floor(log2(x)) through libm doubles can land on either side of
    // an exact power boundary in the last ulp).
    QueryDef(
      "q78_length_histogram",
      Some("""
        WITH b AS (SELECT lang,
                     CAST(len(string_split(text,' ')) AS BIGINT) AS nt
                   FROM documents),
        g AS (SELECT lang,
                     CAST(length(bin(nt)) - 1 AS INT) AS bucket,
                     count(*) AS n_docs,
                     CAST(sum(nt) AS BIGINT) AS total_tokens
              FROM b GROUP BY 1, 2)
        SELECT lang, bucket, n_docs, total_tokens,
               CAST(n_docs AS DOUBLE) /
                 CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE)
                 AS lang_share
        FROM g"""),
      (s, d) => {
        val g = t(s, d, "documents")
          .select(col("lang"),
            size(TextOps.tokens(col("text"))).cast("long").as("nt"))
          .groupBy(col("lang"),
            (length(bin(col("nt"))) - 1).cast("int").as("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).as("total_tokens"))
        g.select(col("lang"), col("bucket"), col("n_docs"),
          col("total_tokens"),
          (col("n_docs").cast("double") /
            sum(col("n_docs")).over(
              Window
                .partitionBy(col("lang"))).cast("double"))
            .as("lang_share"))
      }),

    // Percentile-based quality gate: drop the bottom 20% of every
    // language by n_chars. percent_rank over a TOTAL order is
    // (rank-1)/(n-1) — exact integer operands, one IEEE division,
    // bit-identical across engines — so the cut is deterministic and
    // needs no per-language absolute threshold. Singleton groups are
    // kept (their one row has pr = 0 and would otherwise vanish).
    QueryDef(
      "q81_percentile_gate",
      Some("""
        SELECT doc_id, lang, n_chars, pr FROM (
          SELECT doc_id, lang, n_chars,
                 percent_rank() OVER (PARTITION BY lang
                   ORDER BY n_chars, doc_id) AS pr,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM documents)
        WHERE pr >= 0.2 OR n = 1"""),
      (s, d) =>
        TextOps.percentileGate(
          t(s, d, "documents")
            .select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "n_chars", "doc_id", 0.2)),

    // Training-mixture weights: per-language sqrt-law sampling weights
    // (w ∝ n^0.5 — up-weights tail languages). The normalizer is an
    // ordered left fold over the language list in both engines, never
    // a partition-order-dependent double sum.
    QueryDef(
      "q82_mixture_weights",
      Some("""
        WITH c AS (SELECT lang, count(*) AS n_docs
                   FROM documents GROUP BY 1),
        d AS (SELECT list_reduce(
                list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(list(n_docs ORDER BY lang),
                    x -> sqrt(CAST(x AS DOUBLE)))),
                (a, b) -> a + b) AS denom FROM c)
        SELECT c.lang, c.n_docs,
               sqrt(CAST(c.n_docs AS DOUBLE)) AS w_raw,
               sqrt(CAST(c.n_docs AS DOUBLE)) / d.denom AS weight
        FROM c, d"""),
      (s, d) =>
        graft.llmops.Mixture.sqrtMixtureWeights(
          t(s, d, "documents"), "lang")),

    // Two-dimensional mixture raking (Deming–Stephan IPF, 3 rounds):
    // per-(source, lang) weights fitted to UNIFORM marginals in BOTH
    // dimensions at once — q82 can hit a language target OR a source
    // target; a training mix usually needs both. All iteration
    // arithmetic runs on the bounded cell table; every double sum is
    // an ordered fold over the other dimension's key, so 3 unrolled
    // rounds hash-match exactly.
    QueryDef(
      "q237_mixture_raking",
      Some("""
        WITH cells AS (SELECT source, lang, count(*) AS n
                       FROM documents GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(n) AS DOUBLE) AS n_total,
                       CAST(count(DISTINCT source) AS DOUBLE) AS nr,
                       CAST(count(DISTINCT lang) AS DOUBLE) AS nc
                FROM cells),
        w0 AS (SELECT source, lang, n, 1.0 AS w FROM cells),
        r1 AS (SELECT source, list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                   list(w * CAST(n AS DOUBLE) ORDER BY lang)),
                 (a, b) -> a + b) AS mass FROM w0 GROUP BY 1),
        a1 AS (SELECT w0.source, w0.lang, w0.n,
                      w0.w * (tot.n_total / tot.nr) / r1.mass AS w
               FROM w0 JOIN r1 USING (source) CROSS JOIN tot),
        c1 AS (SELECT lang, list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                   list(w * CAST(n AS DOUBLE) ORDER BY source)),
                 (a, b) -> a + b) AS mass FROM a1 GROUP BY 1),
        b1 AS (SELECT a1.source, a1.lang, a1.n,
                      a1.w * (tot.n_total / tot.nc) / c1.mass AS w
               FROM a1 JOIN c1 USING (lang) CROSS JOIN tot),
        r2 AS (SELECT source, list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                   list(w * CAST(n AS DOUBLE) ORDER BY lang)),
                 (a, b) -> a + b) AS mass FROM b1 GROUP BY 1),
        a2 AS (SELECT b1.source, b1.lang, b1.n,
                      b1.w * (tot.n_total / tot.nr) / r2.mass AS w
               FROM b1 JOIN r2 USING (source) CROSS JOIN tot),
        c2 AS (SELECT lang, list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                   list(w * CAST(n AS DOUBLE) ORDER BY source)),
                 (a, b) -> a + b) AS mass FROM a2 GROUP BY 1),
        b2 AS (SELECT a2.source, a2.lang, a2.n,
                      a2.w * (tot.n_total / tot.nc) / c2.mass AS w
               FROM a2 JOIN c2 USING (lang) CROSS JOIN tot),
        r3 AS (SELECT source, list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                   list(w * CAST(n AS DOUBLE) ORDER BY lang)),
                 (a, b) -> a + b) AS mass FROM b2 GROUP BY 1),
        a3 AS (SELECT b2.source, b2.lang, b2.n,
                      b2.w * (tot.n_total / tot.nr) / r3.mass AS w
               FROM b2 JOIN r3 USING (source) CROSS JOIN tot),
        c3 AS (SELECT lang, list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                   list(w * CAST(n AS DOUBLE) ORDER BY source)),
                 (a, b) -> a + b) AS mass FROM a3 GROUP BY 1),
        b3 AS (SELECT a3.source, a3.lang, a3.n,
                      a3.w * (tot.n_total / tot.nc) / c3.mass AS w
               FROM a3 JOIN c3 USING (lang) CROSS JOIN tot)
        SELECT b3.source, b3.lang, b3.n, b3.w AS weight,
               b3.w * CAST(b3.n AS DOUBLE) / tot.n_total AS fitted_share
        FROM b3 CROSS JOIN tot"""),
      (s, d) =>
        graft.llmops.Mixture.ipfWeights(
          t(s, d, "documents"), "source", "lang")),

    // Exact per-language discrete quantiles (median/p90/p99 of
    // n_chars): value at rank ceil(q·n) — an actual data value, all
    // rank arithmetic in exact Long math, no interpolation, no libm.
    QueryDef(
      "q83_quantile_stats",
      Some("""
        WITH r AS (SELECT lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars, doc_id) AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
                   FROM documents)
        SELECT lang, CAST(max(n) AS BIGINT) AS n_rows,
               max(CASE WHEN rn = (1*n + 1) // 2 THEN n_chars END)
                 AS p50,
               max(CASE WHEN rn = (9*n + 9) // 10 THEN n_chars END)
                 AS p90,
               max(CASE WHEN rn = (99*n + 99) // 100 THEN n_chars END)
                 AS p99
        FROM r GROUP BY 1"""),
      (s, d) =>
        graft.ops.Aggregates.quantilesDisc(
          t(s, d, "documents"), "lang", "n_chars", "doc_id",
          Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))),

    // Exact weighted median: per-language median doc length weighted
    // by TOKEN MASS (where half the language's tokens live) — the
    // honest curriculum statistic when lengths are heavy-tailed; the
    // unweighted median (q83 p50) undercounts long docs. Pure integer
    // threshold arithmetic: 2·cumsum ≥ total and the previous cumsum
    // strictly below — exactly one row per group, no 0.5·total double.
    QueryDef(
      "q107_weighted_median",
      Some("""
        WITH w AS (SELECT lang, doc_id, n_chars,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS wt
                   FROM documents),
        c AS (SELECT lang, n_chars, wt,
                sum(wt) OVER (PARTITION BY lang
                  ORDER BY n_chars, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cum,
                sum(wt) OVER (PARTITION BY lang) AS tot
              FROM w)
        SELECT lang, n_chars AS w_median,
               CAST(tot AS BIGINT) AS total_weight
        FROM c WHERE cum * 2 >= tot AND (cum - wt) * 2 < tot"""),
      (s, d) =>
        graft.ops.Aggregates.weightedMedian(
          t(s, d, "documents")
            .select(col("lang"), col("doc_id"), col("n_chars"),
              size(TextOps.tokens(col("text"))).cast("long").as("wt")),
          "lang", "n_chars", "wt", "doc_id")),

    // Robust outlier gate: per-language median/MAD of doc length and
    // the |x − med| > 3·MAD count — heavy-tail-safe (unlike z-scores)
    // and exact-integer end to end (unlike stddev). Lower medians,
    // q83's rank convention.
    QueryDef(
      "q109_mad_outliers",
      Some("""
        WITH r AS (SELECT lang, doc_id, n_chars,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars, doc_id) AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
                   FROM documents),
        med AS (SELECT lang, n_chars AS median FROM r
                WHERE rn = (n + 1) // 2),
        d AS (SELECT r.lang, r.doc_id, m.median,
                     abs(r.n_chars - m.median) AS dev
              FROM r JOIN med m USING (lang)),
        d2 AS (SELECT *, row_number() OVER (PARTITION BY lang
                 ORDER BY dev, doc_id) AS rn2,
                 count(*) OVER (PARTITION BY lang) AS n2
               FROM d),
        mad AS (SELECT lang, dev AS mad FROM d2
                WHERE rn2 = (n2 + 1) // 2)
        SELECT d.lang, count(*) AS n_rows, max(d.median) AS median,
               max(m.mad) AS mad,
               count(*) FILTER (WHERE d.dev > 3 * m.mad) AS n_outliers
        FROM d JOIN mad m USING (lang)
        GROUP BY 1"""),
      (s, d) =>
        graft.ops.Aggregates.madOutliers(
          t(s, d, "documents"), "lang", "n_chars", "doc_id", k = 3)),

    // Gini concentration of doc length per language — "is the corpus
    // dominated by a few giant docs?" Exact DECIMAL(38,0) integers up
    // to one final IEEE division.
    QueryDef(
      "q110_length_gini",
      Some("""
        WITH r AS (SELECT lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars, doc_id) AS rn
                   FROM documents),
        g AS (SELECT lang, count(*) AS n, sum(n_chars) AS sx,
                     sum(rn * n_chars) AS srx
              FROM r GROUP BY 1)
        SELECT lang, n AS n_rows,
               CASE WHEN sx = 0 THEN NULL
                    ELSE CAST(2*srx - (n+1)*sx AS DOUBLE)
                       / CAST(n*sx AS DOUBLE) END AS gini
        FROM g"""),
      (s, d) =>
        graft.ops.Aggregates.giniCoefficient(
          t(s, d, "documents"), "lang", "n_chars", "doc_id")),

    // Charset/encoding profile: per-language non-ASCII character mass
    // and the count of docs whose non-ASCII ratio exceeds 25% — the
    // mojibake/wrong-encoding tripwire in a curation pipeline. Counts
    // are codepoint-exact in both engines; the per-doc ratio is one
    // IEEE division of integers (empty docs pinned to 0, avoiding the
    // NaN seam).
    QueryDef(
      "q116_nonascii_profile",
      Some("""
        WITH m AS (SELECT lang, length(text) AS n,
                     length(regexp_replace(text, '[ -~]', '', 'g'))
                       AS na
                   FROM documents),
        r AS (SELECT lang, n, na,
                     CASE WHEN n = 0 THEN 0.0
                          ELSE CAST(na AS DOUBLE) / CAST(n AS DOUBLE)
                     END AS ratio
              FROM m)
        SELECT lang, count(*) AS n_docs,
               CAST(sum(na) AS BIGINT) AS non_ascii_chars,
               count(*) FILTER (WHERE ratio > 0.25) AS n_flagged
        FROM r GROUP BY 1"""),
      (s, d) => {
        val na = length(regexp_replace(col("text"), "[ -~]", ""))
        val n = length(col("text"))
        val ratio = when(n === 0, lit(0.0))
          .otherwise(na.cast("double") / n.cast("double"))
        t(s, d, "documents")
          .select(col("lang"), na.as("na"), ratio.as("ratio"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("na").cast("long")).as("non_ascii_chars"),
            graft.ops.Aggregates.countIf(col("ratio") > 0.25)
              .as("n_flagged"))
      }),

    // Percent-rank score calibration: a doc's length percentile WITHIN
    // its language — the cross-source normalization step before mixing
    // heterogeneous quality scores (absolute thresholds don't transfer
    // between a forum dump and an encyclopedia; percentiles do).
    // percent_rank = (rank−1)/(n−1) is rational in exact integers with
    // one IEEE division, ties share a value, singleton groups pin 0 —
    // identical semantics in both engines.
    QueryDef(
      "q133_percentile_calib",
      Some("""
        SELECT doc_id, lang, n_chars,
               percent_rank() OVER (PARTITION BY lang
                 ORDER BY n_chars) AS pr
        FROM documents"""),
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            percent_rank().over(
              Window
                .partitionBy(col("lang")).orderBy(col("n_chars")))
              .as("pr"))),

    // Token-weighted length quantiles: p50/p90 doc length per language
    // weighted by TOKEN MASS — answers where the tokens live, which
    // the row-weighted quantile (q81/q83) does not: one 100k-token doc
    // moves this p90 as much as a thousand 100-token docs. Pure
    // integer thresholds (den·cumw ≥ num·totw), q107's machinery
    // generalized to arbitrary q.
    QueryDef(
      "q148_weighted_quantiles",
      Some("""
        WITH t AS (SELECT doc_id, lang, n_chars,
                          CAST(len(string_split(text, ' ')) AS BIGINT)
                            AS w
                   FROM documents),
        r AS (SELECT lang, n_chars, w,
                     sum(w) OVER (PARTITION BY lang
                       ORDER BY n_chars, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum,
                     sum(w) OVER (PARTITION BY lang) AS tot
              FROM t)
        SELECT lang, CAST(max(tot) AS BIGINT) AS total_weight,
               max(CASE WHEN cum*2 >= tot AND (cum-w)*2 < tot
                   THEN n_chars END) AS wp50,
               max(CASE WHEN cum*10 >= tot*9 AND (cum-w)*10 < tot*9
                   THEN n_chars END) AS wp90
        FROM r GROUP BY 1"""),
      (s, d) =>
        graft.ops.Aggregates.weightedQuantiles(
          t(s, d, "documents").select(col("doc_id"), col("lang"),
            col("n_chars"),
            size(TextOps.tokens(col("text"))).cast("long").as("w")),
          "lang", "n_chars", "w", "doc_id",
          Seq(("wp50", 1, 2), ("wp90", 9, 10)))),

    // Winsorized mean doc length per language: values clipped at the
    // exact p05/p95 rank values, then an exact-decimal mean — the
    // robust center that, unlike trimming, keeps n constant (q109's
    // MAD gates outliers; this REPORTS with them neutralized). All
    // rank math in integer division; one ranked window + one key join.
    QueryDef(
      "q138_winsorized_mean",
      Some("""
        WITH r AS (SELECT lang, n_chars,
                          row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rn,
                          count(*) OVER (PARTITION BY lang) AS n
                   FROM documents),
        cuts AS (SELECT lang,
                        min(CASE WHEN rn = (n+19)//20
                            THEN n_chars END) AS lo,
                        min(CASE WHEN rn = (n*19+19)//20
                            THEN n_chars END) AS hi,
                        max(n) AS n
                 FROM r GROUP BY 1)
        SELECT d.lang, max(c.n) AS n,
               max(c.lo) AS p05, max(c.hi) AS p95,
               CAST(sum(CAST(least(greatest(d.n_chars, c.lo), c.hi)
                 AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS wins_mean
        FROM documents d JOIN cuts c USING (lang)
        GROUP BY 1"""),
      (s, d) =>
        graft.ops.Aggregates.winsorizedMean(
          t(s, d, "documents").select(col("lang"), col("n_chars"),
            col("doc_id")),
          "lang", "n_chars", "doc_id")),

    // Global segment-level dedup with reassembly (the C4/RefinedWeb
    // boilerplate-line removal): 16-token segments survive only at
    // their first corpus occurrence; docs reassemble from surviving
    // segments in original order. Verified via per-doc counts + md5 of
    // the rebuilt text.
    QueryDef(
      "q84_segment_dedup",
      Some("""
        WITH t AS (SELECT doc_id,
                     string_split(coalesce(text, ''), ' ') AS toks
                   FROM documents),
        s AS (SELECT doc_id,
                     unnest(range(0, (len(toks)+15)//16)) AS pos, toks
              FROM t),
        g AS (SELECT doc_id, pos,
                     array_to_string(toks[(pos*16+1):(pos*16+16)], ' ')
                       AS seg
              FROM s),
        k AS (SELECT doc_id, pos, seg,
                     row_number() OVER (PARTITION BY seg
                       ORDER BY doc_id, pos) AS rn
              FROM g)
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
               CAST(length(coalesce(string_agg(
                 CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos), ''))
                 AS BIGINT) AS kept_chars,
               md5(coalesce(string_agg(
                 CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos), ''))
                 AS kept_md5
        FROM k GROUP BY 1"""),
      (s, d) =>
        TextOps.segmentDedup(
          t(s, d, "documents")
            .select(col("doc_id"),
              coalesce(col("text"), lit("")).as("text")),
          "doc_id", "text")),

    // Token-budget waterfilling: given per-source token totals and a
    // budget of half the corpus, find the uniform per-source cap C
    // such that Σ min(T_s, C) fills the budget — the "cap the big
    // crawls, keep the small curated sets whole" allocation rule of
    // mixture design. Solved in closed form over the T-ascending
    // prefix: for boundary row j, cand = (B − P_{j−1}) ÷ (n−j+1) is
    // THE cap iff cand < T_j and T_{j−1} ≤ cand; B ≥ total ⇒ no cap.
    // Pure integer arithmetic end to end (floor division on
    // non-negative operands, where Spark div ≡ DuckDB //), so both
    // engines agree exactly. The global window runs over one row per
    // SOURCE (beneath a hash aggregate — the structurally-bounded
    // class the plan audit admits).
    QueryDef(
      "q169_token_waterfill",
      Some("""
        WITH tok AS (SELECT source,
                       CAST(sum(len(string_split(text,' '))) AS BIGINT)
                         AS t
                     FROM documents GROUP BY 1),
        tot AS (SELECT CAST(sum(t) AS BIGINT) AS total,
                       count(*) AS n FROM tok),
        s AS (SELECT source, t,
                CAST(row_number() OVER (ORDER BY t, source) AS BIGINT)
                  AS rn,
                CAST(sum(t) OVER (ORDER BY t, source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS p,
                lag(t) OVER (ORDER BY t, source) AS prev_t
              FROM tok),
        c AS (SELECT s.*,
                     (tot.total // 2 - (p - t)) // (tot.n - rn + 1)
                       AS cand
              FROM s CROSS JOIN tot),
        cap AS (SELECT min(cand) AS cap FROM c
                WHERE cand < t
                  AND (prev_t IS NULL OR prev_t <= cand))
        SELECT source, t AS tokens,
               least(t, coalesce(cap.cap, t)) AS allocation,
               (cap.cap IS NOT NULL AND t > cap.cap) AS capped
        FROM tok CROSS JOIN cap"""),
      (s, d) => {
        val tok = t(s, d, "documents")
          .groupBy(col("source"))
          .agg(sum(size(TextOps.tokens(col("text"))).cast("long"))
            .as("t"))
        val tot = tok.agg(sum(col("t")).as("total"),
          count(lit(1)).as("n"))
        val w = Window.orderBy(col("t"), col("source"))
        val sdf = tok.select(col("source"), col("t"),
          row_number().over(w).cast("long").as("rn"),
          sum(col("t")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("p"),
          lag(col("t"), 1).over(w).as("prev_t"))
        val c = sdf.crossJoin(broadcast(tot))
          .withColumn("cand",
            expr("(total div 2 - (p - t)) div (n - rn + 1)"))
        val cap = c
          .filter(col("cand") < col("t") &&
            (col("prev_t").isNull || col("prev_t") <= col("cand")))
          .agg(min(col("cand")).as("cap"))
        tok.crossJoin(broadcast(cap))
          .select(col("source"), col("t").as("tokens"),
            least(col("t"), coalesce(col("cap"), col("t")))
              .as("allocation"),
            (col("cap").isNotNull && col("t") > col("cap"))
              .as("capped"))
      }),

    // Curation-rule waterfall: per ordered rule, documents failing
    // there FIRST and documents surviving the prefix — the attrition
    // funnel that tells a curation engineer which gate eats the
    // corpus (TextOps.filterWaterfall scaladoc has the rule list;
    // all thresholds integer-rational, so both engines agree
    // bit-for-bit).
    QueryDef(
      "q182_filter_waterfall",
      Some(s"""
        WITH $dkShArr,
        b AS (SELECT doc_id,
                     CAST(len(toks) AS BIGINT) nt,
                     CAST(length(replace(text,' ','')) AS BIGINT) nc,
                     CAST(len(list_distinct(toks)) AS BIGINT) nd,
                     CAST(len(list_filter(toks, x -> list_contains(
                       ['the','a','of','and','to','in','is','it'], x)))
                       AS BIGINT) he
              FROM (SELECT doc_id, text, string_split(text,' ') toks
                    FROM documents)),
        m AS (SELECT doc_id, count(*) nsh,
                     count(*) FILTER (WHERE cdf > 1) ndup
              FROM (SELECT doc_id, sh,
                           count(*) OVER (PARTITION BY sh) cdf
                    FROM (SELECT doc_id, unnest(arr) sh FROM shl))
              GROUP BY 1),
        ff AS (SELECT CASE
                 WHEN nt < 30 THEN 1
                 WHEN nc*10 < nt*42 OR nc*10 > nt*49 THEN 2
                 WHEN he*32 < nt THEN 3
                 WHEN (nt-nd)*20 > nt*13 THEN 4
                 WHEN coalesce(ndup,0)*5 > coalesce(nsh,0)*4 THEN 5
                 ELSE 6 END AS f
               FROM b LEFT JOIN m USING (doc_id)),
        a AS (SELECT
                count(*) FILTER (WHERE f = 1) d1,
                count(*) FILTER (WHERE f > 1) s1,
                count(*) FILTER (WHERE f = 2) d2,
                count(*) FILTER (WHERE f > 2) s2,
                count(*) FILTER (WHERE f = 3) d3,
                count(*) FILTER (WHERE f > 3) s3,
                count(*) FILTER (WHERE f = 4) d4,
                count(*) FILTER (WHERE f > 4) s4,
                count(*) FILTER (WHERE f = 5) d5,
                count(*) FILTER (WHERE f > 5) s5
              FROM ff)
        SELECT CAST(1 AS INT) rule_idx, 'min_len' rule_name,
               d1 n_dropped, s1 n_surviving FROM a
        UNION ALL SELECT 2, 'char_per_token', d2, s2 FROM a
        UNION ALL SELECT 3, 'stopword', d3, s3 FROM a
        UNION ALL SELECT 4, 'dup_tokens', d4, s4 FROM a
        UNION ALL SELECT 5, 'shared_shingles', d5, s5 FROM a"""),
      (s, d) =>
        TextOps.filterWaterfall(t(s, d, "documents"), "doc_id", "text")),

    // Within-doc longest repeated n-gram (Gopher repetition family):
    // largest n <= 8 with a gram occurring >= 2 times (overlaps
    // count) + the top occurrence count at that n. Spark side is ONE
    // narrow projection (native repeat_gram kernel, no shuffle); the
    // oracle rebuilds the same statistic relationally.
    QueryDef(
      "q183_repeat_gram",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        ns AS (SELECT unnest(range(1, 9)) AS n),
        g AS (SELECT doc_id, n,
                     unnest(CASE WHEN len(toks) >= n + 1
                       THEN list_transform(range(1, len(toks)-n+2),
                              i -> array_to_string(toks[i:i+n-1], ' '))
                       ELSE []::VARCHAR[] END) AS gram
              FROM t CROSS JOIN ns),
        c AS (SELECT doc_id, n, count(*) cnt
              FROM g GROUP BY doc_id, n, gram HAVING count(*) >= 2),
        mx AS (SELECT doc_id, max(n) AS max_rep_n FROM c GROUP BY 1),
        top AS (SELECT c.doc_id, mx.max_rep_n, max(c.cnt) AS n_reps
                FROM c JOIN mx ON c.doc_id = mx.doc_id
                  AND c.n = mx.max_rep_n
                GROUP BY 1, 2)
        SELECT t.doc_id,
               coalesce(top.max_rep_n, 0) AS max_rep_n,
               coalesce(top.n_reps, 0) AS n_reps
        FROM t LEFT JOIN top ON t.doc_id = top.doc_id"""),
      (s, d) =>
        TextOps.repeatGramMax(t(s, d, "documents"), "doc_id", "text")),

    // Cross-document duplicated-span extraction: positions whose
    // trigram occurs in ANOTHER doc, merged into maximal spans
    // (gaps-and-islands) — q73 measures duplicated mass, this one
    // finds WHERE it sits, the unit a passage-level dedup rewrites.
    QueryDef(
      "q184_dup_spans",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) nt, toks
                 FROM t),
        pos AS (SELECT doc_id, nt, toks,
                       unnest(range(1, nt - 1)) AS p
                FROM base WHERE nt >= 3),
        pg AS (SELECT doc_id, nt, p,
                      ('0x'||substr(md5(
                        array_to_string(toks[p:p+2],' ')),1,15))::BIGINT
                        AS gh
               FROM pos),
        shared AS (SELECT gh FROM (
                     SELECT gh, count(DISTINCT doc_id) c
                     FROM pg GROUP BY 1) WHERE c > 1),
        rep AS (SELECT pg.* FROM pg JOIN shared USING (gh)),
        isl AS (SELECT doc_id, nt, p,
                       CASE WHEN p > coalesce(lag(p) OVER (
                              PARTITION BY doc_id ORDER BY p),
                              -100000) + 3 THEN 1 ELSE 0 END AS ni
                FROM rep),
        ids AS (SELECT doc_id, nt, p,
                       sum(ni) OVER (PARTITION BY doc_id ORDER BY p
                         ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS island
                FROM isl),
        per AS (SELECT doc_id, nt, island,
                       max(p) - min(p) + 3 AS covered
                FROM ids GROUP BY 1, 2, 3),
        agg AS (SELECT doc_id, count(*) AS n_spans,
                       CAST(sum(covered) AS BIGINT) AS covered_tokens
                FROM per GROUP BY 1)
        SELECT b.doc_id, b.nt AS n_tokens,
               coalesce(a.n_spans, 0) AS n_spans,
               coalesce(a.covered_tokens, 0) AS covered_tokens,
               CAST(coalesce(a.covered_tokens, 0) AS DOUBLE) /
                 CAST(b.nt AS DOUBLE) AS dup_span_frac
        FROM base b LEFT JOIN agg a ON b.doc_id = a.doc_id"""),
      (s, d) =>
        TextOps.dupSpans(t(s, d, "documents"), "doc_id", "text")),

    // Passage-level dedup rewrite — q184's acting half: covered
    // tokens removed, survivors re-joined in order (symmetric
    // boilerplate-scrub policy; see TextOps.removeDupSpans scaladoc).
    // String equality of the rebuilt text is the strictest possible
    // cross-engine check of the span semantics.
    QueryDef(
      "q185_dedup_rewrite",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) nt, toks
                 FROM t),
        pos AS (SELECT doc_id, nt, toks, unnest(range(1, nt - 1)) AS p
                FROM base WHERE nt >= 3),
        pg AS (SELECT doc_id, p,
                      ('0x'||substr(md5(
                        array_to_string(toks[p:p+2],' ')),1,15))::BIGINT
                        AS gh
               FROM pos),
        shared AS (SELECT gh FROM (
                     SELECT gh, count(DISTINCT doc_id) c
                     FROM pg GROUP BY 1) WHERE c > 1),
        cov0 AS (SELECT DISTINCT doc_id, unnest([p, p+1, p+2]) AS ci
                 FROM pg JOIN shared USING (gh)),
        covl AS (SELECT doc_id, list(ci ORDER BY ci) AS cov
                 FROM cov0 GROUP BY 1)
        SELECT b.doc_id, b.nt AS n_tokens,
               CAST(coalesce(len(c.cov), 0) AS BIGINT) AS n_removed,
               coalesce(array_to_string(
                 [b.toks[i] FOR i IN range(1, len(b.toks)+1)
                  IF NOT list_contains(coalesce(c.cov, []::BIGINT[]), i)],
                 ' '), '') AS text_deduped
        FROM base b LEFT JOIN covl c USING (doc_id)"""),
      (s, d) =>
        TextOps.removeDupSpans(t(s, d, "documents"), "doc_id", "text")),

    // Chance-corrected agreement (Cohen's kappa) between two curation
    // gates — the QA statistic for "is the cheap gate a usable proxy
    // for the expensive one". Computed from the 2×2 contingency
    // counts with ALL products in exact integers (DECIMAL/HUGEINT)
    // and one final double division:
    // κ = (n·(n11+n00) − (a1·b1 + a0·b0)) / (n² − (a1·b1 + a0·b0)).
    // Gates: A = length ≥ 30 tokens; B = stopword ratio ≥ 1/32.
    QueryDef(
      "q187_gate_kappa",
      Some("""
        WITH b AS (SELECT
                     CAST(len(string_split(text,' ')) AS BIGINT) nt,
                     CAST(len(list_filter(string_split(text,' '),
                       x -> list_contains(['the','a','of','and','to',
                         'in','is','it'], x))) AS BIGINT) he
                   FROM documents),
        g AS (SELECT nt >= 30 AS ga, he*32 >= nt AS gb FROM b),
        c AS (SELECT
                count(*) AS n,
                count(*) FILTER (WHERE ga AND gb) AS n11,
                count(*) FILTER (WHERE ga AND NOT gb) AS n10,
                count(*) FILTER (WHERE NOT ga AND gb) AS n01,
                count(*) FILTER (WHERE NOT ga AND NOT gb) AS n00
              FROM g)
        SELECT n, n11, n10, n01, n00,
               CAST(CAST(n AS HUGEINT)*(n11+n00)
                      - (CAST(n11+n10 AS HUGEINT)*(n11+n01)
                         + CAST(n01+n00 AS HUGEINT)*(n10+n00))
                    AS DOUBLE)
               / CAST(CAST(n AS HUGEINT)*n
                      - (CAST(n11+n10 AS HUGEINT)*(n11+n01)
                         + CAST(n01+n00 AS HUGEINT)*(n10+n00))
                    AS DOUBLE) AS kappa
        FROM c"""),
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
        val g = t(s, d, "documents").select(
          (size(toks).cast("long") >= 30).as("ga"),
          (size(filter(toks, x => x.isInCollection(stops)))
            .cast("long") * 32 >= size(toks).cast("long")).as("gb"))
        def cnt(c: org.apache.spark.sql.Column) =
          sum(when(c, 1L).otherwise(0L))
        val cts = g.agg(
          count(lit(1)).as("n"),
          cnt(col("ga") && col("gb")).as("n11"),
          cnt(col("ga") && !col("gb")).as("n10"),
          cnt(!col("ga") && col("gb")).as("n01"),
          cnt(!col("ga") && !col("gb")).as("n00"))
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast("decimal(38,0)")
        val pe = dec(col("n11") + col("n10")) * (col("n11") + col("n01")) +
          dec(col("n01") + col("n00")) * (col("n10") + col("n00"))
        cts.select(col("n"), col("n11"), col("n10"), col("n01"),
          col("n00"),
          ((dec(col("n")) * (col("n11") + col("n00")) - pe).cast("double") /
            (dec(col("n")) * col("n") - pe).cast("double")).as("kappa"))
      }),

    // q182's waterfall sliced per source: which feed dies at which
    // gate. Same rules, same first-failure fold, grouped aggregation.
    QueryDef(
      "q188_waterfall_by_source",
      Some(s"""
        WITH $dkShArr,
        b AS (SELECT doc_id, source,
                     CAST(len(toks) AS BIGINT) nt,
                     CAST(length(replace(text,' ','')) AS BIGINT) nc,
                     CAST(len(list_distinct(toks)) AS BIGINT) nd,
                     CAST(len(list_filter(toks, x -> list_contains(
                       ['the','a','of','and','to','in','is','it'], x)))
                       AS BIGINT) he
              FROM (SELECT doc_id, source, text,
                           string_split(text,' ') toks
                    FROM documents)),
        m AS (SELECT doc_id, count(*) nsh,
                     count(*) FILTER (WHERE cdf > 1) ndup
              FROM (SELECT doc_id, sh,
                           count(*) OVER (PARTITION BY sh) cdf
                    FROM (SELECT doc_id, unnest(arr) sh FROM shl))
              GROUP BY 1),
        ff AS (SELECT source, CASE
                 WHEN nt < 30 THEN 1
                 WHEN nc*10 < nt*42 OR nc*10 > nt*49 THEN 2
                 WHEN he*32 < nt THEN 3
                 WHEN (nt-nd)*20 > nt*13 THEN 4
                 WHEN coalesce(ndup,0)*5 > coalesce(nsh,0)*4 THEN 5
                 ELSE 6 END AS f
               FROM b LEFT JOIN m USING (doc_id)),
        a AS (SELECT source,
                count(*) FILTER (WHERE f = 1) d1,
                count(*) FILTER (WHERE f > 1) s1,
                count(*) FILTER (WHERE f = 2) d2,
                count(*) FILTER (WHERE f > 2) s2,
                count(*) FILTER (WHERE f = 3) d3,
                count(*) FILTER (WHERE f > 3) s3,
                count(*) FILTER (WHERE f = 4) d4,
                count(*) FILTER (WHERE f > 4) s4,
                count(*) FILTER (WHERE f = 5) d5,
                count(*) FILTER (WHERE f > 5) s5
              FROM ff GROUP BY 1)
        SELECT source, CAST(1 AS INT) rule_idx, 'min_len' rule_name,
               d1 n_dropped, s1 n_surviving FROM a
        UNION ALL SELECT source, 2, 'char_per_token', d2, s2 FROM a
        UNION ALL SELECT source, 3, 'stopword', d3, s3 FROM a
        UNION ALL SELECT source, 4, 'dup_tokens', d4, s4 FROM a
        UNION ALL SELECT source, 5, 'shared_shingles', d5, s5 FROM a"""),
      (s, d) =>
        TextOps.filterWaterfallBy(t(s, d, "documents"), "doc_id",
          "text", "source")),

    // The WHOLE corpus-release pipeline (llmops/CorpusRelease,
    // JobRunner `corpus_release`) as one oracled query: exact dedup →
    // waterfall gate → span scrub over survivors → per-source audit.
    // The oracle replays every stage relationally, so the composed
    // job — not just its pieces — is hash-verified.
    QueryDef(
      "q189_corpus_release",
      Some("""
        WITH firsts AS (SELECT doc_id, text, source,
                          min(doc_id) OVER (PARTITION BY md5(text))
                            AS first_id
                        FROM documents),
        exact AS (SELECT doc_id, text, source FROM firsts
                  WHERE doc_id = first_id),
        et AS (SELECT doc_id, text, string_split(text,' ') toks
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
        surv AS (SELECT et.doc_id, et.toks,
                        CAST(len(et.toks) AS BIGINT) nt
                 FROM et JOIN ff USING (doc_id) WHERE f = 6),
        pos AS (SELECT doc_id, toks, nt, unnest(range(1, nt - 1)) AS p
                FROM surv WHERE nt >= 3),
        pg AS (SELECT doc_id, p,
                      ('0x'||substr(md5(array_to_string(
                        toks[p:p+2],' ')),1,15))::BIGINT AS gh
               FROM pos),
        sharedg AS (SELECT gh FROM (
                      SELECT gh, count(DISTINCT doc_id) c
                      FROM pg GROUP BY 1) WHERE c > 1),
        cov0 AS (SELECT DISTINCT doc_id, unnest([p, p+1, p+2]) AS ci
                 FROM pg JOIN sharedg USING (gh)),
        covl AS (SELECT doc_id, count(*) AS nrem FROM cov0 GROUP BY 1),
        rel AS (SELECT s.doc_id, s.nt,
                       CAST(coalesce(c.nrem, 0) AS BIGINT) AS nrem
                FROM surv s LEFT JOIN covl c USING (doc_id)),
        stage AS (SELECT f0.source,
                         (f0.doc_id <> f0.first_id) AS exdup,
                         ff.f, rel.nt, rel.nrem
                  FROM firsts f0
                  LEFT JOIN ff ON f0.doc_id = ff.doc_id
                  LEFT JOIN rel ON f0.doc_id = rel.doc_id)
        SELECT source,
               count(*) AS n_in,
               count(*) FILTER (WHERE exdup) AS n_exact_dropped,
               count(*) FILTER (WHERE NOT exdup AND f <> 6)
                 AS n_gate_dropped,
               count(*) FILTER (WHERE f = 6) AS n_released,
               CAST(sum(coalesce(nrem, 0)) AS BIGINT)
                 AS tokens_scrubbed,
               CAST(sum(coalesce(nt - nrem, 0)) AS BIGINT)
                 AS tokens_released
        FROM stage GROUP BY 1"""),
      (s, d) =>
        graft.llmops.CorpusRelease.summary(t(s, d, "documents"),
          "doc_id", "text", "source")),

    // Winnowing fingerprints (MOSS, SIGMOD'03): per doc, the count of
    // selected (min-of-each-4-window, rightmost tie-break) 3-gram
    // hashes, the achieved density (guarantee: any shared run of ≥ 6
    // tokens yields a shared fingerprint at expected density 2/(w+1)),
    // and the min selected hash as a compact signature. The oracle
    // replicates windows by a bounded s≤p≤s+3 join and the tie-break
    // as row_number ORDER BY (gh, p DESC); the Spark side carries it
    // inside one struct-min over a sliding frame.
    QueryDef(
      "q215_winnowing",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        base AS (SELECT doc_id,
                        CAST(greatest(len(toks)-2, 0) AS BIGINT) AS ng,
                        toks
                 FROM t),
        ph AS (SELECT doc_id, ng, p,
                      ('0x'||substr(md5(
                        array_to_string(toks[p:p+2],' ')),1,15))::BIGINT
                        AS gh
               FROM (SELECT doc_id, ng, toks,
                            unnest(range(1, ng + 1)) AS p
                     FROM base WHERE ng >= 1)),
        st AS (SELECT doc_id, unnest(range(1, ng - 3 + 1)) AS s
               FROM base WHERE ng >= 4),
        j AS (SELECT st.doc_id, st.s, ph.p, ph.gh, ph.ng
              FROM st JOIN ph ON st.doc_id = ph.doc_id
                             AND ph.p BETWEEN st.s AND st.s + 3),
        selr AS (SELECT DISTINCT doc_id, ng, gh, p FROM (
                   SELECT *, row_number() OVER (
                     PARTITION BY doc_id, s ORDER BY gh, p DESC) AS rn
                   FROM j)
                 WHERE rn = 1),
        agg AS (SELECT doc_id, count(*) AS n_selected,
                       min(gh) AS min_fp
                FROM selr GROUP BY 1)
        SELECT b.doc_id, b.ng AS n_grams,
               greatest(b.ng - 3, 0) AS n_windows,
               coalesce(a.n_selected, 0) AS n_selected,
               CASE WHEN b.ng - 3 > 0
                    THEN CAST(coalesce(a.n_selected, 0) AS DOUBLE)
                         / CAST(b.ng - 3 AS DOUBLE)
                    ELSE 0.0 END AS density,
               a.min_fp
        FROM base b LEFT JOIN agg a USING (doc_id)"""),
      (s, d) =>
        TextOps.winnowingStats(t(s, d, "documents"), "doc_id", "text")),

    // Gate-interaction matrix: exact pairwise co-pass counts and the
    // cross-product correlation sign n·n_both − n_a·n_b over four
    // curation gates — the measurement that decides whether a filter
    // waterfall may be reordered by independent selectivities (the
    // length/word-count pair is strongly positively correlated; lang
    // is near-independent of both). One aggregation computes all
    // single and pairwise counters; a union per pair would rescan.
    QueryDef(
      "q217_gate_interactions",
      Some("""
        WITH g AS (SELECT n_chars >= 200 AS g0,
                          len(string_split(text,' ')) >= 30 AS g1,
                          contains(text, ' the ') AS g2,
                          lang = 'en' AS g3
                   FROM documents),
        one AS (SELECT count(*) AS n,
                       count(*) FILTER (WHERE g0) AS c0,
                       count(*) FILTER (WHERE g1) AS c1,
                       count(*) FILTER (WHERE g2) AS c2,
                       count(*) FILTER (WHERE g3) AS c3,
                       count(*) FILTER (WHERE g0 AND g1) AS c01,
                       count(*) FILTER (WHERE g0 AND g2) AS c02,
                       count(*) FILTER (WHERE g0 AND g3) AS c03,
                       count(*) FILTER (WHERE g1 AND g2) AS c12,
                       count(*) FILTER (WHERE g1 AND g3) AS c13,
                       count(*) FILTER (WHERE g2 AND g3) AS c23
                FROM g),
        p AS (
          SELECT 'min_len' AS gate_a, 'min_words' AS gate_b, n,
                 c0 AS n_a, c1 AS n_b, c01 AS n_both FROM one
          UNION ALL SELECT 'min_len', 'has_stopword', n, c0, c2, c02
            FROM one
          UNION ALL SELECT 'min_len', 'lang_en', n, c0, c3, c03
            FROM one
          UNION ALL SELECT 'min_words', 'has_stopword', n, c1, c2, c12
            FROM one
          UNION ALL SELECT 'min_words', 'lang_en', n, c1, c3, c13
            FROM one
          UNION ALL SELECT 'has_stopword', 'lang_en', n, c2, c3, c23
            FROM one)
        SELECT gate_a, gate_b, n, n_a, n_b, n_both,
               n * n_both - n_a * n_b AS corr
        FROM p"""),
      (s, d) =>
        graft.ops.Profile.gateInteractions(t(s, d, "documents"), Seq(
          ("min_len", col("n_chars") >= 200),
          ("min_words", size(split(col("text"), " ")) >= 30),
          ("has_stopword", col("text").contains(" the ")),
          ("lang_en", col("lang") === "en")))),

    // Boilerplate-position profile: per relative-position decile, the
    // share of gram positions whose trigram occurs in another doc —
    // elevated head/tail deciles mean chrome (trim positionally), a
    // flat profile means body duplication (q184/q185 spans). Integer
    // decile arithmetic; one division per output row.
    QueryDef(
      "q220_boilerplate_position",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        base AS (SELECT doc_id,
                        CAST(greatest(len(toks)-2, 0) AS BIGINT) AS ng,
                        toks
                 FROM t),
        pg AS (SELECT doc_id, ng, p,
                      ('0x'||substr(md5(
                        array_to_string(toks[p:p+2],' ')),1,15))::BIGINT
                        AS gh
               FROM (SELECT doc_id, ng, toks,
                            unnest(range(1, ng + 1)) AS p
                     FROM base WHERE ng >= 1)),
        shared AS (SELECT gh FROM (
                     SELECT gh, count(DISTINCT doc_id) AS c
                     FROM pg GROUP BY 1) WHERE c > 1),
        fl AS (SELECT ((p - 1) * 10) // ng AS decile,
                      CASE WHEN s.gh IS NOT NULL THEN 1 ELSE 0 END
                        AS dup
               FROM pg LEFT JOIN shared s ON pg.gh = s.gh),
        h AS (SELECT decile, count(*) AS n_grams,
                     CAST(sum(dup) AS BIGINT) AS n_dup
              FROM fl GROUP BY 1),
        sp AS (SELECT unnest(range(0, 10)) AS decile)
        SELECT sp.decile,
               coalesce(h.n_grams, 0) AS n_grams,
               coalesce(h.n_dup, 0) AS n_dup,
               CASE WHEN coalesce(h.n_grams, 0) > 0
                    THEN CAST(coalesce(h.n_dup, 0) AS DOUBLE)
                         / CAST(h.n_grams AS DOUBLE)
                    ELSE 0.0 END AS dup_share
        FROM sp LEFT JOIN h ON sp.decile = h.decile"""),
      (s, d) =>
        TextOps.boilerplatePosition(t(s, d, "documents"), "doc_id",
          "text")),

    // Winnowing MATCH step (MOSS): document pairs sharing ≥2 selected
    // fingerprints — passage-overlap detection at ~2/(w+1) of the q41
    // index size, with the same df-cap discipline on the fingerprint
    // key (boilerplate fingerprints are the hot join keys AND carry no
    // signal). The oracle rebuilds selection (window replication,
    // rightmost tie-break) and the capped pair join independently.
    QueryDef(
      "q230_winnowing_matches",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        base AS (SELECT doc_id,
                        CAST(greatest(len(toks)-2, 0) AS BIGINT) AS ng,
                        toks
                 FROM t),
        ph AS (SELECT doc_id, ng, p,
                      ('0x'||substr(md5(
                        array_to_string(toks[p:p+2],' ')),1,15))::BIGINT
                        AS gh
               FROM (SELECT doc_id, ng, toks,
                            unnest(range(1, ng + 1)) AS p
                     FROM base WHERE ng >= 1)),
        st AS (SELECT doc_id, unnest(range(1, ng - 3 + 1)) AS s
               FROM base WHERE ng >= 4),
        j AS (SELECT st.doc_id, st.s, ph.p, ph.gh
              FROM st JOIN ph ON st.doc_id = ph.doc_id
                             AND ph.p BETWEEN st.s AND st.s + 3),
        seld AS (SELECT DISTINCT doc_id, gh FROM (
                   SELECT *, row_number() OVER (
                     PARTITION BY doc_id, s ORDER BY gh, p DESC) AS rn
                   FROM j)
                 WHERE rn = 1),
        kept AS (SELECT gh FROM seld GROUP BY gh
                 HAVING count(*) <= 1000),
        capped AS (SELECT seld.* FROM seld JOIN kept USING (gh))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_shared
        FROM capped a JOIN capped b
          ON a.gh = b.gh AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2"""),
      (s, d) =>
        TextOps.winnowingMatches(t(s, d, "documents"), "doc_id",
          "text"))
  )
}
