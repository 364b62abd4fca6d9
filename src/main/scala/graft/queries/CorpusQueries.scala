package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{Mixture, Retrieval, TextOps}
import graft.core.Checkpoints.BarrierOps

/** Round-5 corpus operators: boilerplate chunk-frequency filtering,
  * BM25 retrieval, Unicode NFC canonicalization (native expression),
  * deterministic mixture materialization (sampling + fractional epoch
  * upsampling), and vocabulary/OOV statistics.
  *
  * BM25 constants are interpolated into the oracle SQL from the SAME
  * Scala doubles the Spark plan uses (`toString` of a Double
  * round-trips exactly), so both engines compute with bit-identical
  * constants — `1.2 + 1.0` evaluated here and the literal `2.2`
  * parsed there are not guaranteed to be the same double.
  */
object CorpusQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** BM25 parameters, shared by the Spark plan and the oracle text. */
  private val K1 = 1.2
  private val B = 0.75

  /** The q87 query set: (query_id, term) pairs. */
  private val Bm25Queries: Seq[(Int, String)] = Seq(
    0 -> "table", 0 -> "join",
    1 -> "spark", 1 -> "data", 1 -> "fast",
    2 -> "window", 2 -> "agg")

  /** Combining tilde — q88 builds decomposed text with it so the NFC
    * composition is actually exercised (the corpus itself is ASCII,
    * which NFC maps to itself). */
  private val Tilde = "̃"

  val defs: Seq[QueryDef] = Seq(

    // Boilerplate chunk-frequency filter: every copy of a 4-token
    // chunk present in >2 distinct docs is dropped (headers/banners);
    // docs reassemble from surviving chunks in order. Complement of
    // q84's first-occurrence dedup.
    QueryDef(
      "q86_boilerplate_filter",
      Some("""
        WITH t AS (SELECT doc_id,
                     string_split(coalesce(text, ''), ' ') AS toks
                   FROM documents),
        s AS (SELECT doc_id,
                     unnest(range(0, (len(toks)+3)//4)) AS pos, toks
              FROM t),
        g AS (SELECT doc_id, pos,
                     array_to_string(toks[(pos*4+1):(pos*4+4)], ' ')
                       AS seg
              FROM s),
        d AS (SELECT seg, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM g GROUP BY 1),
        k AS (SELECT g.doc_id, g.pos, g.seg, d.df
              FROM g JOIN d USING (seg))
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(count(*) FILTER (WHERE df <= 2) AS BIGINT)
                 AS n_kept,
               CASE WHEN count(*) > 0
                    THEN CAST(count(*) FILTER (WHERE df <= 2) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE)
                    ELSE 0.0 END AS kept_fraction,
               md5(coalesce(string_agg(
                 CASE WHEN df <= 2 THEN seg END, ' ' ORDER BY pos), ''))
                 AS kept_md5
        FROM k GROUP BY 1"""),
      (s, d) =>
        TextOps.chunkFrequencyFilter(
          t(s, d, "documents")
            .select(col("doc_id"),
              coalesce(col("text"), lit("")).as("text")),
          "doc_id", "text", segTokens = 4, maxDf = 2)),

    // BM25 top-5 retrieval for a 3-query probe set (rational idf —
    // see Retrieval scaladoc for the no-ln determinism rationale).
    QueryDef(
      "q87_bm25_topk",
      Some(s"""
        WITH q(query_id, term) AS (VALUES
          ${Bm25Queries.map { case (q, w) => s"($q, '$w')" }
            .mkString(", ")}),
        t AS (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents),
        tok AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                       unnest(toks) AS term
                FROM t),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(CAST(sum(len(toks)) AS BIGINT) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE) AS avgdl
               FROM t),
        m AS (SELECT tok.* FROM tok
              JOIN (SELECT DISTINCT term FROM q) USING (term)),
        tf AS (SELECT doc_id, term, dl, CAST(count(*) AS BIGINT) AS tf
               FROM m GROUP BY 1, 2, 3),
        dfx AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT)
                  AS df
                FROM m GROUP BY 1),
        sc AS (SELECT q.query_id, tf.doc_id, tf.term,
                 (CAST(st.n_docs AS DOUBLE) - CAST(dfx.df AS DOUBLE)
                    + 0.5)
                 / (CAST(dfx.df AS DOUBLE) + 0.5)
                 * (CAST(tf.tf AS DOUBLE) * ${K1 + 1.0})
                 / (CAST(tf.tf AS DOUBLE) + ${K1} * (${1.0 - B}
                      + ${B} * CAST(tf.dl AS DOUBLE) / st.avgdl)) AS s
               FROM tf JOIN dfx USING (term) JOIN q USING (term)
               CROSS JOIN st),
        g AS (SELECT query_id, doc_id,
                list_reduce(
                  list_prepend(CAST(0.0 AS DOUBLE),
                    list(s ORDER BY term)),
                  (a, b) -> a + b) AS score
              FROM sc GROUP BY 1, 2)
        SELECT query_id, doc_id, score, rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS INT) AS rk FROM g)
        WHERE rk <= 5"""),
      (s, d) => {
        import s.implicits._
        Retrieval.bm25TopK(
          t(s, d, "documents"),
          Bm25Queries.toDF("query_id", "term"),
          "doc_id", "text", "query_id", "term", k1 = K1, b = B, k = 5)
      }),

    // RM3 pseudo-relevance feedback over q87's retrieval: each query
    // expands with the terms its own BM25 top-5 docs are about —
    // P_rm(t|q) ∝ Σ_d score_d·tf/dl, normalized by Σ_d score_d,
    // interpolated 50/50 with the uniform original-query model (so
    // original terms absent from every feedback doc still survive).
    // Log-free throughout; folds order by doc id, ranks total-order
    // on (weight desc, term) — the expansion hash-matches.
    QueryDef(
      "q238_rm3_expansion",
      Some(s"""
        WITH q(query_id, term) AS (VALUES
          ${Bm25Queries.map { case (q, w) => s"($q, '$w')" }
            .mkString(", ")}),
        t AS (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents),
        tok AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                       unnest(toks) AS term
                FROM t),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(CAST(sum(len(toks)) AS BIGINT) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE) AS avgdl
               FROM t),
        m AS (SELECT tok.* FROM tok
              JOIN (SELECT DISTINCT term FROM q) USING (term)),
        tf AS (SELECT doc_id, term, dl, CAST(count(*) AS BIGINT) AS tf
               FROM m GROUP BY 1, 2, 3),
        dfx AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT)
                  AS df
                FROM m GROUP BY 1),
        sc AS (SELECT q.query_id, tf.doc_id, tf.term,
                 (CAST(st.n_docs AS DOUBLE) - CAST(dfx.df AS DOUBLE)
                    + 0.5)
                 / (CAST(dfx.df AS DOUBLE) + 0.5)
                 * (CAST(tf.tf AS DOUBLE) * ${K1 + 1.0})
                 / (CAST(tf.tf AS DOUBLE) + ${K1} * (${1.0 - B}
                      + ${B} * CAST(tf.dl AS DOUBLE) / st.avgdl)) AS s
               FROM tf JOIN dfx USING (term) JOIN q USING (term)
               CROSS JOIN st),
        g AS (SELECT query_id, doc_id,
                list_reduce(
                  list_prepend(CAST(0.0 AS DOUBLE),
                    list(s ORDER BY term)),
                  (a, b) -> a + b) AS score
              FROM sc GROUP BY 1, 2),
        top AS (SELECT query_id, doc_id, score FROM (
                  SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY score DESC, doc_id) AS rk FROM g)
                WHERE rk <= 5),
        ftf AS (SELECT tok.doc_id, tok.term, tok.dl,
                       CAST(count(*) AS BIGINT) AS tf
                FROM tok JOIN (SELECT DISTINCT doc_id FROM top)
                  USING (doc_id)
                GROUP BY 1, 2, 3),
        con AS (SELECT top.query_id, ftf.term, top.doc_id,
                       top.score * (CAST(ftf.tf AS DOUBLE)
                         / CAST(ftf.dl AS DOUBLE)) AS c
                FROM top JOIN ftf USING (doc_id)),
        num AS (SELECT query_id, term,
                  list_reduce(
                    list_prepend(CAST(0.0 AS DOUBLE),
                      list(c ORDER BY doc_id)),
                    (a, b) -> a + b) AS num
                FROM con GROUP BY 1, 2),
        den AS (SELECT query_id,
                  list_reduce(
                    list_prepend(CAST(0.0 AS DOUBLE),
                      list(score ORDER BY doc_id)),
                    (a, b) -> a + b) AS den
                FROM top GROUP BY 1),
        qn AS (SELECT query_id, CAST(count(*) AS BIGINT) AS nq
               FROM q GROUP BY 1),
        base AS (SELECT query_id, term FROM num
                 UNION SELECT query_id, term FROM q),
        w AS (SELECT base.query_id, base.term,
                0.5 * (CASE WHEN qq.term IS NOT NULL
                       THEN 1.0 / CAST(qn.nq AS DOUBLE)
                       ELSE 0.0 END)
                + 0.5 * (COALESCE(num.num, 0.0) / den.den) AS weight
              FROM base
              LEFT JOIN num USING (query_id, term)
              JOIN den USING (query_id)
              JOIN qn USING (query_id)
              LEFT JOIN q qq ON base.query_id = qq.query_id
                AND base.term = qq.term)
        SELECT query_id, term, weight, rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY weight DESC, term) AS INT) AS rk FROM w)
        WHERE rk <= 10"""),
      (s, d) => {
        import s.implicits._
        Retrieval.rm3Expansion(
          t(s, d, "documents"),
          Bm25Queries.toDF("query_id", "term"),
          "doc_id", "text", "query_id", "term", k1 = K1, b = B,
          fbDocs = 5, fbTerms = 10, origWeight = 0.5)
      }),

    // Unicode NFC canonicalization via the native `nfc_normalize`
    // expression: decomposed text (combining tilde injected after
    // every 'a') composes back to precomposed form — codepoint counts
    // shrink, md5 certifies the exact bytes. Oracle: DuckDB's
    // utf8proc-backed nfc_normalize agrees with the JDK's UAX#15.
    QueryDef(
      "q88_nfc_normalize",
      Some(s"""
        WITH r AS (SELECT doc_id,
                     replace(substr(text, 1, 48), 'a', 'a$Tilde')
                       AS raw
                   FROM documents)
        SELECT doc_id,
               CAST(length(raw) AS INT) AS raw_cp,
               CAST(length(nfc_normalize(raw)) AS INT) AS norm_cp,
               raw <> nfc_normalize(raw) AS changed,
               md5(nfc_normalize(raw)) AS norm_md5
        FROM r"""),
      (s, d) => {
        val raw = t(s, d, "documents").select(col("doc_id"),
          expr(s"replace(substring(text, 1, 48), 'a', 'a$Tilde')")
            .as("raw"))
        val norm = call_function("nfc_normalize", col("raw"))
        raw.select(col("doc_id"),
          length(col("raw")).as("raw_cp"),
          length(norm).as("norm_cp"),
          (col("raw") =!= norm).as("changed"),
          md5(norm).as("norm_md5"))
      }),

    // Deterministic mixture materialization: hash-Bernoulli sample at
    // per-source rates min(1, 2·sqrt-weight); the query certifies the
    // per-source sample size and the integer keep threshold.
    QueryDef(
      "q89_mixture_sample",
      Some("""
        WITH c AS (SELECT source, count(*) AS n_docs
                   FROM documents GROUP BY 1),
        dn AS (SELECT list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(list(n_docs ORDER BY source),
                     x -> sqrt(CAST(x AS DOUBLE)))),
                 (a, b) -> a + b) AS denom FROM c),
        r AS (SELECT c.source,
                least(1.0, sqrt(CAST(c.n_docs AS DOUBLE)) / dn.denom
                  * 2.0) AS rate
              FROM c, dn),
        sdocs AS (SELECT d.source, d.doc_id,
                    CAST(floor(r.rate * 1000000.0) AS BIGINT) AS thr
                  FROM documents d JOIN r USING (source))
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_sampled,
               max(thr) AS thr
        FROM sdocs
        WHERE ('0x'||substr(md5(doc_id||':mix'),1,15))::BIGINT
                % 1000000 < thr
        GROUP BY 1"""),
      (s, d) =>
        Mixture.mixtureSample(t(s, d, "documents"), "source", "doc_id",
            factor = 2.0, salt = ":mix")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_sampled"), max(col("thr")).as("thr"))),

    // Fractional epoch upsampling: weight·10 copies per source-doc,
    // integer part as full copies + hash-Bernoulli fractional copy;
    // one output row per materialized copy.
    QueryDef(
      "q90_epoch_upsample",
      Some("""
        WITH c AS (SELECT source, count(*) AS n_docs
                   FROM documents GROUP BY 1),
        dn AS (SELECT list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(list(n_docs ORDER BY source),
                     x -> sqrt(CAST(x AS DOUBLE)))),
                 (a, b) -> a + b) AS denom FROM c),
        r AS (SELECT c.source,
                sqrt(CAST(c.n_docs AS DOUBLE)) / dn.denom * 10.0
                  AS epochs
              FROM c, dn),
        p AS (SELECT d.doc_id, d.source,
                CAST(floor(r.epochs) AS BIGINT) AS base,
                CAST(floor((r.epochs - floor(r.epochs)) * 1000000.0)
                  AS BIGINT) AS fthr
              FROM documents d JOIN r USING (source)),
        n AS (SELECT doc_id, source,
                base + CASE WHEN
                  ('0x'||substr(md5(doc_id||':ep'),1,15))::BIGINT
                    % 1000000 < fthr
                  THEN 1 ELSE 0 END AS n_copies
              FROM p)
        SELECT doc_id, source, n_copies,
               CAST(unnest(range(0, n_copies)) AS BIGINT) AS copy
        FROM n WHERE n_copies > 0"""),
      (s, d) =>
        Mixture.epochUpsample(t(s, d, "documents"), "source", "doc_id",
            scale = 10.0, salt = ":ep")
          .select(col("doc_id"), col("source"), col("n_copies"),
            col("copy"))),

    // Vocabulary + OOV rate: top-50 corpus terms by (count desc, term)
    // — a total order — then each doc's out-of-vocabulary token share.
    QueryDef(
      "q91_vocab_oov",
      Some("""
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' '))
                     AS term
                   FROM documents),
        v AS (SELECT term FROM (
                SELECT term, count(*) AS cnt,
                       row_number() OVER (ORDER BY count(*) DESC, term)
                         AS rn
                FROM w GROUP BY term)
              WHERE rn <= 50)
        SELECT w.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(count(*) FILTER (WHERE v.term IS NULL) AS BIGINT)
                 AS n_oov,
               CAST(count(*) FILTER (WHERE v.term IS NULL) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS oov_rate
        FROM w LEFT JOIN v ON w.term = v.term
        GROUP BY 1"""),
      (s, d) =>
        TextOps.vocabOovRate(t(s, d, "documents"), "doc_id", "text",
          vocabSize = 50)),

    // Deterministic k-per-group sample: top-10 docs per language by
    // hash priority — the reproducible eval-subset draw. The rank
    // filter compiles to WindowGroupLimit (partial top-k before the
    // exchange).
    QueryDef(
      "q95_group_ksample",
      Some("""
        SELECT doc_id, lang, rk FROM (
          SELECT doc_id, lang,
                 CAST(row_number() OVER (PARTITION BY lang ORDER BY
                   ('0x'||substr(md5(doc_id||':ks'),1,15))::BIGINT,
                   doc_id) AS INT) AS rk
          FROM documents)
        WHERE rk <= 10"""),
      (s, d) =>
        Mixture.groupKSample(
          t(s, d, "documents").select(col("doc_id"), col("lang")),
          "lang", "doc_id", k = 10)),

    // Blocking + edit-distance verification: docs sharing the cheap
    // (lang, n_chars) block key pair up, each pair verified with a
    // capped Levenshtein distance. Texts are compared at BYTE
    // granularity (UTF-8 bytes as latin-1 chars on the Spark side) —
    // DuckDB's levenshtein is byte-based while Spark's is
    // codepoint-based, and bytes are the form both engines agree on;
    // the 1000-char cap is applied before projection in both.
    QueryDef(
      "q96_editdist_verify",
      Some("""
        WITH d AS (SELECT doc_id, lang, n_chars,
                          substr(text, 1, 1000) AS t
                   FROM documents),
        p AS (SELECT a.lang, a.n_chars,
                     a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                     a.t AS ta, b.t AS tb
              FROM d a JOIN d b
                ON a.lang = b.lang AND a.n_chars = b.n_chars
               AND a.doc_id < b.doc_id)
        SELECT doc_id_a, doc_id_b, lang, n_chars,
               CAST(levenshtein(ta, tb) AS INT) AS lev,
               1.0 - CAST(levenshtein(ta, tb) AS DOUBLE)
                     / CAST(greatest(strlen(ta), strlen(tb), 1)
                            AS DOUBLE) AS norm_sim
        FROM p"""),
      (s, d) => {
        val prep = t(s, d, "documents").select(col("doc_id"),
          col("lang"), col("n_chars"),
          decode(encode(substring(col("text"), 1, 1000), "UTF-8"),
            "ISO-8859-1").as("text"))
        val pairs = graft.ops.Dedup.blockedPairs(prep, "doc_id",
          Seq("lang", "n_chars"), Seq("text"))
        // maxLen 4000 ≥ 4×1000 bytes: the char cap already ran, the
        // byte-char string is never re-cut
        graft.ops.Dedup.editDistanceVerify(pairs, "text_a", "text_b",
            maxLen = 4000)
          .select(col("doc_id_a"), col("doc_id_b"), col("lang"),
            col("n_chars"), col("lev"), col("norm_sim"))
      }),

    // Bounded near-dup gate: q96's blocked pairs filtered to
    // lev <= 200. The `LevenshteinThreshold` optimizer rule rewrites
    // the filter to the banded three-argument kernel (O(k·max) with
    // early exit, -1 past the threshold), and the projected full
    // distance is computed only for survivors of the pushed-down
    // filter.
    QueryDef(
      "q97_neardup_gate",
      Some("""
        WITH d AS (SELECT doc_id, lang, n_chars,
                          substr(text, 1, 1000) AS t
                   FROM documents),
        p AS (SELECT a.lang, a.n_chars,
                     a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                     a.t AS ta, b.t AS tb
              FROM d a JOIN d b
                ON a.lang = b.lang AND a.n_chars = b.n_chars
               AND a.doc_id < b.doc_id)
        SELECT doc_id_a, doc_id_b, lang,
               CAST(levenshtein(ta, tb) AS INT) AS lev
        FROM p WHERE levenshtein(ta, tb) <= 200"""),
      (s, d) => {
        val prep = t(s, d, "documents").select(col("doc_id"),
          col("lang"), col("n_chars"),
          decode(encode(substring(col("text"), 1, 1000), "UTF-8"),
            "ISO-8859-1").as("text"))
        val pairs = graft.ops.Dedup.blockedPairs(prep, "doc_id",
          Seq("lang", "n_chars"), Seq("text"))
        graft.ops.Dedup.editDistanceVerify(pairs, "text_a", "text_b",
            maxLen = 4000)
          .filter(col("lev") <= 200)
          .select(col("doc_id_a"), col("doc_id_b"), col("lang"),
            col("lev"))
      }),

    // Inverted-index (posting list) export for common terms: per term,
    // document frequency + the doc-id posting list in sorted order —
    // the build step under any retrieval index (q87 consumes the tf
    // side of this). Postings emit as a joined string (the engine's
    // array-compare convention, q06). At 100 TB this output writes
    // sharded by term hash (Sharding.writeSharded) — a posting list is
    // itself big data, never a driver-side object.
    QueryDef(
      "q112_posting_lists",
      Some("""
        WITH t AS (SELECT doc_id,
                     unnest(list_distinct(string_split(text,' ')))
                       AS term
                   FROM documents)
        SELECT term, count(*) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ','
                 ORDER BY doc_id) AS postings
        FROM t GROUP BY term HAVING count(*) >= 25"""),
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"),
            explode(array_distinct(TextOps.tokens(col("text"))))
              .as("term"))
          .groupBy(col("term"))
          .agg(count(lit(1)).as("df"),
            array_join(
              transform(sort_array(collect_list(col("doc_id"))),
                _.cast("string")), ",").as("postings"))
          .filter(col("df") >= 25)),

    // Chi-square keyness: top-50 terms distinguishing the src0 slice
    // from the rest of the corpus — keyword extraction / domain-drift
    // detection for training mixes. Every χ² term is an exact
    // DECIMAL(38,0) integer; ONE IEEE division at the end makes the
    // score and the top-50 cut (tie-broken by term) engine-exact.
    // Corpus sizes arrive as a one-row broadcast, never a driver
    // count().
    QueryDef(
      "q123_chi2_keyness",
      Some("""
        WITH t AS (SELECT doc_id, source,
                          list_distinct(string_split(text, ' '))
                            AS terms
                   FROM documents),
        e AS (SELECT unnest(terms) AS term,
                     CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS f
              FROM t),
        g AS (SELECT term, CAST(sum(f) AS BIGINT) AS df_focus,
                     CAST(sum(1 - f) AS BIGINT) AS df_ref
              FROM e GROUP BY 1),
        tot AS (SELECT count(*) FILTER (WHERE source = 'src0') AS nf,
                       count(*) FILTER (WHERE source <> 'src0') AS nr
                FROM documents),
        x AS (SELECT term, df_focus, df_ref,
                     CAST(df_focus AS HUGEINT) AS a,
                     CAST(df_ref AS HUGEINT) AS b,
                     CAST(nf AS HUGEINT) - df_focus AS c,
                     CAST(nr AS HUGEINT) - df_ref AS dd,
                     CAST(nf + nr AS HUGEINT) AS n
              FROM g, tot)
        SELECT term, df_focus, df_ref,
               CASE WHEN (a+b)*(c+dd)*(a+c)*(b+dd) = 0 THEN NULL
                    ELSE CAST(n*(a*dd-b*c)*(a*dd-b*c) AS DOUBLE)
                       / CAST((a+b)*(c+dd)*(a+c)*(b+dd) AS DOUBLE) END
                 AS chi2
        FROM x
        ORDER BY chi2 DESC NULLS LAST, term LIMIT 50"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        TextOps.chiSquareKeyness(
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") =!= "src0"),
          "doc_id", "text", topN = 50)
      }),

    // Bigram LM counts: adjacent-pair counts + conditional probability
    // c(w1 w2)/c(w1 ·) — the n-gram language-model estimation step and
    // the collocation miner. Bigrams via a position-indexed transform
    // over the token array (no self-join, no raw-row window); the
    // continuation mass is a window over the AGGREGATED bigram table.
    QueryDef(
      "q124_bigram_lm",
      Some("""
        WITH t AS (SELECT string_split(text, ' ') AS toks
                   FROM documents
                   WHERE len(string_split(text, ' ')) >= 2),
        b0 AS (SELECT toks, unnest(range(1, len(toks))) AS i FROM t),
        b AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM b0),
        c AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY 1, 2),
        w AS (SELECT w1, w2, c12,
                     CAST(sum(c12) OVER (PARTITION BY w1) AS BIGINT)
                       AS c1
              FROM c)
        SELECT w1, w2, c12, c1,
               CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p_cond
        FROM w WHERE c12 >= 5"""),
      (s, d) =>
        TextOps.bigramCounts(t(s, d, "documents"), "text",
          minCount = 5L)),

    // Vocabulary richness per source: type-token ratio and hapax
    // fraction — the lexical-diversity fingerprint that separates
    // template/boilerplate mills (low TTR) from organic text, and a
    // dedup-effectiveness before/after metric. One (source, term)
    // hash agg, one per-source rollup; both ratios are single IEEE
    // divisions of exact counts.
    QueryDef(
      "q135_vocab_richness",
      Some("""
        WITH tt AS (SELECT source, unnest(string_split(text, ' '))
                      AS term
                    FROM documents),
        c AS (SELECT source, term, count(*) AS cnt
              FROM tt GROUP BY 1, 2)
        SELECT source,
               CAST(sum(cnt) AS BIGINT) AS total_tokens,
               count(*) AS distinct_terms,
               count(*) FILTER (WHERE cnt = 1) AS hapax_terms,
               CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
                 AS ttr,
               CAST(count(*) FILTER (WHERE cnt = 1) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS hapax_frac
        FROM c GROUP BY 1"""),
      (s, d) => {
        val c = t(s, d, "documents")
          .select(col("source"),
            explode(TextOps.tokens(col("text"))).as("term"))
          .groupBy(col("source"), col("term"))
          .agg(count(lit(1)).as("cnt"))
        c.groupBy(col("source"))
          .agg(sum(col("cnt")).as("total_tokens"),
            count(lit(1)).as("distinct_terms"),
            graft.ops.Aggregates.countIf(col("cnt") === 1)
              .as("hapax_terms"))
          .select(col("source"), col("total_tokens"),
            col("distinct_terms"), col("hapax_terms"),
            (col("distinct_terms").cast("double") /
              col("total_tokens").cast("double")).as("ttr"),
            (col("hapax_terms").cast("double") /
              col("distinct_terms").cast("double")).as("hapax_frac"))
      }),

    // Cross-source vocabulary overlap matrix: shared distinct terms,
    // per-direction containment and Jaccard for every source pair —
    // the redundancy audit run BEFORE mixing corpora (a source whose
    // vocab is 95% contained in another adds little diversity). The
    // self-join key is the term, but pair volume is bounded by
    // #sources² per term, never by corpus size — the safe kind of
    // inverted-index join.
    QueryDef(
      "q141_source_overlap",
      Some("""
        WITH st AS (SELECT DISTINCT source,
                           unnest(string_split(text, ' ')) AS term
                    FROM documents),
        sz AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
        sh AS (SELECT a.source AS src_a, b.source AS src_b,
                      count(*) AS n_shared
               FROM st a JOIN st b
                 ON a.term = b.term AND a.source < b.source
               GROUP BY 1, 2)
        SELECT sh.src_a, sh.src_b, sh.n_shared,
               za.n AS n_a, zb.n AS n_b,
               CAST(sh.n_shared AS DOUBLE) / CAST(za.n AS DOUBLE)
                 AS contain_a,
               CAST(sh.n_shared AS DOUBLE) / CAST(zb.n AS DOUBLE)
                 AS contain_b,
               CAST(sh.n_shared AS DOUBLE)
                 / CAST(za.n + zb.n - sh.n_shared AS DOUBLE)
                 AS jaccard
        FROM sh JOIN sz za ON za.source = sh.src_a
                JOIN sz zb ON zb.source = sh.src_b"""),
      (s, d) => {
        // st feeds THREE consumers (sizes + both join sides); the lazy
        // localCheckpoint materializes the corpus explode+distinct once
        // (Retrieval.bm25TopK precedent — Catalyst would inline it 3×)
        val st = t(s, d, "documents")
          .select(col("source"),
            explode(TextOps.tokens(col("text"))).as("term"))
          .distinct()
          .barrier()
        val sz = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val sh = st.select(col("source").as("src_a"), col("term"))
          .join(st.select(col("source").as("src_b"), col("term")),
            Seq("term"))
          .filter(col("src_a") < col("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("n_shared"))
        sh.join(broadcast(sz.select(col("source").as("src_a"),
            col("n").as("n_a"))), "src_a")
          .join(broadcast(sz.select(col("source").as("src_b"),
            col("n").as("n_b"))), "src_b")
          .select(col("src_a"), col("src_b"), col("n_shared"),
            col("n_a"), col("n_b"),
            (col("n_shared").cast("double") / col("n_a").cast("double"))
              .as("contain_a"),
            (col("n_shared").cast("double") / col("n_b").cast("double"))
              .as("contain_b"),
            (col("n_shared").cast("double") /
              (col("n_a") + col("n_b") - col("n_shared"))
                .cast("double")).as("jaccard"))
      }),

    // Metric correlation matrix: exact Pearson r for every pair of
    // per-doc integer metrics (chars, tokens, stopword hits) — the
    // feature-redundancy audit before building quality composites
    // (two metrics with r ≈ 1 double-count one signal). Melt to
    // (doc, metric, v), pair within doc (bounded by #metrics²),
    // then q121's DECIMAL-exact Pearson keyed on the metric PAIR.
    QueryDef(
      "q144_metric_correlation",
      Some("""
        WITH m AS (
          SELECT doc_id, 'n_chars' AS metric, n_chars AS v
          FROM documents
          UNION ALL
          SELECT doc_id, 'n_tokens',
                 CAST(len(string_split(text, ' ')) AS BIGINT)
          FROM documents
          UNION ALL
          SELECT doc_id, 'n_stop',
                 CAST(len(list_filter(string_split(text, ' '),
                   x -> list_contains(['the','a','of','and','to','in',
                     'is','it'], x))) AS BIGINT)
          FROM documents),
        p AS (SELECT a.metric AS metric_a, b.metric AS metric_b,
                     a.v AS x, b.v AS y
              FROM m a JOIN m b ON a.doc_id = b.doc_id
                AND a.metric < b.metric),
        g AS (SELECT metric_a, metric_b, count(*) AS n,
                     sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
                     sum(x*x) AS sxx, sum(y*y) AS syy
              FROM p GROUP BY 1, 2)
        SELECT metric_a, metric_b, n,
               CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0
                    THEN NULL
                    ELSE CAST(n*sxy - sx*sy AS DOUBLE)
                       / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                        * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) END
                 AS pearson_r
        FROM g"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
        val m = docs.select(col("doc_id"),
          explode(array(
            struct(lit("n_chars").as("metric"),
              col("n_chars").cast("long").as("v")),
            struct(lit("n_tokens").as("metric"),
              size(TextOps.tokens(col("text"))).cast("long").as("v")),
            struct(lit("n_stop").as("metric"),
              size(filter(TextOps.tokens(col("text")),
                w => w.isin(stop: _*))).cast("long").as("v"))))
            .as("mv"))
          .select(col("doc_id"), col("mv.metric").as("metric"),
            col("mv.v").as("v"))
        val pairs = m.select(col("doc_id"),
            col("metric").as("metric_a"), col("v").as("x"))
          .join(m.select(col("doc_id"), col("metric").as("metric_b"),
            col("v").as("y")), Seq("doc_id"))
          .filter(col("metric_a") < col("metric_b"))
        graft.ops.Aggregates.groupPearson(pairs,
          Seq("metric_a", "metric_b"), "x", "y")
      }),

    // Zipf profile per source: term frequency at doubling ranks
    // (1,2,4,...,128) plus vocabulary size, token mass, and top-10
    // head share. The Zipf exponent falls out as
    // log2(cnt@r / cnt@2r) between consecutive rows — derived by the
    // CONSUMER, keeping the engine log-free (libm log diverges across
    // engines in the last ulp; repo determinism rule). The rank<=128
    // window plans as WindowGroupLimit, so each source keeps a
    // 128-row heap per partition instead of sorting its whole
    // vocabulary; the aggregates are plain map-side-combined sums.
    QueryDef(
      "q156_zipf_profile",
      Some("""
        WITH tok AS (SELECT source, unnest(string_split(text, ' ')) term
                     FROM documents),
        tf AS (SELECT source, term, count(*) AS c FROM tok GROUP BY 1, 2),
        rk AS (SELECT source, term, c,
                      CAST(row_number() OVER (PARTITION BY source
                        ORDER BY c DESC, term) AS INT) AS rank
               FROM tf),
        st AS (SELECT source, count(*) AS n_distinct,
                      CAST(sum(c) AS BIGINT) AS n_tokens
               FROM tf GROUP BY 1),
        h AS (SELECT source, CAST(sum(c) AS BIGINT) AS top10
              FROM rk WHERE rank <= 10 GROUP BY 1)
        SELECT rk.source, rank, c AS cnt, st.n_distinct, st.n_tokens,
               CAST(h.top10 AS DOUBLE) / CAST(st.n_tokens AS DOUBLE)
                 AS top10_share
        FROM rk JOIN st USING (source) JOIN h USING (source)
        WHERE rank IN (1, 2, 4, 8, 16, 32, 64, 128)"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // tf feeds the rank window AND the vocabulary aggregates —
        // checkpoint it once (q141/q142 shared-relation precedent)
        // so the tokenize+count subtree isn't inlined per consumer
        val tf = t(s, d, "documents")
          .select(col("source"), explode(TextOps.tokens(col("text")))
            .as("term"))
          .groupBy(col("source"), col("term"))
          .agg(count(lit(1)).as("c"))
          .barrier()
        val rk = tf.select(col("source"), col("c"),
          row_number().over(Window.partitionBy(col("source"))
            .orderBy(col("c").desc, col("term"))).as("rank"))
          .filter(col("rank") <= 128)
          .barrier() // <= 128 rows/source, reused twice
        val st = tf.groupBy(col("source"))
          .agg(count(lit(1)).as("n_distinct"),
            sum(col("c")).as("n_tokens"))
        val h = rk.filter(col("rank") <= 10)
          .groupBy(col("source")).agg(sum(col("c")).as("top10"))
        rk.filter(col("rank").isin(1, 2, 4, 8, 16, 32, 64, 128))
          .join(broadcast(st), Seq("source"))
          .join(broadcast(h), Seq("source"))
          .select(col("source"), col("rank"), col("c").as("cnt"),
            col("n_distinct"), col("n_tokens"),
            (col("top10").cast("double") / col("n_tokens").cast("double"))
              .as("top10_share"))
      })
  )
}
