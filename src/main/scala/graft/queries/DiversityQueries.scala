package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{CorpusDiversity, Mixture, TextOps}

/** Corpus-composition and ingestion-order operators: lexical
  * diversity, inter-source distribution drift, core-vocabulary
  * coverage, incremental-ingest dedup admission, curriculum ordering,
  * and the length×quality census grid — the per-snapshot monitors and
  * loaders that sit between raw curation (q40-q73) and training.
  *
  * All queries follow the repo determinism contract: integer/decimal
  * arithmetic end to end with one final IEEE division (see
  * `CorpusDiversity` scaladoc) — no logs, no engine-variant rounding.
  */
object DiversityQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** DuckDB CTE fragment: per-doc quality metrics — EXACTLY q50's
    * formula (TextOps.qualityColumns), shared by the curriculum and
    * census queries. Yields relation `q(doc_id, source, n_chars,
    * quality_score)`. */
  private val dkQuality =
    """t AS (SELECT doc_id, source, n_chars,
      |             string_split(text,' ') toks,
      |             CAST(len(string_split(text,' ')) AS BIGINT) nt,
      |             CAST(length(replace(text,' ','')) AS BIGINT) nc
      |      FROM documents),
      |h AS (SELECT *, CAST(len(list_filter(toks, x -> list_contains(
      |        ['the','a','of','and','to','in','is','it'], x))) AS BIGINT) he
      |      FROM t),
      |q AS (SELECT doc_id, source, n_chars,
      |        CAST(800*he + 6*nt*least(nt,100) + 75*least(nc,8*nt)
      |          AS DOUBLE) / (2000.0*CAST(nt AS DOUBLE)) AS quality_score
      |      FROM h)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Per-source lexical diversity: tokens, types, type-token ratio,
    // Gini-Simpson 1 - sum(p^2). Diversity WITHOUT logs: Shannon
    // entropy's ln differs in the last ulp across libm builds, while
    // 1 - sum(cnt^2)/N^2 is a rational function of counts — exact in
    // DECIMAL(38,0) up to the single final division in both engines.
    QueryDef(
      "q170_token_diversity",
      Some("""
        WITH tok AS (SELECT source, unnest(string_split(text,' ')) AS term
                     FROM documents),
        c AS (SELECT source, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
        s AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
                count(*) AS n_types,
                sum(CAST(cnt*cnt AS DECIMAL(38,0))) AS sumsq
              FROM c GROUP BY 1)
        SELECT source, n_tokens, n_types,
               CAST(n_types AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS ttr,
               1.0 - CAST(sumsq AS DOUBLE) /
                 (CAST(n_tokens AS DOUBLE)*CAST(n_tokens AS DOUBLE))
                 AS gini_simpson
        FROM s"""),
      (s, d) =>
        CorpusDiversity.tokenDiversity(t(s, d, "documents"),
          "source", "text")),

    // Pairwise total-variation distance between source unigram
    // distributions: TV = (1/2) sum |p_a - p_b|, cross-multiplied to
    // integers (HUGEINT in the oracle, DECIMAL(38,0) in Spark — same
    // ~10^38 range) so the sum is order-independent and exact; one
    // double division at the end. The drift matrix a corpus snapshot
    // diff reports.
    QueryDef(
      "q171_source_tv_distance",
      Some("""
        WITH tok AS (SELECT source, unnest(string_split(text,' ')) AS term
                     FROM documents),
        c AS (SELECT source, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
        tt AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS total
               FROM c GROUP BY 1),
        m AS (SELECT a.source sa, b.source sb, a.cnt ca, b.cnt cb
              FROM c a JOIN c b ON a.term = b.term AND a.source < b.source),
        g AS (SELECT m.sa, m.sb, count(*) AS n_shared_terms,
                sum(abs(CAST(m.ca AS HUGEINT)*tb.total
                      - CAST(m.cb AS HUGEINT)*ta.total)) AS mdiff,
                CAST(sum(m.ca) AS BIGINT) AS ssa,
                CAST(sum(m.cb) AS BIGINT) AS ssb
              FROM m JOIN tt ta ON ta.source = m.sa
                     JOIN tt tb ON tb.source = m.sb
              GROUP BY 1, 2),
        p AS (SELECT x.source sa, y.source sb, x.total ta, y.total tb
              FROM tt x JOIN tt y ON x.source < y.source)
        SELECT p.sa AS source_a, p.sb AS source_b,
               coalesce(g.n_shared_terms, 0) AS n_shared_terms,
               CAST(coalesce(g.mdiff, 0)
                   + CAST(p.ta - coalesce(g.ssa, 0) AS HUGEINT)*p.tb
                   + CAST(p.tb - coalesce(g.ssb, 0) AS HUGEINT)*p.ta
                 AS DOUBLE)
                 / (2.0 * CAST(p.ta AS DOUBLE) * CAST(p.tb AS DOUBLE))
                 AS tv_dist
        FROM p LEFT JOIN g ON g.sa = p.sa AND g.sb = p.sb"""),
      (s, d) =>
        CorpusDiversity.tvDistance(t(s, d, "documents"),
          "source", "text")),

    // Core-vocabulary coverage: per source, the fraction of token
    // mass covered by the corpus-global top-10 tokens (ties broken
    // by token text; k sized to the synthetic corpus vocabulary so
    // the metric discriminates — production corpora use k=100+).
    // Template/boilerplate contamination shows up as a coverage
    // spike vs sibling sources.
    QueryDef(
      "q172_core_token_coverage",
      Some("""
        WITH tok AS (SELECT source, unnest(string_split(text,' ')) AS term
                     FROM documents),
        g AS (SELECT term, count(*) AS gcnt FROM tok GROUP BY 1),
        top AS (SELECT term FROM (
                  SELECT term, row_number() OVER
                    (ORDER BY gcnt DESC, term) AS rk FROM g)
                WHERE rk <= 10),
        per AS (SELECT source, count(*) AS n_tokens FROM tok GROUP BY 1),
        cov AS (SELECT source, count(*) AS covered_tokens
                FROM tok JOIN top USING (term) GROUP BY 1)
        SELECT per.source, per.n_tokens,
               coalesce(cov.covered_tokens, 0) AS covered_tokens,
               CAST(coalesce(cov.covered_tokens, 0) AS DOUBLE)
                 / CAST(per.n_tokens AS DOUBLE) AS coverage
        FROM per LEFT JOIN cov USING (source)"""),
      (s, d) =>
        CorpusDiversity.coreTokenCoverage(t(s, d, "documents"),
          "source", "text", k = 10)),

    // Incremental-ingest dedup gate: docs with doc_id % 5 = 4 play
    // the incoming batch, the rest the existing corpus. A batch doc
    // is dropped on an exact md5 match into the base or a trigram
    // Jaccard >= 0.5 near-dup vs any base doc — via the DIRECTED
    // inverted-index join (batch shingles x base shingles only; the
    // df <= 1000 hot-shingle cap is computed over the union, mirrored
    // here). The daily-ingest shape: work scales with the batch, the
    // base is never self-joined.
    QueryDef(
      "q173_incremental_dedup",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        sarr AS (SELECT doc_id,
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(range(1, len(toks)-1),
                               i -> array_to_string(toks[i:i+2], ' '))
                        ELSE []::VARCHAR[] END AS shs
                 FROM t),
        sh AS (SELECT doc_id, len(shsd) AS nsh, unnest(shsd) AS sh
               FROM (SELECT doc_id, list_distinct(list_transform(shs,
                       g -> ('0x'||substr(md5(g),1,15))::BIGINT)) shsd
                     FROM sarr)),
        kept AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 1000),
        shb AS (SELECT s.doc_id, s.nsh, s.sh FROM sh s
                JOIN kept USING (sh) WHERE s.doc_id % 5 <> 4),
        shi AS (SELECT s.doc_id, s.nsh, s.sh FROM sh s
                JOIN kept USING (sh) WHERE s.doc_id % 5 = 4),
        cand AS (SELECT i.doc_id di, b.doc_id db, i.nsh ni, b.nsh nb,
                        count(*) AS common
                 FROM shi i JOIN shb b ON i.sh = b.sh
                 GROUP BY 1, 2, 3, 4),
        near AS (SELECT DISTINCT di AS doc_id FROM cand
                 WHERE CAST(common AS DOUBLE)/(ni+nb-common) >= 0.5),
        ex AS (SELECT DISTINCT i.doc_id FROM documents i
               WHERE i.doc_id % 5 = 4 AND md5(i.text) IN
                 (SELECT md5(text) FROM documents WHERE doc_id % 5 <> 4))
        SELECT d.doc_id,
               (ex.doc_id IS NOT NULL) AS drop_exact,
               (near.doc_id IS NOT NULL) AS drop_near,
               (ex.doc_id IS NULL AND near.doc_id IS NULL) AS is_admitted
        FROM documents d
        LEFT JOIN ex ON ex.doc_id = d.doc_id
        LEFT JOIN near ON near.doc_id = d.doc_id
        WHERE d.doc_id % 5 = 4"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        TextOps.incrementalAdmissions(
          docs.filter(col("doc_id") % 5 =!= 4),
          docs.filter(col("doc_id") % 5 === 4),
          "doc_id", "text", minJac = 0.5, maxDf = 1000)
      }),

    // Source-interleaved curriculum order: rank docs within source by
    // (quality desc, doc_id), then round-robin sources rank by rank —
    // global position via the prefix-decomposed row number (no
    // single-partition window). First 100 positions of the training
    // order.
    QueryDef(
      "q174_curriculum_order",
      Some(s"""
        WITH $dkQuality,
        r AS (SELECT doc_id, source, quality_score,
                CAST(row_number() OVER (PARTITION BY source
                  ORDER BY quality_score DESC, doc_id) AS INT) AS src_rank
              FROM q)
        SELECT CAST(row_number() OVER (ORDER BY src_rank, source)
                 AS BIGINT) AS position,
               doc_id, source, src_rank, quality_score
        FROM r
        QUALIFY position <= 100"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val scored = docs.select(col("doc_id"), col("source"),
          TextOps.qualityColumns(col("text")).last)
        Mixture.curriculumOrder(scored, "source", "doc_id",
          "quality_score", topK = 100)
      }),

    // Length x quality census grid: doc counts over (n_chars div 100,
    // floor(quality*10)) cells — the 2-D histogram a curation
    // dashboard renders to spot the junk corner (short + low-quality)
    // before gating. Bin edges are integer/exact-double arithmetic,
    // engine-identical.
    QueryDef(
      "q175_len_quality_grid",
      Some(s"""
        WITH $dkQuality
        SELECT CAST(n_chars // 100 AS BIGINT) AS len_bin,
               CAST(floor(quality_score*10) AS BIGINT) AS q_bin,
               count(*) AS n_docs
        FROM q GROUP BY 1, 2"""),
      (s, d) =>
        t(s, d, "documents")
          .select(col("n_chars"),
            TextOps.qualityColumns(col("text")).last)
          .select(
            expr("CAST(n_chars div 100 AS BIGINT)").as("len_bin"),
            floor(col("quality_score") * 10).cast("long").as("q_bin"))
          .groupBy(col("len_bin"), col("q_bin"))
          .agg(count(lit(1)).as("n_docs"))),

    // Per-doc novelty: the fraction of a doc's distinct trigram
    // shingles that appear NOWHERE else in the corpus (df = 1 on the
    // same inverted index the dedup family rides). 1.0 = all-original
    // content, ~0 = assembled from shared fragments — the doc-level
    // uniqueness signal quality gates combine with q50. Shingle-less
    // docs (< 3 tokens) report 0 shingles and novelty 0 (total
    // function, left join back to the corpus).
    QueryDef(
      "q176_doc_novelty",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        sarr AS (SELECT doc_id,
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(range(1, len(toks)-1),
                               i -> array_to_string(toks[i:i+2], ' '))
                        ELSE []::VARCHAR[] END AS shs
                 FROM t),
        sh AS (SELECT doc_id, unnest(shsd) AS sh
               FROM (SELECT doc_id, list_distinct(list_transform(shs,
                       g -> ('0x'||substr(md5(g),1,15))::BIGINT)) shsd
                     FROM sarr)),
        dfx AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1),
        per AS (SELECT s.doc_id, count(*) AS n_shingles,
                  count(*) FILTER (WHERE dfx.df = 1) AS n_unique
                FROM sh s JOIN dfx USING (sh) GROUP BY 1)
        SELECT d.doc_id,
               coalesce(per.n_shingles, 0) AS n_shingles,
               coalesce(per.n_unique, 0) AS n_unique,
               CASE WHEN per.n_shingles IS NULL THEN 0.0
                    ELSE CAST(per.n_unique AS DOUBLE)/per.n_shingles
               END AS novelty
        FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val sh = docs.select(col("doc_id"),
          explode(TextOps.shingleHashes(col("text")))
            .as("sh"))
        val per = sh
          .withColumn("df", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("sh"))))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
        docs.select(col("doc_id"))
          .join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
            coalesce(col("n_unique"), lit(0L)).as("n_unique"),
            when(col("n_shingles").isNull, lit(0.0))
              .otherwise(col("n_unique").cast("double") /
                col("n_shingles"))
              .as("novelty"))
      }),

    // Within-source duplicate inflation: docs vs md5-distinct texts
    // per source — inflation 1.0 = no exact dups, 2.0 = every text
    // appears twice on average. The one-glance health number a scrape
    // monitor alerts on (a crawler loop shows up here first); the
    // cross-SOURCE sibling is q157's duplication matrix.
    QueryDef(
      "q178_dup_inflation",
      Some("""
        SELECT source, count(*) AS n_docs,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
               count(*) - CAST(count(DISTINCT md5(text)) AS BIGINT)
                 AS n_redundant,
               CAST(count(*) AS DOUBLE) / count(DISTINCT md5(text))
                 AS inflation
        FROM documents GROUP BY 1"""),
      (s, d) =>
        t(s, d, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(md5(col("text"))).as("n_distinct"),
            (count(lit(1)) - countDistinct(md5(col("text"))))
              .as("n_redundant"),
            (count(lit(1)).cast("double") /
              countDistinct(md5(col("text")))).as("inflation"))),

    // Per-doc typicality under the corpus unigram distribution: the
    // mean corpus probability of the doc's tokens, sum_t cnt_d(t)·g(t)
    // / (n_tokens·N) — the RATIONAL analog of a CCNet-style
    // perplexity gate (language-model cross-entropy needs ln, which
    // differs in the last ulp across libm builds; this statistic ranks
    // docs the same way for gating: low typicality = tokens rare
    // corpus-wide). Integer numerators in DECIMAL(38,0)/HUGEINT, one
    // multiply + one divide in IEEE double at the end. The term join
    // runs on per-(doc,term) aggregated rows, so a stopword term
    // contributes one row per doc containing it, never per occurrence;
    // N arrives by one-row broadcast, never a driver count().
    QueryDef(
      "q181_doc_typicality",
      Some("""
        WITH tok AS (SELECT doc_id,
                            unnest(string_split(text,' ')) AS term
                     FROM documents),
        dt AS (SELECT doc_id, term, count(*) AS cnt_d
               FROM tok GROUP BY 1, 2),
        g AS (SELECT term, count(*) AS gcnt FROM tok GROUP BY 1),
        n AS (SELECT count(*) AS n_total FROM tok),
        per AS (SELECT dt.doc_id,
                  CAST(sum(dt.cnt_d) AS BIGINT) AS n_tokens,
                  sum(CAST(dt.cnt_d*g.gcnt AS HUGEINT)) AS wsum
                FROM dt JOIN g USING (term) GROUP BY 1)
        SELECT doc_id, n_tokens,
               CAST(wsum AS BIGINT) AS sum_cnt,
               CAST(wsum AS DOUBLE) /
                 (CAST(n_tokens AS DOUBLE) * CAST(n.n_total AS DOUBLE))
                 AS typicality
        FROM per, n"""),
      (s, d) => {
        val tok = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), " "))
            .as("term"))
        val dt = tok.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("cnt_d"))
        val g = tok.groupBy(col("term")).agg(count(lit(1)).as("gcnt"))
        val n = tok.agg(count(lit(1)).as("n_total"))
        dt.join(g, Seq("term"))
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt_d")).as("n_tokens"),
            sum((col("cnt_d") * col("gcnt"))
              .cast("decimal(38,0)")).as("wsum"))
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("n_tokens"),
            col("wsum").cast("long").as("sum_cnt"),
            (col("wsum").cast("double") /
              (col("n_tokens").cast("double") *
                col("n_total").cast("double"))).as("typicality"))
      }),

    // Greedy maximum-coverage selection (CorpusDiversity
    // .maxCoverageSelect): 4 rounds of the (1 - 1/e) submodular
    // greedy over trigram-shingle sets - the count-based coreset
    // picker beside q240's embedding-space MMR. The oracle unrolls
    // all 4 rounds (gain table -> LIMIT 1 winner -> covered-set
    // union), with the same (gain DESC, doc ASC) tie order, so the
    // whole greedy trajectory is hash-verified, not just the final
    // pick set.
    QueryDef(
      "q249_max_coverage",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        p0 AS (SELECT doc_id, unnest(range(1, len(toks)-1)) AS j, toks
               FROM t WHERE len(toks) >= 3),
        p AS (SELECT DISTINCT doc_id AS doc,
                ('0x'||substr(md5(
                  array_to_string(toks[j:j+2],' ')),1,15))::BIGINT AS sh
              FROM p0),
        g1 AS (SELECT doc, count(*) AS gain FROM p GROUP BY 1),
        w1 AS (SELECT 1 AS round, doc, gain FROM g1
               ORDER BY gain DESC, doc LIMIT 1),
        c1 AS (SELECT DISTINCT sh FROM p JOIN w1 USING (doc)),
        g2 AS (SELECT doc, count(*) AS gain FROM p
               WHERE sh NOT IN (SELECT sh FROM c1)
                 AND doc NOT IN (SELECT doc FROM w1)
               GROUP BY 1),
        w2 AS (SELECT 2 AS round, doc, gain FROM g2
               ORDER BY gain DESC, doc LIMIT 1),
        c2 AS (SELECT sh FROM c1
               UNION SELECT sh FROM p JOIN w2 USING (doc)),
        g3 AS (SELECT doc, count(*) AS gain FROM p
               WHERE sh NOT IN (SELECT sh FROM c2)
                 AND doc NOT IN (SELECT doc FROM w1
                                 UNION SELECT doc FROM w2)
               GROUP BY 1),
        w3 AS (SELECT 3 AS round, doc, gain FROM g3
               ORDER BY gain DESC, doc LIMIT 1),
        c3 AS (SELECT sh FROM c2
               UNION SELECT sh FROM p JOIN w3 USING (doc)),
        g4 AS (SELECT doc, count(*) AS gain FROM p
               WHERE sh NOT IN (SELECT sh FROM c3)
                 AND doc NOT IN (SELECT doc FROM w1
                                 UNION SELECT doc FROM w2
                                 UNION SELECT doc FROM w3)
               GROUP BY 1),
        w4 AS (SELECT 4 AS round, doc, gain FROM g4
               ORDER BY gain DESC, doc LIMIT 1),
        c4 AS (SELECT sh FROM c3
               UNION SELECT sh FROM p JOIN w4 USING (doc))
        SELECT round, doc AS doc_id, gain,
               (SELECT count(*) FROM c1) AS covered_total FROM w1
        UNION ALL
        SELECT round, doc, gain,
               (SELECT count(*) FROM c2) FROM w2
        UNION ALL
        SELECT round, doc, gain,
               (SELECT count(*) FROM c3) FROM w3
        UNION ALL
        SELECT round, doc, gain,
               (SELECT count(*) FROM c4) FROM w4"""),
      (s, d) =>
        CorpusDiversity.maxCoverageSelect(
          t(s, d, "documents"), "doc_id", "text", k = 4)))
}
