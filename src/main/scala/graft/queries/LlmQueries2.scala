package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{Similarity, TextOps}

/** Training-data pipeline operators, part 2: TF-IDF term ranking,
  * embedding quantization, stratified sampling, sequence packing.
  * Determinism rules as everywhere: integer arithmetic + single IEEE
  * divisions, no round(), no log() (libm log differs across engines in
  * the last ulp — the raw rational tf·N/df ranks identically). */
object LlmQueries2 {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** DuckDB CTE chain replaying [[graft.llmops.Tokenize]]: learned
    * vocab (top-256 words + chars of the top-1000), per-distinct-token
    * greedy longest-match via the substr equi-join + capture-free
    * integer fold, ending in `occ(doc_id, tok)` and
    * `enc(tok, tok_len, n_pieces, n_unk)`. Shared by q280 (per-doc
    * stats) and q283 (per-language fertility). */
  private val dkWordpiece: String = """
    occ0 AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
             FROM documents),
    occ AS (SELECT doc_id, tok FROM occ0
            WHERE len(tok) > 0 AND len(tok) <= 900),
    counts AS (SELECT tok, count(*) AS c FROM occ0
               WHERE len(tok) > 0 GROUP BY 1),
    rk AS (SELECT tok, c,
                  row_number() OVER (ORDER BY c DESC, tok) AS rk
           FROM counts),
    words AS (SELECT tok AS piece FROM rk
              WHERE rk <= 256 AND len(tok) <= 20),
    chars AS (SELECT DISTINCT t AS piece FROM
                (SELECT unnest(list_transform(range(1, len(tok)+1),
                          i -> tok[i:i])) AS t
                 FROM rk WHERE rk <= 1000)),
    voc AS (SELECT DISTINCT piece, len(piece) AS piece_len FROM
              (SELECT piece FROM words UNION SELECT piece FROM chars)),
    lens AS (SELECT DISTINCT piece_len FROM voc),
    toks AS (SELECT DISTINCT tok FROM occ),
    probes AS (SELECT t.tok, len(t.tok) AS tok_len,
                      CAST(r.p AS BIGINT) AS pos, l.piece_len,
                      t.tok[r.p:r.p+l.piece_len-1] AS sub
               FROM toks t, unnest(range(1, len(t.tok)+1)) r(p),
                    lens l
               WHERE r.p + l.piece_len - 1 <= len(t.tok)),
    best AS (SELECT pr.tok, pr.pos, max(pr.piece_len) AS bl
             FROM probes pr JOIN voc v ON pr.sub = v.piece
             GROUP BY 1, 2),
    posrows AS (SELECT t.tok, len(t.tok) AS tok_len,
                       CAST(r.p AS BIGINT) AS pos
                FROM toks t, unnest(range(1, len(t.tok)+1)) r(p)),
    blarr AS (SELECT pr.tok, pr.tok_len,
                     list(coalesce(b.bl, 0) ORDER BY pr.pos) AS bl
              FROM posrows pr
              LEFT JOIN best b ON b.tok = pr.tok AND b.pos = pr.pos
              GROUP BY 1, 2),
    fold AS (SELECT tok, tok_len,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(bl, x -> CAST(x AS BIGINT))),
                 (s, b) -> CASE WHEN s >= 1000000
                                THEN s - 1000000
                                WHEN b > 0
                                THEN s + (b-1)*1000000 + 1000
                                ELSE s + 1001 END) AS st
             FROM blarr),
    enc AS (SELECT tok, tok_len, (st % 1000000) // 1000 AS n_pieces,
                   st % 1000 AS n_unk
            FROM fold)"""

  val defs: Seq[QueryDef] = Seq(

    // TF-IDF-style top-3 terms per document. Score = tf * N / df as an
    // exact rational in double (log-free: same ranking, no libm
    // divergence). Ties broken by term text.
    QueryDef(
      "q57_text_tfidf",
      Some("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) term
                     FROM documents),
        tf AS (SELECT doc_id, term, count(*) tf FROM tok GROUP BY 1, 2),
        df AS (SELECT term, count(DISTINCT doc_id) df FROM tok GROUP BY 1),
        n AS (SELECT count(*) n_docs FROM documents),
        scored AS (
          SELECT doc_id, term,
                 CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
          FROM tf JOIN df USING (term) CROSS JOIN n)
        SELECT doc_id, term, score, rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS INT) AS rk FROM scored)
        WHERE rk <= 3"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val tok = docs.select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("term"))
        val tf = tok.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        // document frequency WITHOUT a second corpus explode or a term
        // join: tf rows are unique per (doc, term), so count(*) over
        // the term partition IS countDistinct(doc) — one window on the
        // already-aggregated (small) tf frame replaces re-exploding
        // 100 TB of tokens and shuffling them a second time. 3
        // exchanges total instead of 5; WindowExec spills on a
        // corpus-hot term instead of OOMing an agg buffer.
        val withDf = tf.withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("term"))))
        // corpus size as a one-row broadcast cross-join: keeps the whole
        // query a single DAG (no separate driver-side count() action and
        // no extra corpus scan) — same shape as the oracle's CROSS JOIN n
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = withDf
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"),
            ((col("tf") * col("n_docs")).cast("double") / col("df"))
              .as("score"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        scored.select(col("doc_id"), col("term"), col("score"),
          row_number().over(w).as("rk"))
          .filter(col("rk") <= 3)
      }),

    // Int8 quantization of embeddings (vector-store compression):
    // code_i = floor((x_i - min) * 255 / (max - min)); emit the
    // per-vector range and the code checksum. floor() is exact on the
    // bit-identical division result — CAST semantics differ (Spark
    // truncates, DuckDB rounds), floor does not.
    QueryDef(
      "q58_embed_quantize",
      Some("""
        WITH e AS (SELECT vec_id, embedding v,
                          list_min(list_transform(embedding,
                            x -> CAST(x AS DOUBLE))) lo,
                          list_max(list_transform(embedding,
                            x -> CAST(x AS DOUBLE))) hi
                   FROM embeddings)
        SELECT vec_id, lo, hi,
               CAST(list_sum(list_transform(v, x ->
                 floor((CAST(x AS DOUBLE) - lo) * 255.0 / (hi - lo))))
                 AS BIGINT) AS code_sum
        FROM e WHERE hi > lo"""),
      (s, d) => {
        val lo = array_min(transform(col("embedding"),
          x => x.cast("double")))
        val hi = array_max(transform(col("embedding"),
          x => x.cast("double")))
        t(s, d, "embeddings")
          .select(col("vec_id"), lo.as("lo"), hi.as("hi"),
            col("embedding"))
          .filter(col("hi") > col("lo")) // degenerate vectors: NaN codes
          .select(col("vec_id"), col("lo"), col("hi"),
            aggregate(
              transform(col("embedding"), x =>
                floor((x.cast("double") - col("lo")) * lit(255.0) /
                  (col("hi") - col("lo")))),
              lit(0.0), (acc, v) => acc + v).cast("long").as("code_sum"))
      }),

    // Deterministic stratified sampling: keep ~10% per language via the
    // content hash — reproducible on re-runs and across engines, unlike
    // rand()-based sampling.
    QueryDef(
      "q59_stratified_sample",
      Some(s"""
        WITH s AS (SELECT doc_id, lang,
                          ${"('0x'||substr(md5(CAST(doc_id AS VARCHAR)" +
          "),1,15))::BIGINT"} % 100 AS bucket
                   FROM documents)
        SELECT lang,
               count(*) AS n_total,
               count(*) FILTER (WHERE bucket < 10) AS n_sampled
        FROM s GROUP BY lang"""),
      (s, d) =>
        t(s, d, "documents")
          .select(col("lang"),
            (TextOps.hash60(col("doc_id").cast("string")) % 100)
              .as("bucket"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("bucket") < 10, 1L).otherwise(0L))
              .as("n_sampled"))),

    // Sequence packing: greedy token-budget bin assignment per language
    // — running token count ordered by doc_id, bin = floor(cumsum/2048)
    // (the batch-packing prep step of a training pipeline). Exact
    // integer window arithmetic.
    QueryDef(
      "q60_token_packing",
      Some("""
        WITH t AS (SELECT doc_id, lang,
                          CAST(len(string_split(text,' ')) AS BIGINT) nt
                   FROM documents),
        c AS (SELECT doc_id, lang, nt,
                     sum(nt) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM t)
        SELECT lang,
               CAST((cum - 1) // 2048 AS BIGINT) AS bin,
               count(*) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS bin_tokens
        FROM c GROUP BY 1, 2"""),
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            size(TextOps.tokens(col("text"))).cast("long").as("nt"))
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs
          .withColumn("cum", sum(col("nt")).over(w))
          .groupBy(col("lang"),
            floor((col("cum") - 1) / 2048).as("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("bin_tokens"))
      }),

    // IVF index training, assignment half of a Lloyd iteration:
    // nearest centroid by squared L2 (sequential-fold double — exact
    // cross-engine), centroids = the first 4 vectors, broadcast.
    QueryDef(
      "q62_ivf_kmeans_assign",
      Some("""
        WITH c AS (SELECT vec_id AS cell, embedding AS cvec
                   FROM embeddings WHERE vec_id < 4),
        s AS (SELECT e.vec_id, c.cell,
                list_reduce(list_transform(list_zip(e.embedding, c.cvec),
                  p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                     * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                  (x, y) -> x + y) AS d2
              FROM embeddings e CROSS JOIN c)
        SELECT vec_id, cell, d2 FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY d2, cell) AS rk FROM s)
        WHERE rk = 1"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.kmeansAssign(e, "vec_id", "embedding",
          e.filter(col("vec_id") < 4)
            .select(col("vec_id").as("cell"),
              col("embedding").as("cvec")),
          "cell", "cvec")
      }),

    // IVF index training, update half: per-(cell, dim) centroid means
    // with ID-ORDERED double summation — deterministic and
    // engine-reproducible where a plain avg over shuffled doubles is
    // not (the distributed-mean trap).
    QueryDef(
      "q63_ivf_kmeans_update",
      Some("""
        WITH c AS (SELECT vec_id AS cell, embedding AS cvec
                   FROM embeddings WHERE vec_id < 4),
        s AS (SELECT e.vec_id, c.cell,
                list_reduce(list_transform(list_zip(e.embedding, c.cvec),
                  p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                     * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                  (x, y) -> x + y) AS d2
              FROM embeddings e CROSS JOIN c),
        a AS (SELECT vec_id, cell FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY d2, cell) AS rk FROM s) WHERE rk = 1),
        x AS (SELECT a.vec_id, a.cell, CAST(i AS INT) AS dim,
                     CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS x
              FROM a JOIN embeddings e USING (vec_id)
              CROSS JOIN range(1, 65) r(i))
        SELECT cell, dim,
               list_reduce(list(x ORDER BY vec_id), (p, q) -> p + q)
                 / count(*) AS mean_x
        FROM x GROUP BY cell, dim"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        val assigned = Similarity.kmeansAssign(e, "vec_id", "embedding",
          e.filter(col("vec_id") < 4)
            .select(col("vec_id").as("cell"),
              col("embedding").as("cvec")),
          "cell", "cvec")
        Similarity.kmeansUpdate(assigned, e, "vec_id", "embedding")
      }),

    // Product quantization encode: 4 subspaces of 16 dims, codebook =
    // the first 4 vectors' subvectors (deterministic), code = nearest
    // codeword per subspace — the memory layer of an IVF-PQ index.
    QueryDef(
      "q64_embed_pq_encode",
      Some("""
        WITH cb AS (
          SELECT vec_id AS code, j AS subspace,
                 embedding[j*16+1 : j*16+16] AS cvec
          FROM embeddings CROSS JOIN range(0, 4) r(j)
          WHERE vec_id < 4),
        sv AS (
          SELECT vec_id, j AS subspace,
                 embedding[j*16+1 : j*16+16] AS sv
          FROM embeddings CROSS JOIN range(0, 4) r(j)),
        s AS (SELECT sv.vec_id, sv.subspace, cb.code,
                list_reduce(list_transform(list_zip(sv.sv, cb.cvec),
                  p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                     * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                  (x, y) -> x + y) AS err
              FROM sv JOIN cb USING (subspace))
        SELECT vec_id, subspace, code, err FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
            ORDER BY err, code) AS rk FROM s)
        WHERE rk = 1"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        val cb = e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("code"),
            posexplode(transform(sequence(lit(0), lit(3)),
              j => slice(col("embedding"), j * 16 + lit(1), lit(16))))
              .as(Seq("subspace", "cvec")))
        Similarity.pqEncode(e, "vec_id", "embedding", cb, m = 4,
          dim = 64)
      }),

    // PQ asymmetric-distance search: top-5 neighbors for 8 query
    // vectors computed entirely over PQ codes via a broadcast
    // query→codeword distance LUT — the IVF-PQ search path.
    QueryDef(
      "q66_embed_pq_search",
      Some("""
        WITH cb AS (
          SELECT vec_id AS code, j AS subspace,
                 embedding[j*16+1 : j*16+16] AS cvec
          FROM embeddings CROSS JOIN range(0, 4) r(j)
          WHERE vec_id < 4),
        sv AS (
          SELECT vec_id, j AS subspace,
                 embedding[j*16+1 : j*16+16] AS sv
          FROM embeddings CROSS JOIN range(0, 4) r(j)),
        enc AS (SELECT sv.vec_id, sv.subspace, cb.code,
                  list_reduce(list_transform(list_zip(sv.sv, cb.cvec),
                    p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                       * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                    (x, y) -> x + y) AS err
                FROM sv JOIN cb USING (subspace)),
        codes AS (SELECT vec_id, subspace, code FROM (
                    SELECT *, row_number() OVER (PARTITION BY vec_id,
                      subspace ORDER BY err, code) AS rk FROM enc)
                  WHERE rk = 1),
        lut AS (SELECT s.vec_id AS query_id, s.subspace, cb.code,
                  list_reduce(list_transform(list_zip(s.sv, cb.cvec),
                    p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                       * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                    (x, y) -> x + y) AS d2
                FROM sv s JOIN cb USING (subspace)
                WHERE s.vec_id < 8),
        scored AS (
          SELECT l.query_id, c.vec_id AS cand_id,
                 list_reduce(list(l.d2 ORDER BY l.subspace),
                   (x, y) -> x + y) AS approx_d2
          FROM codes c JOIN lut l
            ON c.subspace = l.subspace AND c.code = l.code
          WHERE c.vec_id <> l.query_id
          GROUP BY 1, 2)
        SELECT query_id, cand_id, approx_d2, rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY approx_d2, cand_id) AS INT) AS rk FROM scored)
        WHERE rk <= 5"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        val cb = e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("code"),
            posexplode(transform(sequence(lit(0), lit(3)),
              j => slice(col("embedding"), j * 16 + lit(1), lit(16))))
              .as(Seq("subspace", "cvec")))
        val codes = Similarity.pqEncode(e, "vec_id", "embedding", cb,
          m = 4, dim = 64).drop("err")
        Similarity.pqSearchADC(e.filter(col("vec_id") < 8), codes, cb,
          "vec_id", "embedding", m = 4, dim = 64, k = 5)
      }),

    // Context-window chunking: 32-token windows at stride 24, one row
    // per chunk with a content fingerprint — the sequence-prep step
    // between curation and training.
    QueryDef(
      "q67_text_chunking",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') toks
                   FROM documents),
        c AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                     toks[i*24+1 : i*24+32] AS c
              FROM t CROSS JOIN range(0, 100000) r(i)
              WHERE i <= (len(toks) - 1) // 24)
        SELECT doc_id, chunk_idx,
               CAST(len(c) AS INT) AS n_chunk_tokens,
               ('0x'||substr(md5(array_to_string(c, ' ')),1,15))::BIGINT
                 AS chunk_fp
        FROM c"""),
      (s, d) =>
        TextOps.chunkWindows(t(s, d, "documents"), "doc_id", "text",
          chunk = 32, overlap = 8)),

    // PII scrub counters: email/digit-run detection + redacted length
    // (the privacy pass), dialect-neutral regexes.
    QueryDef(
      "q68_text_pii_scrub",
      Some(s"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '${TextOps.EmailPattern}')) AS INT) AS n_emails,
               CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT)
                 AS n_numbers,
               CAST(length(regexp_replace(regexp_replace(text,
                 '${TextOps.EmailPattern}',
                 '<EMAIL>', 'g'), '[0-9]+', '<NUM>', 'g')) AS INT)
                 AS redacted_len
        FROM documents"""),
      (s, d) =>
        TextOps.piiScrub(t(s, d, "documents"), "doc_id", "text")),

    // Repetition quality rules: duplicated-token fraction and
    // top-bigram share (the Gopher-style repetition filters), per-row.
    QueryDef(
      "q69_text_repetition",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') toks
                   FROM documents),
        b AS (SELECT doc_id, len(toks) nt,
                     len(list_distinct(toks)) ndist,
                     CASE WHEN len(toks) >= 2
                          THEN list_transform(range(1, len(toks)),
                                 i -> array_to_string(toks[i:i+1], ' '))
                          ELSE []::VARCHAR[] END AS bigrams
              FROM t)
        SELECT doc_id,
               CAST(nt - ndist AS DOUBLE) / nt AS dup_token_frac,
               CASE WHEN len(bigrams) = 0 THEN 0.0
                    ELSE CAST(coalesce(list_max(list_transform(
                           list_distinct(bigrams),
                           x -> len(list_filter(bigrams, y -> y = x)))),
                           0) AS DOUBLE) / len(bigrams) END
                 AS top_bigram_frac
        FROM b"""),
      (s, d) =>
        TextOps.repetitionMetrics(t(s, d, "documents"), "doc_id", "text")),

    // Embedding centroid drift: each label's mean DIRECTION vs the
    // global mean direction, as an L2 distance — the embedding-space
    // drift monitor (a shifted source/model shows up here before any
    // downstream metric moves). Vectors are unit-normalized per row
    // first (IEEE ops on identical operands — deterministic), which
    // makes the statistic scale-invariant AND bounds every component
    // in [−1, 1], so the exact DECIMAL(38,9) per-dim sums can never
    // overflow — a raw-component centroid would blow the decimal
    // range on near-floatmax values (adversarial corpus, observed).
    // Zero-norm vectors carry no direction and are excluded (the
    // cosineWithNorms guard's aggregation-side twin). Per-dim sums
    // stay DECIMAL through BOTH aggregation levels (label and global
    // reuse the same partials — one corpus pass), each centroid
    // component is ONE IEEE division, and the 64-dim distance folds
    // sequentially over dim-sorted arrays (the dkDot parity
    // convention), never a float sum race.
    QueryDef(
      "q134_embed_drift",
      Some("""
        WITH v AS (SELECT label, embedding,
                          sqrt(list_reduce(list_transform(embedding,
                            x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)),
                            (a, b) -> a + b)) AS nrm
                   FROM embeddings),
        e AS (SELECT label, dim,
                     CAST(embedding[dim] AS DOUBLE) / nrm AS x
              FROM (SELECT label, embedding, nrm,
                      unnest(range(1, len(embedding)+1)) AS dim
                    FROM v WHERE nrm > 0)),
        pl AS (SELECT label, dim,
                      sum(CAST(x AS DECIMAL(38,9))) AS sdec,
                      count(*) AS n
               FROM e GROUP BY 1, 2),
        g AS (SELECT dim,
                     CAST(sum(sdec) AS DOUBLE)
                       / CAST(sum(n) AS DOUBLE) AS gc
              FROM pl GROUP BY 1),
        j AS (SELECT pl.label, pl.dim, pl.n,
                     CAST(pl.sdec AS DOUBLE) / CAST(pl.n AS DOUBLE)
                       AS c,
                     g.gc
              FROM pl JOIN g USING (dim)),
        arr AS (SELECT label, min(n) AS n_vecs,
                       list(c ORDER BY dim) AS ca,
                       list(gc ORDER BY dim) AS ga
                FROM j GROUP BY 1)
        SELECT label, n_vecs,
               sqrt(list_reduce(list_transform(list_zip(ca, ga),
                 s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))
                    * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))),
                 (x, y) -> x + y)) AS drift
        FROM arr"""),
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val e = t(s, d, "embeddings")
          .select(col("label"), col("embedding"),
            sqrt(Similarity.norm2(col("embedding"))).as("nrm"))
          .filter(col("nrm") > 0)
          .select(col("label"), col("nrm"),
            posexplode(col("embedding")).as(Seq("dim0", "xf")))
          .select(col("label"), (col("dim0") + 1).as("dim"),
            (col("xf").cast("double") / col("nrm")).as("x"))
        val pl = e.groupBy(col("label"), col("dim"))
          .agg(sum(col("x").cast(DecimalType(38, 9))).as("sdec"),
            count(lit(1)).as("n"))
        val g = pl.groupBy(col("dim"))
          .agg((sum(col("sdec")).cast("double") /
            sum(col("n")).cast("double")).as("gc"))
        val j = pl.join(broadcast(g), "dim")
          .select(col("label"), col("dim"), col("n"),
            (col("sdec").cast("double") / col("n").cast("double"))
              .as("c"), col("gc"))
        val arr = j.groupBy(col("label"))
          .agg(min(col("n")).as("n_vecs"),
            transform(sort_array(collect_list(
              struct(col("dim"), col("c")))), s => s("c")).as("ca"),
            transform(sort_array(collect_list(
              struct(col("dim"), col("gc")))), s => s("gc")).as("ga"))
        arr.select(col("label"), col("n_vecs"),
          sqrt(aggregate(
            zip_with(col("ca"), col("ga"),
              (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, v) => acc + v)).as("drift"))
      }),

    // BPE tokenizer training: the first 4 learned merges
    // (TextOps.learnBpeMerges scaladoc has the iteration shape). The
    // oracle re-derives the SAME greedy left-to-right merge pass as a
    // windowed gaps-and-islands construction (consecutive match runs,
    // odd positions applied) — an independent formulation of the merge
    // semantics whose hash must agree with the Spark fold.
    QueryDef(
      "q196_bpe_merges",
      Some(bpeOracleSql(4)),
      (s, d) =>
        graft.llmops.TextOps
          .learnBpeMerges(t(s, d, "documents"), "text", 4)
          .orderBy(col("merge_rank"))),

    // Tokenizer acceptance metric: apply the 4 learned merges back to
    // the corpus, report per-source symbol compression
    // (TextOps.bpeCompressionBySource — the encode runs on the
    // VOCABULARY, never a second corpus pass). The oracle reuses the
    // q196 CTE chain's final encoded vocab w5 and joins it to
    // per-(source, word) counts; exact integer sums, one double
    // division.
    QueryDef(
      "q197_bpe_compression",
      Some(s"""
        WITH ${bpeCtes(4)},
        ws AS (SELECT source, word, count(*) AS scnt
               FROM (SELECT source,
                            unnest(string_split(text, ' ')) AS word
                     FROM documents)
               WHERE word <> '' GROUP BY 1, 2)
        SELECT source,
               CAST(sum(scnt) AS BIGINT) AS n_words,
               CAST(sum(scnt * len(wid)) AS BIGINT) AS n_tokens_before,
               CAST(sum(scnt * len(toks)) AS BIGINT) AS n_tokens_after,
               CAST(sum(scnt * len(wid)) AS DOUBLE) /
                 CAST(sum(scnt * len(toks)) AS DOUBLE) AS compression
        FROM ws JOIN w5 ON ws.word = w5.wid
        GROUP BY 1 ORDER BY 1"""),
      (s, d) =>
        graft.llmops.TextOps
          .bpeCompressionBySource(t(s, d, "documents"), "text", "source", 4)
          .orderBy(col("source"))),

    // Tokenizer APPLICATION: greedy longest-match (WordPiece max-
    // munch) encode of every document against the corpus-learned
    // piece vocabulary (top-256 words + single chars of the top-1000
    // words; rarer chars fall to UNK). q196 learns merges, q197
    // scores them on the vocabulary — this is the per-document encode
    // pass, run RELATIONALLY: distinct tokens encode once (longest
    // match at a position = substr equi-join over piece lengths +
    // argmax; the greedy walk = one integer fold with BIGINT-packed
    // state), then the dimension joins back to occurrences. Integer-
    // only output. The 900-char token cap protects the state packing
    // and is mirrored here.
    QueryDef(
      "q280_wordpiece_stats",
      Some(s"""
        WITH $dkWordpiece
        SELECT o.doc_id, count(*) AS n_tokens,
               CAST(sum(e.tok_len) AS BIGINT) AS n_chars,
               CAST(sum(e.n_pieces) AS BIGINT) AS n_pieces,
               CAST(sum(e.n_unk) AS BIGINT) AS n_unk
        FROM occ o JOIN enc e USING (tok) GROUP BY 1"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.llmops.Tokenize.encodeStats(docs, "doc_id", "text",
          graft.llmops.Tokenize.vocab(docs, "text"))
      }),

    // Tokenizer fertility by language — the acceptance metric a
    // tokenizer choice is judged on: pieces per word and chars per
    // piece, per language (a vocab learned on a corpus dominated by
    // one language fragments the others; fertility is where that
    // shows). Same encode dimension as q280, re-aggregated by the
    // doc's language; integer sums + two IEEE divisions.
    QueryDef(
      "q283_wordpiece_fertility",
      Some(s"""
        WITH $dkWordpiece,
        lg AS (SELECT doc_id, lang FROM documents)
        SELECT lg.lang, count(DISTINCT o.doc_id) AS n_docs,
               count(*) AS n_tokens,
               CAST(sum(e.tok_len) AS BIGINT) AS n_chars,
               CAST(sum(e.n_pieces) AS BIGINT) AS n_pieces,
               CAST(sum(e.n_unk) AS BIGINT) AS n_unk,
               CAST(sum(e.n_pieces) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS fertility,
               CAST(sum(e.tok_len) AS DOUBLE)
                 / CAST(sum(e.n_pieces) AS DOUBLE) AS chars_per_piece
        FROM occ o JOIN enc e USING (tok)
        JOIN lg ON lg.doc_id = o.doc_id
        GROUP BY 1"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.llmops.Tokenize.fertilityByGroup(docs, "doc_id", "text",
          "lang", graft.llmops.Tokenize.vocab(docs, "text"))
      }),

    // TRUE BPE apply (q196 learns the merge table, this ENCODES with
    // it): per-doc piece counts under the merges applied in merge-
    // priority order — rank 1 first, each a greedy left-to-right
    // fold over the distinct-token dimension — so the apply stage
    // reproduces the training segmentation exactly, unlike q280's
    // max-munch (which consults only the piece SET and disagrees
    // wherever the vocab holds a piece the ladder can't build;
    // BpeSpec pins both laws). The oracle reuses the q196 CTE chain:
    // w5 IS the merge table replayed in rank order, so joining
    // occurrences to it is an independent DuckDB replay of the same
    // merge-priority encode.
    QueryDef(
      "q284_bpe_encode",
      Some(s"""
        WITH ${bpeCtes(4)},
        occ AS (SELECT doc_id, tok FROM (
                  SELECT doc_id,
                         unnest(string_split(text, ' ')) AS tok
                  FROM documents) WHERE tok <> '')
        SELECT o.doc_id, count(*) AS n_tokens,
               CAST(sum(len(e.wid)) AS BIGINT) AS n_chars,
               CAST(sum(len(e.toks)) AS BIGINT) AS n_pieces
        FROM occ o JOIN w5 e ON o.tok = e.wid GROUP BY 1"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.llmops.Tokenize.bpeEncodeStats(docs, "doc_id", "text",
          graft.llmops.TextOps.learnBpeMerges(docs, "text", 4))
      }),

    // Fertility under the TRUE-BPE encoder (q283 measures the
    // max-munch vocab; this measures the q196 merge table under the
    // algorithm that produced it — max-munch fertility of a BPE
    // vocab flatters whole-word pieces the merge ladder can't
    // build). Same oracle CTE chain, re-aggregated by language.
    QueryDef(
      "q287_bpe_fertility",
      Some(s"""
        WITH ${bpeCtes(4)},
        occ AS (SELECT doc_id, lang, tok FROM (
                  SELECT doc_id, lang,
                         unnest(string_split(text, ' ')) AS tok
                  FROM documents) WHERE tok <> '')
        SELECT o.lang, count(DISTINCT o.doc_id) AS n_docs,
               count(*) AS n_tokens,
               CAST(sum(len(e.wid)) AS BIGINT) AS n_chars,
               CAST(sum(len(e.toks)) AS BIGINT) AS n_pieces,
               CAST(sum(len(e.toks)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS fertility,
               CAST(sum(len(e.wid)) AS DOUBLE)
                 / CAST(sum(len(e.toks)) AS DOUBLE) AS chars_per_piece
        FROM occ o JOIN w5 e ON o.tok = e.wid GROUP BY 1"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        graft.llmops.Tokenize.bpeFertilityByGroup(docs, "doc_id",
          "text", "lang",
          graft.llmops.TextOps.learnBpeMerges(docs, "text", 4))
      }),

    // URL-keyed canonical dedup (TextOps.canonicalUrl) — the stage a
    // web pipeline runs BEFORE content dedup: strip scheme/fragment/
    // (www.)+/default ports/utm_* params, lowercase the host,
    // uppercase percent-escape hex, collapse duplicate path slashes,
    // sort query params, and collapse to one keeper per canonical
    // URL. The fixture tables carry no url column, so the query
    // derives a deterministic one from doc_id (the media-payload
    // precedent): groups of 3 docs share a canonical page, decorated
    // per-doc with scheme case, www., a fragment, tracking params, a
    // default port, doubled slashes + stacked www., or a
    // lowercase-hex escape — the oracle replays BOTH the derivation
    // and the full canonicalization chain. Output: per-canonical
    // collapse audit (one aggregation on a codegen'd scalar, no
    // joins).
    QueryDef(
      "q286_url_canonical_dedup",
      Some("""
        WITH u AS (SELECT doc_id,
                     'site' || CAST((doc_id // 3) % 7 AS VARCHAR)
                       || '.example.org' AS host,
                     '/doc/' || CAST(doc_id // 3 AS VARCHAR) AS path,
                     doc_id % 9 AS v
                   FROM documents),
        raw AS (SELECT doc_id,
                  CASE v WHEN 0 THEN 'http://' || host || path
                         WHEN 1 THEN 'https://' || host || path
                         WHEN 2 THEN 'HTTPS://WWW.' || upper(host)
                                || path
                         WHEN 3 THEN 'https://' || host || path
                                || '#sec'
                                || CAST(doc_id % 100 AS VARCHAR)
                         WHEN 4 THEN 'https://' || host || path
                                || '?utm_source=feed&b=2&a=1'
                         WHEN 5 THEN 'https://' || host || path
                                || '?a=1&b=2'
                         WHEN 6 THEN 'http://' || host || ':80'
                                || path
                         WHEN 7 THEN 'https://www.www.' || host
                                || replace(path, '/', '//')
                         ELSE 'https://' || host || path || '/x%2fy'
                  END AS url
                FROM u),
        n1 AS (SELECT doc_id, url,
                 regexp_replace(string_split(url, '#')[1],
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://', '') AS ns
               FROM raw),
        n2 AS (SELECT doc_id, url, ns,
                 CASE WHEN strpos(ns, '/') > 0
                       AND (strpos(ns, '?') = 0
                            OR strpos(ns, '/') < strpos(ns, '?'))
                      THEN strpos(ns, '/')
                      WHEN strpos(ns, '?') > 0 THEN strpos(ns, '?')
                      ELSE 0 END AS sp
               FROM n1),
        n3 AS (SELECT doc_id, url,
                 regexp_replace(regexp_replace(
                     lower(CASE WHEN sp > 0
                       THEN ns[1:sp-1] ELSE ns END),
                     '^(www\.)+', ''),
                   ':(80|443)$', '') AS host,
                 CASE WHEN sp > 0 THEN ns[sp:] ELSE '' END AS pq0
               FROM n2),
        n3b AS (SELECT doc_id, url, host,
                  array_to_string(list_prepend(
                    string_split(pq0, '%')[1],
                    list_transform(string_split(pq0, '%')[2:],
                      p -> CASE WHEN regexp_matches(p,
                                       '^[0-9a-fA-F]{2}')
                                THEN upper(p[1:2]) || p[3:]
                                ELSE p END)), '%') AS pathq
                FROM n3),
        n4 AS (SELECT doc_id, url, host,
                 CASE WHEN string_split(pathq, '?')[1] = '' THEN '/'
                      ELSE regexp_replace(
                             string_split(pathq, '?')[1],
                             '/{2,}', '/', 'g') END AS path,
                 CASE WHEN strpos(pathq, '?') > 0
                      THEN pathq[strpos(pathq, '?')+1:]
                      ELSE '' END AS q
               FROM n3b),
        n5 AS (SELECT doc_id, url, host, path,
                 array_to_string(list_sort(list_filter(
                   string_split(q, '&'),
                   p -> p <> '' AND NOT starts_with(p, 'utm_'))),
                   '&') AS sq
               FROM n4),
        c AS (SELECT doc_id, url,
                host || path || CASE WHEN len(sq) > 0 THEN '?' || sq
                                     ELSE '' END AS canonical_url
              FROM n5)
        SELECT canonical_url, count(*) AS n_docs,
               count(DISTINCT url) AS n_raw_urls,
               CAST(min(doc_id) AS BIGINT) AS keep_id
        FROM c GROUP BY 1"""),
      (s, d) => {
        val g = expr("doc_id div 3")
        val host = concat(lit("site"), (g % 7).cast("string"),
          lit(".example.org"))
        val path = concat(lit("/doc/"), g.cast("string"))
        val v = col("doc_id") % 9
        val url = when(v === 0, concat(lit("http://"), host, path))
          .when(v === 1, concat(lit("https://"), host, path))
          .when(v === 2, concat(lit("HTTPS://WWW."), upper(host), path))
          .when(v === 3, concat(lit("https://"), host, path,
            lit("#sec"), (col("doc_id") % 100).cast("string")))
          .when(v === 4, concat(lit("https://"), host, path,
            lit("?utm_source=feed&b=2&a=1")))
          .when(v === 5, concat(lit("https://"), host, path,
            lit("?a=1&b=2")))
          .when(v === 6, concat(lit("http://"), host, lit(":80"), path))
          .when(v === 7, concat(lit("https://www.www."), host,
            regexp_replace(path, "/", "//")))
          .otherwise(concat(lit("https://"), host, path, lit("/x%2fy")))
        graft.llmops.TextOps.urlCanonicalDedup(
          t(s, d, "documents").select(col("doc_id"), url.as("url")),
          "doc_id", "url")
      }),

    // Modality-diversity report — "is my mixture semantically
    // diverse?": per (k-means cell, label) cluster shares over the
    // q62 deterministic Lloyd assignments, fanned out to the FULL
    // cell × label grid (an absent label in a cell is a diversity
    // signal, share 0, not a missing row), against each label's
    // global share; dev = |share − global_share| is the summand of
    // the per-cell total-variation distance (q171's embedding-side
    // twin: q171 reads source mix drift over TOKENS, this reads it
    // over SEMANTIC cells). All shares are exact-integer-ratio IEEE
    // divisions. Scale shape: one assignment pass (broadcast
    // centroids), one (cell,label) count, then joins over the
    // bounded k × |labels| dimension grid — every post-agg frame is
    // metadata-sized.
    QueryDef(
      "q291_cluster_shares",
      Some("""
        WITH c AS (SELECT vec_id AS cell, embedding AS cvec
                   FROM embeddings WHERE vec_id < 4),
        s AS (SELECT e.vec_id, c.cell,
                list_reduce(list_transform(list_zip(e.embedding, c.cvec),
                  p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                     * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                  (x, y) -> x + y) AS d2
              FROM embeddings e CROSS JOIN c),
        a AS (SELECT vec_id, cell FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                  ORDER BY d2, cell) AS rk FROM s)
              WHERE rk = 1),
        cl AS (SELECT a.cell, e.label, count(*) AS n_vecs
               FROM a JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
        ct AS (SELECT cell, CAST(sum(n_vecs) AS BIGINT) AS cell_total
               FROM cl GROUP BY 1),
        lt AS (SELECT label, CAST(sum(n_vecs) AS BIGINT) AS label_total
               FROM cl GROUP BY 1),
        tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n_total FROM cl)
        SELECT ct.cell, lt.label,
               CAST(coalesce(cl.n_vecs, 0) AS BIGINT) AS n_vecs,
               ct.cell_total,
               CAST(coalesce(cl.n_vecs, 0) AS DOUBLE)
                 / CAST(ct.cell_total AS DOUBLE) AS share,
               CAST(lt.label_total AS DOUBLE)
                 / CAST(tot.n_total AS DOUBLE) AS global_share,
               abs(CAST(coalesce(cl.n_vecs, 0) AS DOUBLE)
                     / CAST(ct.cell_total AS DOUBLE)
                   - CAST(lt.label_total AS DOUBLE)
                     / CAST(tot.n_total AS DOUBLE)) AS dev
        FROM ct CROSS JOIN lt CROSS JOIN tot
        LEFT JOIN cl ON cl.cell = ct.cell AND cl.label = lt.label"""),
      (s, d) => {
        import graft.core.Checkpoints.BarrierOps
        val e = t(s, d, "embeddings")
        val assigned = Similarity.kmeansAssign(e, "vec_id",
          "embedding",
          e.filter(col("vec_id") < 4)
            .select(col("vec_id").as("cell"),
              col("embedding").as("cvec")),
          "cell", "cvec")
        val cl = assigned
          .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
          .groupBy(col("cell"), col("label"))
          .agg(count(lit(1)).as("n_vecs"))
          .barrier() // feeds ct, lt, tot AND the final grid join
        val ct = cl.groupBy(col("cell"))
          .agg(sum(col("n_vecs")).as("cell_total"))
        val lt = cl.groupBy(col("label"))
          .agg(sum(col("n_vecs")).as("label_total"))
        val tot = cl.agg(sum(col("n_vecs")).as("n_total"))
        val share = coalesce(col("n_vecs"), lit(0L)).cast("double") /
          col("cell_total").cast("double")
        val gshare = col("label_total").cast("double") /
          col("n_total").cast("double")
        ct.crossJoin(broadcast(lt)).crossJoin(broadcast(tot))
          .join(cl, Seq("cell", "label"), "left")
          .select(col("cell"), col("label"),
            coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
            col("cell_total"), share.as("share"),
            gshare.as("global_share"),
            abs(share - gshare).as("dev"))
      })
  )

  /** DuckDB BPE training oracle for `k` merges: per-iteration CTE
    * block = weighted adjacent-pair counts → argmax (count DESC, lhs,
    * rhs) → greedy merge via islands-of-matches with odd-position
    * application (provably the fold semantics: a run of overlapping
    * matches applies at offsets 0,2,4,…). */
  private def bpeOracleSql(k: Int): String = {
    val union = (1 to k)
      .map(r => s"SELECT $r AS merge_rank, lhs, rhs, c AS pair_count FROM b$r")
      .mkString("\n        UNION ALL ")
    s"""
      WITH ${bpeCtes(k)}
      SELECT merge_rank, lhs, rhs, pair_count FROM (
        $union)
      ORDER BY merge_rank"""
  }

  /** The shared BPE CTE chain: w1 (char-split vocab) through w{k+1}
    * (vocab after k merges), with b1..bk the chosen merges. */
  private def bpeCtes(k: Int): String = {
    val init = """
      w1 AS (
        SELECT word AS wid,
               list_transform(range(1, len(word) + 1),
                              i -> word[i:i]) AS toks,
               cnt
        FROM (SELECT word, count(*) AS cnt
              FROM (SELECT unnest(string_split(text, ' ')) AS word
                    FROM documents)
              WHERE word <> '' GROUP BY 1))"""
    val iters = (1 to k).map { r =>
      s"""
      pe$r AS (SELECT wid, cnt, unnest(range(1, len(toks))) AS i, toks
               FROM w$r),
      p$r AS (SELECT toks[i] AS lhs, toks[i + 1] AS rhs,
                     CAST(sum(cnt) AS BIGINT) AS c
              FROM pe$r GROUP BY 1, 2),
      b$r AS (SELECT lhs, rhs, c FROM p$r
              ORDER BY c DESC, lhs, rhs LIMIT 1),
      t$r AS (SELECT wid, cnt, unnest(range(1, len(toks) + 1)) AS i, toks
              FROM w$r),
      m$r AS (SELECT wid, cnt, i, toks[i] AS t,
                     CASE WHEN toks[i] = (SELECT lhs FROM b$r)
                           AND toks[i + 1] = (SELECT rhs FROM b$r)
                          THEN 1 ELSE 0 END AS ms
              FROM t$r),
      g$r AS (SELECT *, i - row_number()
                        OVER (PARTITION BY wid, ms ORDER BY i) AS grp
              FROM m$r),
      a$r AS (SELECT *, CASE WHEN ms = 1 AND row_number()
                          OVER (PARTITION BY wid, ms, grp ORDER BY i)
                          % 2 = 1
                        THEN 1 ELSE 0 END AS app
              FROM g$r),
      n$r AS (SELECT wid, cnt, i, app,
                     lag(app) OVER (PARTITION BY wid ORDER BY i)
                       AS prev_app,
                     CASE WHEN app = 1
                          THEN t || lead(t)
                                 OVER (PARTITION BY wid ORDER BY i)
                          ELSE t END AS nt
              FROM a$r),
      w${r + 1} AS (SELECT wid, list(nt ORDER BY i) AS toks,
                           any_value(cnt) AS cnt
                    FROM n$r WHERE COALESCE(prev_app, 0) = 0
                    GROUP BY wid)"""
    }.mkString(",")
    s"$init,$iters"
  }
}
