package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{Retrieval, Similarity, SparseSim, TextOps}
import graft.core.Checkpoints.BarrierOps

/** Round-6 retrieval-fusion surface: sparse-vector similarity and
  * hybrid (lexical ⊕ dense) search — the two retrieval shapes a
  * training-data pipeline adds on top of plain BM25 (q87) and plain
  * ANN (q45): TF-IDF cosine pair mining for weighted near-dup
  * detection, and reciprocal-rank fusion for "more-like-this"
  * retrieval that is robust to either system's failure modes
  * (Cormack/Clarke/Buettcher RRF, SIGIR 2009).
  */
object RetrievalQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** DuckDB fragment: IEEE dot product via ordered list fold (the
    * LlmQueries convention — list_zip preserves element order). */
  private def dkDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"s -> CAST(s[1] AS DOUBLE)*CAST(s[2] AS DOUBLE)), (x,y) -> x+y)"

  private def dkCos(dot: String, na: String, nb: String): String =
    s"(CASE WHEN $na = 0 OR $nb = 0 THEN 0.0 " +
      s"ELSE $dot / (sqrt($na)*sqrt($nb)) END)"

  private val K1 = 1.2
  private val B = 0.75

  val defs: Seq[QueryDef] = Seq(

    // TF-IDF cosine near-dup pairs over the SHINGLE inverted index:
    // the WEIGHTED sibling of q41's set Jaccard — rare shared
    // trigrams dominate the score, corpus-hot shingles (df > 1000)
    // are excluded (no idf signal AND they are the quadratic join
    // keys; the cap serves both ends, mirrored in the oracle). All
    // double sums are shingle-ordered sequential folds. At the 0.3
    // gate this recovers exactly the planted near-dup pairs at
    // sf0.01 while candidate pairs stay df-cap bounded.
    QueryDef(
      "q162_sparse_cosine_pairs",
      Some("""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        sarr AS (SELECT doc_id,
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(range(1, len(toks)-1),
                               i -> array_to_string(toks[i:i+2], ' '))
                        ELSE []::VARCHAR[] END AS shs
                 FROM t),
        tok AS (SELECT doc_id, unnest(shs) AS term FROM sarr),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        nd AS (SELECT count(*) AS n_docs FROM documents),
        w AS (SELECT doc_id, term,
                CAST(tf.tf * nd.n_docs AS DOUBLE) / dfx.df AS w
              FROM tf JOIN dfx USING (term) CROSS JOIN nd
              WHERE dfx.df <= 1000),
        nrm AS (SELECT doc_id,
                  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list(w*w ORDER BY term)), (a, b) -> a + b)) AS nrm
                FROM w GROUP BY doc_id),
        num AS (SELECT a.doc_id AS da, b.doc_id AS db,
                  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                    list(a.w * b.w ORDER BY a.term)), (x, y) -> x + y)
                    AS num
                FROM w a JOIN w b
                  ON a.term = b.term AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
        SELECT num.da AS doc_a, num.db AS doc_b,
               num.num / (x.nrm * y.nrm) AS cos_sim
        FROM num JOIN nrm x ON x.doc_id = num.da
                 JOIN nrm y ON y.doc_id = num.db
        WHERE num.num / (x.nrm * y.nrm) >= 0.3"""),
      (s, d) =>
        SparseSim.tfidfCosinePairs(t(s, d, "documents"), "doc_id", "text",
          minCos = 0.3, maxDf = 1000)),

    // Hybrid retrieval with reciprocal-rank fusion: per query doc
    // (doc_id < 8, the q45 query set), fuse (a) BM25 over its top-3
    // tf-idf terms ("more-like-this" lexical probe, q57's selection)
    // with (b) exact dense cosine top-10 (q45), via
    // rrf = Σ 1/(60+rank). Ranks are ints, the two fractions are
    // added in fixed order, so fusion is engine-exact end to end.
    QueryDef(
      "q163_rrf_hybrid",
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
                     FROM documents),
        tf0 AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfx AS (SELECT term, count(*) AS df FROM tf0 GROUP BY 1),
        nd AS (SELECT count(*) AS n_docs FROM documents),
        qsc AS (SELECT doc_id, term,
                  CAST(tf0.tf * nd.n_docs AS DOUBLE) / dfx.df AS score
                FROM tf0 JOIN dfx USING (term) CROSS JOIN nd
                WHERE tf0.doc_id < 8),
        qt AS (SELECT doc_id AS query_id, term FROM (
                 SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, term) AS rk FROM qsc)
               WHERE rk <= 3),
        tl AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
        tok2 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
                        unnest(toks) AS term
                 FROM tl),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(CAST(sum(len(toks)) AS BIGINT) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE) AS avgdl
               FROM tl),
        m AS (SELECT tok2.* FROM tok2
              JOIN (SELECT DISTINCT term FROM qt) USING (term)),
        btf AS (SELECT doc_id, term, dl, CAST(count(*) AS BIGINT) AS tf
                FROM m GROUP BY 1, 2, 3),
        bdf AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                FROM m GROUP BY 1),
        sc AS (SELECT qt.query_id, btf.doc_id, btf.term,
                 (CAST(st.n_docs AS DOUBLE) - CAST(bdf.df AS DOUBLE)
                    + 0.5)
                 / (CAST(bdf.df AS DOUBLE) + 0.5)
                 * (CAST(btf.tf AS DOUBLE) * ${K1 + 1.0})
                 / (CAST(btf.tf AS DOUBLE) + ${K1} * (${1.0 - B}
                      + ${B} * CAST(btf.dl AS DOUBLE) / st.avgdl)) AS s
               FROM btf JOIN bdf USING (term) JOIN qt USING (term)
               CROSS JOIN st),
        g AS (SELECT query_id, doc_id,
                list_reduce(
                  list_prepend(CAST(0.0 AS DOUBLE),
                    list(s ORDER BY term)),
                  (a, b) -> a + b) AS score
              FROM sc GROUP BY 1, 2),
        sp AS (SELECT query_id, doc_id, rk FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS rk FROM g)
               WHERE rk <= 10),
        e AS (SELECT vec_id, embedding v,
                     ${dkDot("embedding", "embedding")} AS nn
              FROM embeddings),
        dsc AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                       ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")}
                         AS cos_sim
                FROM e q JOIN e c ON q.vec_id <> c.vec_id
                WHERE q.vec_id < 8),
        dn AS (SELECT query_id, cand_id, rk FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, cand_id) AS rk FROM dsc)
               WHERE rk <= 10),
        fused AS (SELECT coalesce(sp.query_id, dn.query_id) AS query_id,
                         coalesce(sp.doc_id, dn.cand_id) AS cand_id,
                         coalesce(CAST(1.0 AS DOUBLE)/(60 + sp.rk),
                           CAST(0.0 AS DOUBLE))
                         + coalesce(CAST(1.0 AS DOUBLE)/(60 + dn.rk),
                           CAST(0.0 AS DOUBLE)) AS rrf
                  FROM sp FULL OUTER JOIN dn
                    ON sp.query_id = dn.query_id
                   AND sp.doc_id = dn.cand_id)
        SELECT query_id, cand_id, rrf, rk FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY rrf DESC, cand_id) AS INT) AS rk
          FROM fused WHERE cand_id <> query_id)
        WHERE rk <= 5"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        // ONE corpus tokenization feeds everything lexical: the
        // (doc, term, dl, tf) table is checkpointed and then serves
        // (a) document frequencies, (b) the query-doc slice that
        // picks probe terms, and (c) the BM25 scoring via bm25FromTf
        // — the naive composition re-explodes the corpus once per
        // consumer, which at 100 TB is the whole job re-run thrice.
        val tf = docs
          .select(col("doc_id"),
            size(TextOps.tokens(col("text"))).cast("long").as("dl"),
            explode(TextOps.tokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
          .barrier()
        // df as ONE hash aggregation joined back to the 8-query
        // slice — the window-over-every-term form shuffles AND sorts
        // the whole vocabulary to annotate rows of which only the
        // query slice survives
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val scored = dfreq
          .join(broadcast(tf.filter(col("doc_id") < 8)), Seq("term"))
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"),
            ((col("tf") * col("n_docs")).cast("double") / col("df"))
              .as("score"))
        val wq = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        // 8 queries × 3 terms: checkpointed so the two probe-list
        // broadcasts inside the BM25 stage don't re-execute the
        // tf/df pipeline that produced it
        val qt = scored
          .select(col("doc_id").as("query_id"), col("term"),
            row_number().over(wq).as("rk"))
          .filter(col("rk") <= 3)
          .select(col("query_id"), col("term"))
          .barrier()
        val stats = docs.agg(
            count(lit(1)).as("n_docs"),
            sum(size(TextOps.tokens(col("text"))).cast("long"))
              .as("sum_dl"))
          .select(col("n_docs"),
            (col("sum_dl").cast("double") / col("n_docs").cast("double"))
              .as("avgdl"))
        val probe = tf.join(
          broadcast(qt.select(col("term")).distinct()), Seq("term"))
        val sparse = Retrieval.bm25FromTf(probe, stats, qt,
            "doc_id", "query_id", "term", k1 = K1, b = B, k = 10)
          .select(col("query_id"), col("doc_id").as("cand_id"),
            col("rk").as("rk_s"))
        val emb = t(s, d, "embeddings")
        val dense = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", 10)
          .select(col("query_id"), col("cand_id"), col("rk").as("rk_d"))
        val fused = sparse
          .join(dense, Seq("query_id", "cand_id"), "full_outer")
          .filter(col("cand_id") =!= col("query_id"))
          .select(col("query_id"), col("cand_id"),
            (coalesce(lit(1.0) / (col("rk_s") + lit(60)).cast("double"),
              lit(0.0)) +
              coalesce(lit(1.0) / (col("rk_d") + lit(60)).cast("double"),
                lit(0.0))).as("rrf"))
        val wf = Window.partitionBy(col("query_id"))
          .orderBy(col("rrf").desc, col("cand_id"))
        fused
          .select(col("query_id"), col("cand_id"), col("rrf"),
            row_number().over(wf).as("rk"))
          .filter(col("rk") <= 5)
      }),

    // kNN label-consistency audit (label-noise detection): for a
    // deterministic 4% probe sample (vec_id % 25 = 0), how many of
    // each probe's 5 nearest neighbors carry the SAME label? Per-label
    // integer sums only (matches are counted, never averaged as
    // floats), with one final exact-integer division — so the report
    // is engine-exact. Scale shape: the probe set is broadcast, the
    // corpus is streamed once (q45's bruteForceTopK contract); the
    // label joins are on the already-top-k rows (probes × 5).
    QueryDef(
      "q166_knn_label_consistency",
      Some(s"""
        WITH e AS (SELECT vec_id, label, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn
                   FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, q.label AS qlabel,
                 c.vec_id AS cand_id, c.label AS clabel,
                 ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")} AS cos_sim
          FROM e q JOIN e c ON q.vec_id <> c.vec_id
          WHERE q.vec_id % 25 = 0),
        knn AS (SELECT query_id, qlabel, clabel FROM (
                  SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, cand_id) AS rk FROM scored)
                WHERE rk <= 5),
        per_q AS (SELECT query_id, qlabel,
                         count(*) FILTER (WHERE clabel = qlabel)
                           AS n_same
                  FROM knn GROUP BY 1, 2)
        SELECT qlabel AS label,
               count(*) AS n_probes,
               CAST(sum(n_same) AS BIGINT) AS n_neighbors_same,
               CAST(sum(n_same) AS DOUBLE) / (5 * count(*))
                 AS consistency
        FROM per_q GROUP BY 1"""),
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val labels = emb.select(col("vec_id"), col("label"))
        val knn = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 25 === 0), emb,
          "vec_id", "embedding", 5)
        val perQ = knn
          .join(broadcast(labels.select(col("vec_id").as("query_id"),
            col("label").as("qlabel"))), Seq("query_id"))
          .join(broadcast(labels.select(col("vec_id").as("cand_id"),
            col("label").as("clabel"))), Seq("cand_id"))
          .groupBy(col("query_id"), col("qlabel"))
          .agg(sum(when(col("clabel") === col("qlabel"), 1L)
            .otherwise(0L)).as("n_same"))
        perQ.groupBy(col("qlabel").as("label"))
          .agg(count(lit(1)).as("n_probes"),
            sum(col("n_same")).as("n_neighbors_same"))
          .select(col("label"), col("n_probes"), col("n_neighbors_same"),
            (col("n_neighbors_same").cast("double") /
              (lit(5) * col("n_probes"))).as("consistency"))
      }),

    // Label-centroid margin (mislabeled-example mining): per probe,
    // cosine to its OWN label's centroid vs the best other-label
    // centroid; a negative margin flags a likely label error.
    // Centroids ride q63's kmeansUpdate with label-as-cell — per-dim
    // id-ordered folds, so the mean vectors are engine-exact; each
    // probe×label cosine folds over dims in order. Scale shape: the
    // centroid table is labels×dims rows (broadcast), probes stream.
    QueryDef(
      "q167_centroid_margin",
      Some(s"""
        WITH dims AS (SELECT vec_id, label,
                        CAST(embedding[i] AS DOUBLE) AS x,
                        CAST(i AS INT) AS dim
                      FROM embeddings,
                        unnest(range(1, len(embedding) + 1)) r(i)),
        cent AS (SELECT label AS clabel, dim,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list(x ORDER BY vec_id)), (a, b) -> a + b)
                   / count(*) AS mean_x
                 FROM dims GROUP BY 1, 2),
        pr AS (SELECT * FROM dims WHERE vec_id % 25 = 0),
        pc AS (SELECT pr.vec_id, pr.label, cent.clabel,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(pr.x * cent.mean_x ORDER BY pr.dim)),
                   (a, b) -> a + b) AS dot,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(pr.x * pr.x ORDER BY pr.dim)),
                   (a, b) -> a + b) AS nq,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(cent.mean_x * cent.mean_x ORDER BY pr.dim)),
                   (a, b) -> a + b) AS nc
               FROM pr JOIN cent ON pr.dim = cent.dim
               GROUP BY 1, 2, 3),
        cosd AS (SELECT vec_id, label, clabel,
                   CASE WHEN nq = 0 OR nc = 0 THEN 0.0
                        ELSE dot / (sqrt(nq)*sqrt(nc)) END AS cos_c
                 FROM pc),
        own AS (SELECT vec_id, label, cos_c AS cos_own FROM cosd
                WHERE clabel = label),
        oth AS (SELECT vec_id, clabel AS other_label,
                       cos_c AS cos_other FROM (
                  SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY cos_c DESC, clabel) AS rk
                  FROM cosd WHERE clabel <> label)
                WHERE rk = 1)
        SELECT own.vec_id, own.label, own.cos_own,
               oth.other_label, oth.cos_other,
               own.cos_own - oth.cos_other AS margin
        FROM own JOIN oth ON own.vec_id = oth.vec_id"""),
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val cent = Similarity.kmeansUpdate(
          emb.select(col("vec_id"), col("label").as("cell")),
          emb, "vec_id", "embedding")
          .select(col("cell").as("clabel"), col("dim"),
            col("mean_x"))
        val pr = emb.filter(col("vec_id") % 25 === 0)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("dim0", "x")))
          .select(col("vec_id"), col("label"),
            (col("dim0") + 1).as("dim"), col("x").cast("double").as("x"))
        val fold = (c: org.apache.spark.sql.Column) =>
          aggregate(transform(sort_array(c), v => v.getField("p")),
            lit(0.0), (acc, v) => acc + v)
        val pc = pr.join(broadcast(cent), Seq("dim"))
          .groupBy(col("vec_id"), col("label"), col("clabel"))
          .agg(
            fold(collect_list(struct(col("dim"),
              (col("x") * col("mean_x")).as("p")))).as("dot"),
            fold(collect_list(struct(col("dim"),
              (col("x") * col("x")).as("p")))).as("nq"),
            fold(collect_list(struct(col("dim"),
              (col("mean_x") * col("mean_x")).as("p")))).as("nc"))
        // cosd feeds TWO consumers (own-label row + best-other rank);
        // the lazy checkpoint stops Catalyst re-inlining the whole
        // probe×centroid fold pipeline into both (q141/bm25
        // precedent; probes×labels rows, trivially small)
        val cosd = pc.select(col("vec_id"), col("label"), col("clabel"),
          when(col("nq") === 0 || col("nc") === 0, lit(0.0))
            .otherwise(col("dot") / (sqrt(col("nq")) * sqrt(col("nc"))))
            .as("cos_c"))
          .barrier()
        val own = cosd.filter(col("clabel") === col("label"))
          .select(col("vec_id"), col("label"), col("cos_c").as("cos_own"))
        val wo = Window.partitionBy(col("vec_id"))
          .orderBy(col("cos_c").desc, col("clabel"))
        val oth = cosd.filter(col("clabel") =!= col("label"))
          .select(col("vec_id"), col("clabel"), col("cos_c"),
            row_number().over(wo).as("rk"))
          .filter(col("rk") === 1)
          .select(col("vec_id"), col("clabel").as("other_label"),
            col("cos_c").as("cos_other"))
        own.join(oth, Seq("vec_id"))
          .select(col("vec_id"), col("label"), col("cos_own"),
            col("other_label"), col("cos_other"),
            (col("cos_own") - col("cos_other")).as("margin"))
      }),

    // kNN confusion matrix: per probe, the majority label among its 5
    // nearest neighbors (ties broken toward the smaller label — total
    // order) vs its actual label, aggregated to (true, predicted)
    // counts — the label-quality report on top of q166's per-label
    // consistency. Same probe/stream shape as q166: integer votes,
    // deterministic rank, no floating aggregation at all.
    QueryDef(
      "q177_knn_confusion",
      Some(s"""
        WITH e AS (SELECT vec_id, label, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn
                   FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, q.label AS qlabel,
                 c.vec_id AS cand_id, c.label AS clabel,
                 ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")} AS cos_sim
          FROM e q JOIN e c ON q.vec_id <> c.vec_id
          WHERE q.vec_id % 25 = 0),
        knn AS (SELECT query_id, qlabel, clabel FROM (
                  SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, cand_id) AS rk FROM scored)
                WHERE rk <= 5),
        votes AS (SELECT query_id, qlabel, clabel, count(*) AS n
                  FROM knn GROUP BY 1, 2, 3),
        pred AS (SELECT query_id, qlabel, clabel AS plabel FROM (
                   SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY n DESC, clabel) AS rk FROM votes)
                 WHERE rk = 1)
        SELECT qlabel AS true_label, plabel AS pred_label,
               count(*) AS n_probes
        FROM pred GROUP BY 1, 2"""),
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val labels = emb.select(col("vec_id"), col("label"))
        val knn = Similarity.bruteForceTopK(
          emb.filter(col("vec_id") % 25 === 0), emb,
          "vec_id", "embedding", 5)
        val votes = knn
          .join(broadcast(labels.select(col("vec_id").as("query_id"),
            col("label").as("qlabel"))), Seq("query_id"))
          .join(broadcast(labels.select(col("vec_id").as("cand_id"),
            col("label").as("clabel"))), Seq("cand_id"))
          .groupBy(col("query_id"), col("qlabel"), col("clabel"))
          .agg(count(lit(1)).as("n"))
        val wv = Window.partitionBy(col("query_id"))
          .orderBy(col("n").desc, col("clabel"))
        votes
          .withColumn("rk", row_number().over(wv))
          .filter(col("rk") === 1)
          .groupBy(col("qlabel").as("true_label"),
            col("clabel").as("pred_label"))
          .agg(count(lit(1)).as("n_probes"))
      }),

    // Hard-negative triplet mining for contrastive training: rank 1 =
    // positive, ranks 6-8 = hard negatives, on the engine-wide
    // deterministic (cosine desc, id) order — byte-reproducible
    // training pairs where random sampling is not.
    QueryDef(
      "q190_hard_negatives",
      Some(s"""
        WITH e AS (SELECT vec_id, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn
                   FROM embeddings),
        sc AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                      ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")} AS cs
               FROM e q JOIN e c ON q.vec_id <> c.vec_id
               WHERE q.vec_id < 8),
        rk AS (SELECT query_id, cand_id, cs,
                      CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cs DESC, cand_id) AS INT) AS rk
               FROM sc),
        pos AS (SELECT query_id, cand_id AS pos_id, cs AS pos_cos
                FROM rk WHERE rk = 1),
        negs AS (SELECT query_id, cand_id AS neg_id, cs AS neg_cos,
                        rk AS neg_rank
                 FROM rk WHERE rk > 5 AND rk <= 8)
        SELECT p.query_id, p.pos_id, p.pos_cos,
               n.neg_id, n.neg_cos, n.neg_rank
        FROM pos p JOIN negs n USING (query_id)"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.hardNegativeTriplets(e.filter(col("vec_id") < 8), e,
          "vec_id", "embedding", kNeg = 3, skip = 5)
      }),

    // Rank-biased overlap (p = 1/2, depth 10, normalized) between the
    // full-dimension dense top-10 and the 8-dim-prefix top-10 — the
    // label-free "how much does dimension truncation change the
    // ranking" audit (q161 measures recall of a candidate SET; RBO
    // scores the ORDER, top-weighted). Dyadic p makes every depth
    // weight an integer after ×lcm(1..10)·2^11, so each common doc
    // contributes a suffix-summed integer on its max rank — summed
    // exactly, ONE final division by the identical-list maximum.
    QueryDef(
      "q216_rank_rbo",
      Some(s"""
        WITH e AS (SELECT vec_id, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn,
                          embedding[1:8] AS vp,
                          ${dkDot("embedding[1:8]", "embedding[1:8]")}
                            AS pn
                   FROM embeddings),
        sa AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                      ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")}
                        AS cs
               FROM e q JOIN e c ON q.vec_id <> c.vec_id
               WHERE q.vec_id < 32),
        ra AS (SELECT query_id, cand_id, rk FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cs DESC, cand_id) AS rk FROM sa)
               WHERE rk <= 10),
        sb AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                      ${dkCos(dkDot("q.vp", "c.vp"), "q.pn", "c.pn")}
                        AS cs
               FROM e q JOIN e c ON q.vec_id <> c.vec_id
               WHERE q.vec_id < 32),
        rb AS (SELECT query_id, cand_id, rk FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cs DESC, cand_id) AS rk FROM sb)
               WHERE rk <= 10),
        j AS (SELECT ra.query_id,
                     greatest(ra.rk, rb.rk) AS m
              FROM ra JOIN rb ON ra.query_id = rb.query_id
                             AND ra.cand_id = rb.cand_id),
        per AS (SELECT query_id, count(*) AS n_common,
                       CAST(sum(CASE m
                         WHEN 1 THEN 1788440 WHEN 2 THEN 498200
                         WHEN 3 THEN 175640 WHEN 4 THEN 68120
                         WHEN 5 THEN 27800 WHEN 6 THEN 11672
                         WHEN 7 THEN 4952 WHEN 8 THEN 2072
                         WHEN 9 THEN 812 ELSE 252 END) AS BIGINT)
                         AS s_scaled
                FROM j GROUP BY 1),
        qs AS (SELECT DISTINCT query_id FROM ra)
        SELECT qs.query_id,
               coalesce(per.n_common, 0) AS n_common,
               coalesce(per.s_scaled, 0) AS s_scaled,
               CAST(coalesce(per.s_scaled, 0) AS DOUBLE) / 2577960.0
                 AS rbo
        FROM qs LEFT JOIN per ON qs.query_id = per.query_id"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        val full = Similarity.bruteForceTopK(
          e.filter(col("vec_id") < 32), e, "vec_id", "embedding", 10)
        val sl = e.select(col("vec_id"),
          slice(col("embedding"), 1, 8).as("embedding"))
        val prefix = Similarity.bruteForceTopK(
          sl.filter(col("vec_id") < 32), sl, "vec_id", "embedding", 10)
        Retrieval.rbo10(full, prefix)
      }),

    // Background-similarity histogram from hash-bucket-sampled pairs:
    // the random-pair cosine distribution that calibrates the near-dup
    // threshold (q48's 0.95, q100's 0.3) against the corpus's own
    // geometry. Pair sampling is an EQUI-join on hash60(id)%16 —
    // expected n²/16 pairs, never a filtered cross join (which would
    // still evaluate all n² pairs); at 100 TB the bucket count scales
    // with n to hold the sample size.
    QueryDef(
      "q218_pair_geometry",
      Some(s"""
        WITH tg AS (SELECT vec_id AS id, embedding v,
                           ${dkDot("embedding", "embedding")} AS nn,
                           ('0x'||substr(md5(
                             CAST(vec_id AS VARCHAR)||':pb'),1,15))
                             ::BIGINT % 16 AS bk
                    FROM embeddings),
        pr AS (SELECT ${dkCos(dkDot("a.v", "b.v"), "a.nn", "b.nn")}
                        AS cos
               FROM tg a JOIN tg b ON a.bk = b.bk AND a.id < b.id),
        h AS (SELECT CAST(greatest(least(floor((cos + 1.0) * 5.0),
                         9), 0) AS BIGINT) AS bin,
                     count(*) AS n_pairs
              FROM pr GROUP BY 1),
        sp AS (SELECT unnest(range(0, 10)) AS bin)
        SELECT sp.bin,
               CAST(sp.bin AS DOUBLE) / 5.0 - 1.0 AS cos_lo,
               coalesce(h.n_pairs, 0) AS n_pairs
        FROM sp LEFT JOIN h ON sp.bin = h.bin"""),
      (s, d) =>
        Similarity.bucketPairHistogram(t(s, d, "embeddings"),
          "vec_id", "embedding", 16)),

    // Hubness profile: corpus vectors appearing in ≥2 of the query
    // sample's top-10 lists, with occurrence and rank-1 counts — the
    // high-dimensional pathology check (hub vectors poison ANN recall
    // and dedup clustering; a flat profile clears the index design).
    QueryDef(
      "q219_hubness",
      Some(s"""
        WITH e AS (SELECT vec_id, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn
                   FROM embeddings),
        sc AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                      ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")}
                        AS cs
               FROM e q JOIN e c ON q.vec_id <> c.vec_id
               WHERE q.vec_id < 256),
        rk AS (SELECT query_id, cand_id, rk FROM (
                 SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY cs DESC, cand_id) AS rk FROM sc)
               WHERE rk <= 10)
        SELECT cand_id, count(*) AS n_occ,
               count(*) FILTER (WHERE rk = 1) AS n_top1
        FROM rk GROUP BY 1 HAVING count(*) >= 2"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.hubnessProfile(e.filter(col("vec_id") < 256), e,
          "vec_id", "embedding", 10)
      }),

    // Paired sign test between two rankers, with an EXACT p-value:
    // per query, the rank of the first same-label candidate under the
    // full-dim vs the 8-dim-prefix ranker (missing-in-top-10 ⇒ 11);
    // wins counted over non-tied queries, and the one-sided binomial
    // tail P(X ≥ wins | m, ½) computed exactly — C(m,k) by the
    // integral sequential-product fold (acc·(m−k+i) div i stays an
    // integer at every step), summed, divided once by 2^m (dyadic ⇒
    // engine-exact). Significance testing as a first-class, oracled
    // operator — no normal approximation, no libm.
    QueryDef(
      "q228_paired_sign_test",
      Some(s"""
        WITH e AS (SELECT vec_id, label, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn,
                          embedding[1:8] AS vp,
                          ${dkDot("embedding[1:8]", "embedding[1:8]")}
                            AS pn
                   FROM embeddings),
        sa AS (SELECT q.vec_id AS query_id, q.label AS lq,
                      c.vec_id AS cand_id, c.label AS lc,
                      ${dkCos(dkDot("q.v", "c.v"), "q.nn", "c.nn")}
                        AS cs
               FROM e q JOIN e c ON q.vec_id <> c.vec_id
               WHERE q.vec_id < 32),
        ra AS (SELECT query_id,
                      min(rk) FILTER (WHERE lq = lc) AS fr
               FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cs DESC, cand_id) AS rk FROM sa)
               WHERE rk <= 10 GROUP BY 1),
        sb AS (SELECT q.vec_id AS query_id, q.label AS lq,
                      c.vec_id AS cand_id, c.label AS lc,
                      ${dkCos(dkDot("q.vp", "c.vp"), "q.pn", "c.pn")}
                        AS cs
               FROM e q JOIN e c ON q.vec_id <> c.vec_id
               WHERE q.vec_id < 32),
        rb AS (SELECT query_id,
                      min(rk) FILTER (WHERE lq = lc) AS fr
               FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cs DESC, cand_id) AS rk FROM sb)
               WHERE rk <= 10 GROUP BY 1),
        j AS (SELECT coalesce(ra.fr, 11) AS fa, coalesce(rb.fr, 11) AS fb
              FROM ra JOIN rb USING (query_id)),
        stat AS (SELECT CAST(count(*) AS BIGINT) AS n_queries,
                        count(*) FILTER (WHERE fa <> fb) AS m,
                        count(*) FILTER (WHERE fa < fb) AS wins_a,
                        count(*) FILTER (WHERE fb < fa) AS wins_b
                 FROM j),
        tail AS (SELECT n_queries, m, wins_a, wins_b,
                        CAST(sum(CASE WHEN k = 0 THEN 1 ELSE
                          list_reduce(
                            list_prepend(CAST(1 AS BIGINT),
                              range(1, k + 1)),
                            (acc, i) -> acc * (m - k + i) // i)
                          END) AS BIGINT) AS tail_sum
                 FROM (SELECT *, unnest(range(wins_a, m + 1)) AS k
                       FROM stat)
                 GROUP BY 1, 2, 3, 4)
        SELECT n_queries, m, wins_a, wins_b,
               CAST(tail_sum AS DOUBLE)
                 / CAST(CAST(1 AS BIGINT) << m AS DOUBLE) AS p_sign
        FROM tail"""),
      (s, d) => {
        // four consumers (queries+corpus under both rankers) — one
        // materialization of the vector table instead of four scans
        val e = t(s, d, "embeddings").barrier()
        val lab = e.select(col("vec_id"), col("label"))
        def firstRel(ranked: DataFrame): DataFrame =
          broadcast(broadcast(ranked)
              .join(lab.select(col("vec_id").as("query_id"),
                col("label").as("lq")), "query_id"))
            .join(lab.select(col("vec_id").as("cand_id"),
              col("label").as("lc")), "cand_id")
            .groupBy(col("query_id"))
            .agg(min(when(col("lq") === col("lc"), col("rk")))
              .as("fr"))
        val full = firstRel(Similarity.bruteForceTopK(
          e.filter(col("vec_id") < 32), e, "vec_id", "embedding", 10))
        val sl = e.select(col("vec_id"),
          slice(col("embedding"), 1, 8).as("embedding"))
        val prefix = firstRel(Similarity.bruteForceTopK(
          sl.filter(col("vec_id") < 32), sl, "vec_id", "embedding",
          10))
        val j = full.withColumnRenamed("fr", "fra")
          .join(broadcast(prefix.withColumnRenamed("fr", "frb")),
            Seq("query_id"))
          .select(coalesce(col("fra"), lit(11)).cast("long").as("fa"),
            coalesce(col("frb"), lit(11)).cast("long").as("fb"))
        // countIf is sum-based → NULL over an empty j; coalesce so the
        // zero-queries case still emits the oracle's (0, 0, 0, 1.0) row
        // instead of exploding a NULL sequence into nothing
        val stat = j.agg(
          count(lit(1)).as("n_queries"),
          coalesce(graft.ops.Aggregates.countIf(col("fa") =!= col("fb")),
            lit(0L)).as("m"),
          coalesce(graft.ops.Aggregates.countIf(col("fa") < col("fb")),
            lit(0L)).as("wins_a"),
          coalesce(graft.ops.Aggregates.countIf(col("fb") < col("fa")),
            lit(0L)).as("wins_b"))
        stat
          .select(col("n_queries"), col("m"), col("wins_a"),
            col("wins_b"),
            explode(sequence(col("wins_a"), col("m"))).as("k"))
          .withColumn("c",
            when(col("k") === 0, lit(1L)).otherwise(expr(
              "aggregate(sequence(1L, k), CAST(1 AS BIGINT), " +
                "(acc, i) -> acc * (m - k + i) div i)")))
          .groupBy(col("n_queries"), col("m"), col("wins_a"),
            col("wins_b"))
          .agg(sum(col("c")).cast("long").as("tail_sum"))
          .select(col("n_queries"), col("m"), col("wins_a"),
            col("wins_b"),
            (col("tail_sum").cast("double") /
              expr("shiftleft(CAST(1 AS BIGINT), CAST(m AS INT))")
                .cast("double")).as("p_sign"))
      }),

    // Margin-based bitext mining (Similarity.bitextMarginMine — the
    // Artetxe & Schwenk ratio criterion behind CCMatrix/LASER):
    // cross-side candidate pairs from shared 4-bit LSH cells, per-
    // vector k-NN cosine sums folded in rank order, ratio margin
    // cos / ((sumA+sumB)/2k) with a deterministic 0 pin on non-
    // positive denominators, then mutual-argmax + margin >= 1.2. The
    // two embedding "languages" are the label<5 / label>=5 halves.
    // Oracle replays cells, rank-ordered k-NN folds (list slice of an
    // ordered list agg), margin, and both argmax windows exactly.
    QueryDef(
      "q253_bitext_margin",
      Some {
        val bkt = (0 until 4).map { j =>
          val plane = s"list_transform(range(0,64), " +
            s"i -> CAST((${17 * (j + 1)}*(i+3)+7)%19 - 9 AS DOUBLE))"
          s"(CASE WHEN ${dkDot("v", plane)} > 0 THEN ${1L << j} " +
            "ELSE 0 END)"
        }.mkString("(", " + ", ")")
        s"""
        WITH e AS (SELECT vec_id, label, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn
                   FROM embeddings),
        eb AS (SELECT vec_id, label, v, nn, $bkt AS bucket FROM e),
        cand AS (SELECT a.vec_id id_a, b.vec_id id_b,
                        ${dkCos(dkDot("a.v", "b.v"), "a.nn", "b.nn")}
                          AS cos_sim
                 FROM eb a JOIN eb b ON a.bucket = b.bucket
                 WHERE a.label < 5 AND b.label >= 5),
        ka AS (SELECT id_a, list_reduce(list_prepend(0.0,
                 (list(cos_sim ORDER BY cos_sim DESC, id_b))[1:4]),
                 (x,y)->x+y) AS s_a
               FROM cand GROUP BY 1),
        kb AS (SELECT id_b, list_reduce(list_prepend(0.0,
                 (list(cos_sim ORDER BY cos_sim DESC, id_a))[1:4]),
                 (x,y)->x+y) AS s_b
               FROM cand GROUP BY 1),
        mg AS (SELECT id_a, id_b, cos_sim,
                 CASE WHEN (s_a + s_b) <= 0 THEN 0.0
                      ELSE cos_sim / ((s_a + s_b)
                                      / CAST(8 AS DOUBLE)) END
                   AS margin
               FROM cand JOIN ka USING(id_a) JOIN kb USING(id_b)),
        r AS (SELECT *,
                row_number() OVER (PARTITION BY id_a
                  ORDER BY margin DESC, id_b) rma,
                row_number() OVER (PARTITION BY id_b
                  ORDER BY margin DESC, id_a) rmb
              FROM mg)
        SELECT id_a, id_b, cos_sim, margin FROM r
        WHERE rma = 1 AND rmb = 1
          AND margin >= CAST(1.2 AS DOUBLE)"""
      },
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.bitextMarginMine(
          e.filter(col("label") < 5), e.filter(col("label") >= 5),
          "vec_id", "embedding", nBits = 4, dim = 64, k = 4,
          minMargin = 1.2)
      })
  )
}
