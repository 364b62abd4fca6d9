package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{DedupClusters, GraphRank, Sharding, Sketches, TextOps}
import graft.ops.Skew
import graft.core.Checkpoints.BarrierOps

/** Scale-pattern operators: duplicate-cluster resolution (the tail of
  * the dedup pipeline), salted two-stage aggregation for skew, and the
  * approximate-distinct variant used instead of exact countDistinct at
  * 100 TB. */
object ScaleQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** Jaccard ≥ 0.2 candidate pairs — q41's df-capped pipeline
    * (TextOps.ngramJaccardPairs), reused as the cluster input. */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame =
    TextOps.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
      minJac = 0.2, maxDf = 1000)
      .select(col("doc_a").as("da"), col("doc_b").as("db"))

  /** DuckDB: the same pair pipeline as q41 (incl. the df ≤ 1000
    * hot-shingle cap, so both engines agree at any scale), as CTE. */
  private val dkPairs =
    """t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
      |sarr AS (SELECT doc_id,
      |        CASE WHEN len(toks) >= 3
      |             THEN list_transform(range(1, len(toks)-1),
      |                    i -> array_to_string(toks[i:i+2], ' '))
      |             ELSE []::VARCHAR[] END AS shs
      |      FROM t),
      |sh AS (SELECT doc_id, len(shsd) AS nsh, unnest(shsd) AS sh
      |       FROM (SELECT doc_id, list_distinct(list_transform(shs,
      |               g -> ('0x'||substr(md5(g),1,15))::BIGINT)) shsd
      |             FROM sarr)),
      |kept AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 1000),
      |c AS (SELECT a.doc_id da, b.doc_id db, a.nsh na, b.nsh nb,
      |             count(*) common
      |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |      JOIN kept k ON a.sh = k.sh
      |      GROUP BY 1, 2, 3, 4),
      |p AS (SELECT da, db FROM c
      |      WHERE CAST(common AS DOUBLE)/(na+nb-common) >= 0.2)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Duplicate-cluster resolution: candidate pairs → connected
    // components (iterative min-label propagation; oracle = recursive
    // CTE transitive closure) → canonical keep-list.
    QueryDef(
      "q54_dedup_clusters",
      Some(s"""
        WITH RECURSIVE $dkPairs,
        edges AS (SELECT da s, db d FROM p UNION SELECT db, da FROM p),
        reach AS (
          SELECT s AS node, s AS r FROM edges
          UNION
          SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node),
        comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY 1)
        SELECT d.doc_id,
               coalesce(comp.cluster, d.doc_id) AS cluster,
               (comp.cluster IS NULL OR comp.cluster = d.doc_id) AS is_kept
        FROM documents d LEFT JOIN comp ON comp.node = d.doc_id"""),
      // maxIters is generous because the oracle computes EXACT
      // components (recursive CTE): the oracled path must never hit
      // the split-cluster non-convergence fallback. The convergence
      // probe exits the loop after the true diameter (+1 probe round),
      // so the generous bound costs nothing.
      (s, d) =>
        DedupClusters.keepList(
          t(s, d, "documents"), "doc_id",
          jaccardPairs(s, d), "da", "db", maxIters = 100)),

    // Leakage-safe split: q54's exact components, then the WHOLE
    // cluster assigned to train/val/test by hashing the CLUSTER label
    // with q102's bucket arithmetic — no near-dup pair can straddle
    // the split (the eval-contamination mode a per-doc hash split
    // structurally cannot prevent); singletons key on themselves, so
    // a dup-free corpus degrades to the per-doc split bit-for-bit.
    QueryDef(
      "q239_cluster_safe_split",
      Some(s"""
        WITH RECURSIVE $dkPairs,
        edges AS (SELECT da s, db d FROM p UNION SELECT db, da FROM p),
        reach AS (
          SELECT s AS node, s AS r FROM edges
          UNION
          SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node),
        comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY 1),
        kl AS (SELECT d.doc_id,
                      coalesce(comp.cluster, d.doc_id) AS cluster,
                      (comp.cluster IS NULL OR comp.cluster = d.doc_id)
                        AS is_kept
               FROM documents d LEFT JOIN comp ON comp.node = d.doc_id)
        SELECT doc_id, cluster, is_kept,
               CASE WHEN ('0x'||substr(md5(
                        CAST(cluster AS VARCHAR)||':split'),1,15))
                      ::BIGINT % 100 < 80 THEN 'train'
                    WHEN ('0x'||substr(md5(
                        CAST(cluster AS VARCHAR)||':split'),1,15))
                      ::BIGINT % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM kl"""),
      (s, d) =>
        DedupClusters.clusterSafeSplit(
          t(s, d, "documents"), "doc_id",
          jaccardPairs(s, d), "da", "db", trainPct = 80, valPct = 10,
          maxIters = 100)),

    // Approximate distinct (HLL) — what replaces exact countDistinct at
    // 100 TB (SURVEY §2.5). Engine-specific sketch → rows-only check
    // (no cross-engine oracle by construction).
    QueryDef(
      "q55_agg_approx_distinct",
      None,
      (s, d) =>
        t(s, d, "events")
          .groupBy(col("event_type"))
          .agg(
            approx_count_distinct(col("user_id"), rsd = 0.02)
              .as("approx_users"),
            count(lit(1)).as("n"))),

    // Salted two-stage aggregation: EXACTLY the plain groupBy result
    // (oracle is the unsalted SQL), resilient to one dominant key.
    QueryDef(
      "q56_salted_agg",
      Some("""
        SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_qty,
               count(*) AS n
        FROM lineitem GROUP BY 1"""),
      (s, d) => {
        val prepared = t(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_orderkey"),
            col("l_quantity").cast("decimal(18,4)").as("qty"))
        Skew.saltedSumCount(prepared, "l_returnflag", "qty",
            saltSource = col("l_orderkey"), buckets = 16)
          .select(col("l_returnflag"),
            col("sum_qty").cast("double").as("sum_qty"), col("n"))
      }),

    // The full curation pipeline as ONE DAG: near-dup dedup keep-list
    // (q41 pairs → q54 components) → quality gate (q50 score) →
    // deterministic stratified sample mark (q59 hash) → per-language
    // curation stats. The composition is what a training-data user
    // actually runs; every stage reuses the verified operator.
    QueryDef(
      "q65_curation_pipeline",
      Some(s"""
        WITH RECURSIVE $dkPairs,
        edges AS (SELECT da s, db d FROM p UNION SELECT db, da FROM p),
        reach AS (
          SELECT s AS node, s AS r FROM edges
          UNION
          SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node),
        comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY 1),
        keep AS (SELECT d.doc_id FROM documents d
                 LEFT JOIN comp ON comp.node = d.doc_id
                 WHERE comp.cluster IS NULL OR comp.cluster = d.doc_id),
        q AS (SELECT doc_id, lang,
                     CAST(len(string_split(text,' ')) AS BIGINT) nt,
                     CAST(length(replace(text,' ','')) AS BIGINT) nc,
                     CAST(len(list_filter(string_split(text,' '),
                       x -> list_contains(['the','a','of','and','to',
                         'in','is','it'], x))) AS BIGINT) he
              FROM documents),
        scored AS (SELECT doc_id, lang, nt,
                     CAST(800*he + 6*nt*least(nt,100) + 75*least(nc,8*nt)
                       AS DOUBLE) / (2000.0*CAST(nt AS DOUBLE)) AS score,
                     ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))
                       ::BIGINT % 100 AS bucket
                   FROM q)
        SELECT lang,
               count(*) AS n_curated,
               count(*) FILTER (WHERE bucket < 10) AS n_sampled,
               CAST(sum(nt) AS BIGINT) AS total_tokens
        FROM scored JOIN keep USING (doc_id)
        WHERE score >= 0.25
        GROUP BY lang"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val kept = DedupClusters
          .keepList(docs, "doc_id", jaccardPairs(s, d), "da", "db",
            maxIters = 100) // oracled: must reach the exact fixpoint
          .filter(col("is_kept"))
          .select(col("doc_id"))
        val scored = docs.select(
          (col("doc_id") +: col("lang") +:
            size(TextOps.tokens(col("text"))).cast("long").as("nt") +:
            TextOps.qualityColumns(col("text"))): _*)
          .select(col("doc_id"), col("lang"), col("nt"),
            col("quality_score").as("score"),
            (TextOps.hash60(col("doc_id").cast("string")) % 100)
              .as("bucket"))
        scored.join(kept, Seq("doc_id"))
          .filter(col("score") >= 0.25)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_curated"),
            sum(when(col("bucket") < 10, 1L).otherwise(0L))
              .as("n_sampled"),
            sum(col("nt")).as("total_tokens"))
      }),

    // Quality-aware dedup survivorship: per duplicate cluster keep the
    // HIGHEST-quality member (ties to lowest doc_id) — what a curation
    // pipeline actually ships, vs keepList's lowest-id rule. Oracle =
    // recursive-CTE transitive closure + the same rational quality
    // score + a rank — so the survivor choice, not just the clustering,
    // is cross-engine-verified. One rank window per cluster after the
    // components join (DedupClusters.keepListBy).
    QueryDef(
      "q140_dedup_survivors",
      Some(s"""
        WITH RECURSIVE $dkPairs,
        edges AS (SELECT da s, db d FROM p UNION SELECT db, da FROM p),
        reach AS (
          SELECT s AS node, s AS r FROM edges
          UNION
          SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node),
        comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY 1),
        q AS (SELECT doc_id,
                     CAST(len(string_split(text,' ')) AS BIGINT) nt,
                     CAST(length(replace(text,' ','')) AS BIGINT) nc,
                     CAST(len(list_filter(string_split(text,' '),
                       x -> list_contains(['the','a','of','and','to',
                         'in','is','it'], x))) AS BIGINT) he
              FROM documents),
        scored AS (SELECT doc_id,
                     CAST(800*he + 6*nt*least(nt,100) + 75*least(nc,8*nt)
                       AS DOUBLE) / (2000.0*CAST(nt AS DOUBLE)) AS prio
                   FROM q),
        lab AS (SELECT s.doc_id, s.prio,
                       coalesce(comp.cluster, s.doc_id) AS cluster
                FROM scored s LEFT JOIN comp ON comp.node = s.doc_id),
        r AS (SELECT doc_id, cluster,
                     row_number() OVER (PARTITION BY cluster
                       ORDER BY prio DESC, doc_id) AS rk
              FROM lab)
        SELECT doc_id, cluster, rk = 1 AS is_kept FROM r"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val scored = docs.select(
          (col("doc_id") +:
            TextOps.qualityColumns(col("text"))): _*)
          .select(col("doc_id"), col("quality_score").as("prio"))
        DedupClusters.keepListBy(scored, "doc_id", "prio",
          jaccardPairs(s, d), "da", "db", maxIters = 100)
      }),

    // Dedup-weighted effective corpus size: every doc weighs
    // 1/|its duplicate cluster|, so a thousand near-identical pages
    // count once — the honest "how much data do I really have" number
    // (raw token counts overstate exactly where dedup matters most).
    // Per-doc weights are single IEEE divisions; their sum goes
    // through the mirrored decimal cast, so the total is engine-exact.
    QueryDef(
      "q146_effective_tokens",
      Some(s"""
        WITH RECURSIVE $dkPairs,
        edges AS (SELECT da s, db d FROM p UNION SELECT db, da FROM p),
        reach AS (
          SELECT s AS node, s AS r FROM edges
          UNION
          SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node),
        comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY 1),
        lab AS (SELECT d.doc_id, d.lang,
                       CAST(len(string_split(d.text, ' ')) AS BIGINT)
                         AS nt,
                       coalesce(comp.cluster, d.doc_id) AS cluster
                FROM documents d
                LEFT JOIN comp ON comp.node = d.doc_id),
        sz AS (SELECT cluster, count(*) AS csize FROM lab GROUP BY 1)
        SELECT lang, count(*) AS n_docs,
               count(DISTINCT l.cluster) AS n_clusters,
               CAST(sum(nt) AS BIGINT) AS raw_tokens,
               CAST(sum(CAST(CAST(nt AS DOUBLE) / CAST(csize AS DOUBLE)
                 AS DECIMAL(18,9))) AS DOUBLE) AS effective_tokens
        FROM lab l JOIN sz USING (cluster)
        GROUP BY 1"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val nt = docs.select(col("doc_id"), col("lang"),
          size(TextOps.tokens(col("text"))).cast("long").as("nt"))
        val kl = DedupClusters.keepList(docs, "doc_id",
            jaccardPairs(s, d), "da", "db", maxIters = 100)
          .select(col("doc_id"), col("cluster"))
        val sz = kl.groupBy(col("cluster"))
          .agg(count(lit(1)).as("csize"))
        nt.join(kl, "doc_id").join(sz, "cluster")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("cluster")).as("n_clusters"),
            sum(col("nt")).as("raw_tokens"),
            sum((col("nt").cast("double") / col("csize").cast("double"))
              .cast(org.apache.spark.sql.types.DecimalType(18, 9)))
              .cast("double").as("effective_tokens"))
      }),

    // Duplicate-cluster size distribution: how many clusters of each
    // size, and how much doc mass sits in them — the canonical dedup
    // report (a corpus whose mass sits in large clusters shrinks a lot
    // under dedup; one dominated by singletons does not). Singletons
    // count via the keepList coalesce; two hash aggs over the
    // component labels.
    QueryDef(
      "q149_cluster_sizes",
      Some(s"""
        WITH RECURSIVE $dkPairs,
        edges AS (SELECT da s, db d FROM p UNION SELECT db, da FROM p),
        reach AS (
          SELECT s AS node, s AS r FROM edges
          UNION
          SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node),
        comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY 1),
        lab AS (SELECT d.doc_id,
                       coalesce(comp.cluster, d.doc_id) AS cluster
                FROM documents d
                LEFT JOIN comp ON comp.node = d.doc_id),
        sz AS (SELECT cluster, count(*) AS csize FROM lab GROUP BY 1)
        SELECT csize, count(*) AS n_clusters,
               CAST(csize * count(*) AS BIGINT) AS n_docs
        FROM sz GROUP BY 1"""),
      (s, d) => {
        val kl = DedupClusters.keepList(t(s, d, "documents"), "doc_id",
          jaccardPairs(s, d), "da", "db", maxIters = 100)
        kl.groupBy(col("cluster")).agg(count(lit(1)).as("csize"))
          .groupBy(col("csize"))
          .agg(count(lit(1)).as("n_clusters"))
          .select(col("csize"), col("n_clusters"),
            (col("csize") * col("n_clusters")).as("n_docs"))
      }),

    // Heavy-hitter key diagnostic: top-20 l_suppkey values by row
    // count with exact share-of-total — the pre-flight skew probe for
    // any shuffle on that key (q56's salting is the cure; this is the
    // diagnosis). Total arrives as a one-row broadcast, never a
    // driver-side count(); the rank window runs after the top-20 cut.
    QueryDef(
      "q120_heavy_hitters",
      Some("""
        WITH g AS (SELECT l_suppkey, count(*) AS cnt
                   FROM lineitem GROUP BY 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM g),
        top AS (SELECT l_suppkey, cnt,
                       CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)
                         AS share
                FROM g, tot
                ORDER BY cnt DESC, l_suppkey LIMIT 20)
        SELECT l_suppkey, cnt, share,
               CAST(row_number() OVER (ORDER BY cnt DESC, l_suppkey)
                 AS BIGINT) AS rank
        FROM top"""),
      (s, d) => Skew.heavyHitters(t(s, d, "lineitem"), "l_suppkey", 20)),

    // Count-min sketch term frequencies, probed at the exact top-30
    // terms. md5-derived bucket hashes make the whole sketch
    // engine-reproducible, so unlike q55/q153 the ESTIMATE is
    // hash-oracled cross-engine, and the `dominates` column pins the
    // no-undercount guarantee in the gate itself. Build aggregates
    // into a 4x256-cell domain → map-side collapse; the exchange
    // carries <= 1024 rows per mapper partition however large the
    // corpus or vocabulary (the scale substitute for q120's exact
    // vocabulary shuffle).
    QueryDef(
      "q155_countmin_freq",
      Some("""
        WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
                     FROM documents),
        hb AS (SELECT term, CAST(i AS INT) AS hrow,
                      ('0x'||substr(md5(CAST(i AS VARCHAR)||':'||term),
                        1, 15))::BIGINT % 256 AS bucket
               FROM tok, range(4) r(i)),
        sk AS (SELECT hrow, bucket, count(*) AS cnt
               FROM hb GROUP BY 1, 2),
        ex AS (SELECT term, count(*) AS exact_n FROM tok GROUP BY 1),
        top AS (SELECT term, exact_n FROM ex
                ORDER BY exact_n DESC, term LIMIT 30),
        pb AS (SELECT t.term, t.exact_n, CAST(i AS INT) AS hrow,
                      ('0x'||substr(md5(CAST(i AS VARCHAR)||':'||t.term),
                        1, 15))::BIGINT % 256 AS bucket
               FROM top t, range(4) r(i))
        SELECT pb.term, pb.exact_n, min(sk.cnt) AS cms_n,
               min(sk.cnt) >= pb.exact_n AS dominates
        FROM pb JOIN sk USING (hrow, bucket)
        GROUP BY pb.term, pb.exact_n"""),
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("term"))
        val sketch = Sketches.countMinBuild(toks, "term", d = 4, w = 256)
        val top = toks.groupBy(col("term"))
          .agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("term")).limit(30)
        Sketches.countMinEstimate(top, "term", sketch, d = 4, w = 256)
          .withColumn("dominates", col("cms_n") >= col("exact_n"))
      }),

    // Cross-source duplication matrix: which source PAIRS share
    // near-duplicates, and how many docs are implicated — the report
    // that decides which feed to drop when two crawls overlap. Rides
    // the q41 df-capped pair pipeline; sources attach by joining the
    // (bounded-by-contract) pair set to the corpus, never the corpus
    // to itself. Pair sources normalize to (least, greatest) so the
    // matrix is upper-triangular regardless of pair orientation.
    QueryDef(
      "q157_cross_source_dups",
      Some(s"""
        WITH $dkPairs,
        ps AS (SELECT p.da, p.db,
                      least(a.source, b.source) AS src_a,
                      greatest(a.source, b.source) AS src_b
               FROM p JOIN documents a ON a.doc_id = p.da
                      JOIN documents b ON b.doc_id = p.db),
        np AS (SELECT src_a, src_b, count(*) AS n_pairs
               FROM ps GROUP BY 1, 2),
        dd AS (SELECT src_a, src_b, count(DISTINCT d) AS n_dup_docs
               FROM (SELECT src_a, src_b, da AS d FROM ps
                     UNION ALL SELECT src_a, src_b, db FROM ps)
               GROUP BY 1, 2)
        SELECT np.src_a, np.src_b, np.n_pairs, dd.n_dup_docs
        FROM np JOIN dd USING (src_a, src_b)"""),
      (s, d) => {
        val src = t(s, d, "documents").select(col("doc_id"), col("source"))
        val ps = jaccardPairs(s, d)
          .join(src.select(col("doc_id").as("da"),
            col("source").as("sa")), Seq("da"))
          .join(src.select(col("doc_id").as("db"),
            col("source").as("sb")), Seq("db"))
          .select(col("da"), col("db"),
            least(col("sa"), col("sb")).as("src_a"),
            greatest(col("sa"), col("sb")).as("src_b"))
          .barrier() // feeds both aggregates below
        val np = ps.groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("n_pairs"))
        val dd = ps.select(col("src_a"), col("src_b"), col("da").as("d"))
          .unionByName(ps.select(col("src_a"), col("src_b"),
            col("db").as("d")))
          .groupBy(col("src_a"), col("src_b"))
          .agg(countDistinct(col("d")).as("n_dup_docs"))
        np.join(dd, Seq("src_a", "src_b"))
      }),

    // Quality-gate survival curve: docs and token mass surviving each
    // score threshold (0.00, 0.05, ..., 0.95) — the decision table
    // behind choosing q65's 0.25 gate. Per-doc scoring is the q50/q65
    // formula (IEEE on identical operands); bucketing floors
    // score*20, and the cumulative-from-top runs over <= 20
    // aggregated rows (bounded value domain — the structurally-safe
    // global window class the plan audit admits).
    QueryDef(
      "q158_quality_survival",
      Some("""
        WITH q AS (SELECT doc_id,
                     CAST(len(string_split(text,' ')) AS BIGINT) nt,
                     CAST(length(replace(text,' ','')) AS BIGINT) nc,
                     CAST(len(list_filter(string_split(text,' '),
                       x -> list_contains(['the','a','of','and','to',
                         'in','is','it'], x))) AS BIGINT) he
                   FROM documents),
        scored AS (SELECT doc_id, nt,
                     CAST(800*he + 6*nt*least(nt,100) + 75*least(nc,8*nt)
                       AS DOUBLE) / (2000.0*CAST(nt AS DOUBLE)) AS score
                   FROM q),
        b AS (SELECT least(CAST(floor(score*20) AS INT), 19) AS bucket,
                     count(*) AS n, CAST(sum(nt) AS BIGINT) AS tok
              FROM scored GROUP BY 1)
        SELECT bucket, CAST(bucket AS DOUBLE)/20.0 AS threshold,
               CAST(sum(n) OVER (ORDER BY bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_docs_surviving,
               CAST(sum(tok) OVER (ORDER BY bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS tokens_surviving
        FROM b"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val scored = t(s, d, "documents")
          .select(col("doc_id") +:
            size(TextOps.tokens(col("text"))).cast("long").as("nt") +:
            TextOps.qualityColumns(col("text")): _*)
        val b = scored
          .select(least(floor(col("quality_score") * 20).cast("int"),
            lit(19)).as("bucket"), col("nt"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), sum(col("nt")).as("tok"))
        val w = Window.orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        b.select(col("bucket"),
          (col("bucket").cast("double") / 20.0).as("threshold"),
          sum(col("n")).over(w).as("n_docs_surviving"),
          sum(col("tok")).over(w).as("tokens_surviving"))
      }),

    // Longest common token run per near-dup pair: the substring-level
    // dedup diagnostic ("dedupe exact spans, not whole docs" — the
    // 50-token-granularity idea). Equal-shingle matches on the same
    // diagonal (pa-pb) form islands via grp = pa - row_number; the
    // longest island + (n-1) is the shared span in tokens. Bounded by
    // the q41 candidate-pair contract end to end.
    QueryDef(
      "q159_pair_lcs",
      Some(s"""
        WITH $dkPairs,
        pos AS (SELECT doc_id, CAST(i AS BIGINT) AS pp,
                       ('0x'||substr(md5(array_to_string(toks[i:i+2],' ')),
                         1, 15))::BIGINT AS sh
                FROM t, unnest(range(1, len(toks)-1)) r(i)
                WHERE len(toks) >= 3),
        m AS (SELECT pr.da, pr.db, a.pp AS pa, b.pp AS pb
              FROM p pr JOIN pos a ON a.doc_id = pr.da
                        JOIN pos b ON b.doc_id = pr.db AND a.sh = b.sh),
        i AS (SELECT da, db, pa - pb AS diag, pa,
                     pa - row_number() OVER (PARTITION BY da, db, pa - pb
                       ORDER BY pa) AS grp
              FROM m),
        r AS (SELECT da, db, count(*) AS run
              FROM i GROUP BY da, db, diag, grp)
        SELECT da AS doc_a, db AS doc_b,
               CAST(max(run) + 2 AS BIGINT) AS lcs_tokens
        FROM r GROUP BY 1, 2"""),
      (s, d) =>
        TextOps.longestCommonRun(t(s, d, "documents"), "doc_id", "text",
          jaccardPairs(s, d), "da", "db")),

    // PageRank (3 fixed iterations, d = 0.85) over the near-dup pair
    // graph: ranks cluster HUBS — the doc most connected to the rest
    // of its duplicate cluster, a principled keep-policy for dense
    // star-shaped clusters. One join + one fold-aggregation per
    // iteration (GraphRank scaladoc for the 100 TB budget); every
    // double sum is a src-ordered sequential fold, every scalar op
    // IEEE-exact, so three unrolled CTE layers reproduce Spark's
    // ranks bit-for-bit.
    QueryDef(
      "q164_pair_pagerank",
      Some(s"""
        WITH $dkPairs,
        e AS (SELECT da AS s, db AS t FROM p
              UNION ALL SELECT db, da FROM p),
        deg AS (SELECT s, count(*) AS deg FROM e GROUP BY 1),
        nn AS (SELECT count(DISTINCT s) AS n FROM e),
        r0 AS (SELECT DISTINCT s AS v,
                      CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS pr
               FROM e CROSS JOIN nn),
        r1 AS (SELECT e.t AS v,
                 CAST(${1.0 - 0.85} AS DOUBLE) / CAST(nn.n AS DOUBLE)
                 + CAST(0.85 AS DOUBLE) * list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE),
                       list(r0.pr / CAST(deg.deg AS DOUBLE)
                            ORDER BY e.s)), (a, b) -> a + b) AS pr
               FROM e JOIN deg USING (s) JOIN r0 ON r0.v = e.s
               CROSS JOIN nn
               GROUP BY e.t, nn.n),
        r2 AS (SELECT e.t AS v,
                 CAST(${1.0 - 0.85} AS DOUBLE) / CAST(nn.n AS DOUBLE)
                 + CAST(0.85 AS DOUBLE) * list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE),
                       list(r1.pr / CAST(deg.deg AS DOUBLE)
                            ORDER BY e.s)), (a, b) -> a + b) AS pr
               FROM e JOIN deg USING (s) JOIN r1 ON r1.v = e.s
               CROSS JOIN nn
               GROUP BY e.t, nn.n),
        r3 AS (SELECT e.t AS v,
                 CAST(${1.0 - 0.85} AS DOUBLE) / CAST(nn.n AS DOUBLE)
                 + CAST(0.85 AS DOUBLE) * list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE),
                       list(r2.pr / CAST(deg.deg AS DOUBLE)
                            ORDER BY e.s)), (a, b) -> a + b) AS pr
               FROM e JOIN deg USING (s) JOIN r2 ON r2.v = e.s
               CROSS JOIN nn
               GROUP BY e.t, nn.n)
        SELECT v AS node, pr AS pagerank FROM r3"""),
      (s, d) =>
        GraphRank.pageRank(jaccardPairs(s, d), "da", "db",
          iters = 3, damping = 0.85)),

    // KMV (k-minimum-values) source-overlap sketch: the sketch-scale
    // sibling of q141's exact source-pair overlap (the q153↔q72
    // pattern). Per source keep only the 256 smallest distinct shingle
    // hashes; a pair's Jaccard estimate is the both-sources fraction
    // among the k smallest of the sketch UNION (Bar-Yossef et al.
    // 2002). Corpus-wide work is ONE distinct + one per-source top-k
    // window; the pair stage touches ≤ 2k rows per source pair —
    // #sources² × k, never corpus². Everything is integer/set
    // arithmetic plus one final exact division, so the estimate is
    // engine-exact (unlike HLL, a KMV sketch has no engine-specific
    // representation).
    QueryDef(
      "q168_kmv_source_jaccard",
      Some(s"""
        WITH t AS (SELECT source, string_split(text,' ') toks
                   FROM documents),
        sarr AS (SELECT source,
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(range(1, len(toks)-1),
                               i -> array_to_string(toks[i:i+2], ' '))
                        ELSE []::VARCHAR[] END AS shsx
                 FROM t),
        shs AS (SELECT DISTINCT source, h FROM (
                  SELECT source, unnest(list_transform(shsx,
                    g -> ('0x'||substr(md5(g),1,15))::BIGINT)) AS h
                  FROM sarr)),
        kmv AS (SELECT source, h FROM (
                  SELECT source, h, row_number() OVER (
                    PARTITION BY source ORDER BY h) AS rk FROM shs)
                WHERE rk <= 256),
        ps AS (SELECT a.source sa, b.source sb
               FROM (SELECT DISTINCT source FROM kmv) a
               JOIN (SELECT DISTINCT source FROM kmv) b
                 ON a.source < b.source),
        m AS (SELECT ps.sa, ps.sb, k.h,
                     max(CASE WHEN k.source = ps.sa THEN 1 ELSE 0 END)
                       AS in_a,
                     max(CASE WHEN k.source = ps.sb THEN 1 ELSE 0 END)
                       AS in_b
              FROM ps JOIN kmv k
                ON k.source = ps.sa OR k.source = ps.sb
              GROUP BY 1, 2, 3),
        r AS (SELECT sa, sb, in_a, in_b, row_number() OVER (
                PARTITION BY sa, sb ORDER BY h) AS rk FROM m)
        SELECT sa AS src_a, sb AS src_b,
               CAST(count(*) AS BIGINT) AS k_used,
               CAST(count(*) FILTER (in_a = 1 AND in_b = 1) AS BIGINT)
                 AS n_both,
               CAST(count(*) FILTER (in_a = 1 AND in_b = 1) AS DOUBLE)
                 / count(*) AS est_jaccard
        FROM r WHERE rk <= 256 GROUP BY 1, 2"""),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val k = 256
        val sh = t(s, d, "documents")
          .select(col("source"), explode(TextOps.shingleHashes(col("text")))
            .as("h"))
          .distinct()
        // the sketch feeds THREE consumers (source list + both pair
        // sides); the lazy checkpoint keeps the corpus-wide distinct
        // + per-source top-k from being recomputed per consumer
        // (sources×k rows — nothing to store)
        val kmv = sh
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("source")).orderBy(col("h"))))
          .filter(col("rk") <= k)
          .select(col("source"), col("h"))
          .barrier()
        val srcs = kmv.select(col("source")).distinct()
        val ps = srcs.select(col("source").as("sa"))
          .join(srcs.select(col("source").as("sb")),
            col("sa") < col("sb"))
        val ra = ps.join(kmv, col("source") === col("sa"))
          .select(col("sa"), col("sb"), col("h"),
            lit(1).as("in_a"), lit(0).as("in_b"))
        val rb = ps.join(kmv, col("source") === col("sb"))
          .select(col("sa"), col("sb"), col("h"),
            lit(0).as("in_a"), lit(1).as("in_b"))
        val merged = ra.unionByName(rb)
          .groupBy(col("sa"), col("sb"), col("h"))
          .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
        val ranked = merged.withColumn("rk", row_number().over(
          Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
          .filter(col("rk") <= k)
        val isBoth = when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)
        ranked.groupBy(col("sa").as("src_a"), col("sb").as("src_b"))
          .agg(count(lit(1)).as("k_used"), sum(isBoth).as("n_both"))
          .select(col("src_a"), col("src_b"), col("k_used"),
            col("n_both"),
            (col("n_both").cast("double") / col("k_used"))
              .as("est_jaccard"))
      }),

    // KMV distinct-count estimate per source vs the exact count — the
    // ORACLED approximate-distinct (q55's HLL is rows-only because
    // its sketch is engine-private; a KMV over md5-derived hashes is
    // bit-reproducible anywhere): k=64 smallest distinct shingle
    // hashes per source, estimate (k-1)*2^60/h_k, exact below k. The
    // shingle relation feeds the exact count AND the sketch, so it is
    // checkpointed once.
    QueryDef(
      "q179_kmv_distinct",
      Some("""
        WITH t AS (SELECT source, string_split(text,' ') toks
                   FROM documents),
        sarr AS (SELECT source,
                   CASE WHEN len(toks) >= 3
                        THEN list_transform(range(1, len(toks)-1),
                               i -> array_to_string(toks[i:i+2], ' '))
                        ELSE []::VARCHAR[] END AS shsx
                 FROM t),
        shs AS (SELECT DISTINCT source, h FROM (
                  SELECT source, unnest(list_transform(shsx,
                    g -> ('0x'||substr(md5(g),1,15))::BIGINT)) AS h
                  FROM sarr)),
        ex AS (SELECT source, count(*) AS exact_distinct
               FROM shs GROUP BY 1),
        kmv AS (SELECT source, h FROM (
                  SELECT source, h, row_number() OVER (
                    PARTITION BY source ORDER BY h) AS rk FROM shs)
                WHERE rk <= 64),
        est AS (SELECT source, count(*) AS k_used,
                  CASE WHEN count(*) < 64
                       THEN CAST(count(*) AS DOUBLE)
                       ELSE CAST(63 AS DOUBLE) * 1152921504606846976.0
                            / CAST(max(h) AS DOUBLE)
                  END AS est_distinct
                FROM kmv GROUP BY 1)
        SELECT ex.source, ex.exact_distinct, est.k_used,
               est.est_distinct,
               (est.est_distinct - ex.exact_distinct)
                 / ex.exact_distinct AS rel_err
        FROM ex JOIN est USING (source)"""),
      (s, d) => {
        val k = 64
        val shs = t(s, d, "documents")
          .select(col("source"), explode(TextOps.shingleHashes(col("text")))
            .as("h"))
          .distinct()
          // feeds the exact count AND the sketch build
          .barrier()
        val ex = shs.groupBy(col("source"))
          .agg(count(lit(1)).as("exact_distinct"))
        val est = Sketches.kmvDistinctEstimate(
          Sketches.kmvBuild(shs, "source", "h", k), "source", "h", k)
        ex.join(est, Seq("source"))
          .select(col("source"), col("exact_distinct"), col("k_used"),
            col("est_distinct"),
            ((col("est_distinct") - col("exact_distinct")) /
              col("exact_distinct")).as("rel_err"))
      }),

    // Bloom-filter join-pruning audit: the urgent-orders key set as a
    // deterministic md5 Bloom (m = 65536, h = 3) probed by every
    // lineitem order key — passing keys, true matches, and the FALSE
    // POSITIVES, which hash-match because the bit layout is
    // hash60-derived (the only Bloom in the registry whose mistakes
    // are engine-exact; Sketches.bloomJoinAudit scaladoc has the
    // relational-bitset shape).
    QueryDef(
      "q192_bloom_join_audit",
      Some("""
        WITH bk AS (SELECT DISTINCT o_orderkey AS k FROM orders
                    WHERE o_orderpriority = '1-URGENT'),
        hs AS (SELECT unnest([1, 2, 3]) AS i),
        bits AS (SELECT DISTINCT
                   ('0x'||substr(md5(CAST(k AS VARCHAR)||'#'||i),1,15))
                     ::BIGINT % 65536 AS pos
                 FROM bk, hs),
        pk AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
        pp AS (SELECT k,
                 ('0x'||substr(md5(CAST(k AS VARCHAR)||'#'||i),1,15))
                   ::BIGINT % 65536 AS pos
               FROM pk, hs),
        pass AS (SELECT k FROM pp JOIN bits USING (pos)
                 GROUP BY k HAVING count(*) = 3),
        agg AS (SELECT
                  (SELECT count(*) FROM pk) AS n_probe_keys,
                  (SELECT count(*) FROM pass) AS n_pass,
                  (SELECT count(*) FROM pk
                   WHERE k IN (SELECT k FROM bk)) AS n_true)
        SELECT n_probe_keys, n_pass, n_true,
               n_pass - n_true AS n_false_pos,
               CASE WHEN n_probe_keys = n_true THEN 0.0
                    ELSE CAST(n_pass - n_true AS DOUBLE)
                         / CAST(n_probe_keys - n_true AS DOUBLE)
               END AS fp_rate
        FROM agg"""),
      (s, d) =>
        Sketches.bloomJoinAudit(
          t(s, d, "orders")
            .filter(col("o_orderpriority") === "1-URGENT"),
          t(s, d, "lineitem"),
          "o_orderkey", "l_orderkey", m = 65536, h = 3)),

    // Z-order (Morton) clustering key — the multi-dimensional layout
    // sort (Sharding.zorderKey scaladoc; ZorderSpec measures the
    // footer-level pruning effect). Both engines build the key from
    // the SAME generated bit-interleave arithmetic (zTermsSql), so the
    // per-z-bucket occupancy and dim bounding boxes are hash-exact.
    QueryDef(
      "q195_zorder_cells",
      Some(s"""
        WITH z AS (SELECT
                     ${zTermsSql("l_partkey % 256", "l_suppkey % 256", 8)}
                       AS zkey,
                     l_partkey % 256 AS px, l_suppkey % 256 AS sx
                   FROM lineitem)
        SELECT zkey >> 8 AS z_bucket, count(*) AS n,
               min(px) AS pmin, max(px) AS pmax,
               min(sx) AS smin, max(sx) AS smax
        FROM z GROUP BY 1"""),
      (s, d) => {
        val px = (col("l_partkey") % 256).cast("long")
        val sx = (col("l_suppkey") % 256).cast("long")
        t(s, d, "lineitem")
          .select(Sharding.zorderKey(Seq(px, sx), 8).as("zkey"),
            px.as("px"), sx.as("sx"))
          .groupBy(shiftright(col("zkey"), 8).as("z_bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("px")).as("pmin"), max(col("px")).as("pmax"),
            min(col("sx")).as("smin"), max(col("sx")).as("smax"))
      }),

    // Deterministic quantile-sample sketch vs the exact per-group
    // quantiles (Sketches.quantileSampleBuild scaladoc) — sample
    // membership is md5-derived, so even the sketch's ERRORS are
    // hash-oracled (the q192 Bloom-audit precedent, for quantiles).
    QueryDef(
      "q198_quantile_sample",
      Some("""
        WITH h AS (SELECT event_type AS grp,
                     ('0x'||substr(md5(CAST(event_id AS VARCHAR)),1,15))
                       ::BIGINT AS h,
                     value AS v
                   FROM events WHERE value IS NOT NULL),
        s AS (SELECT grp, v FROM
                (SELECT grp, h, v, row_number()
                   OVER (PARTITION BY grp ORDER BY h) AS rk FROM h)
              WHERE rk <= 64),
        est AS (SELECT grp, count(*) AS n_sample,
                       list(v ORDER BY v) AS vs
                FROM s GROUP BY 1),
        ex AS (SELECT grp, count(*) AS n, list(v ORDER BY v) AS vs
               FROM h GROUP BY 1)
        SELECT est.grp AS event_type, ex.n, est.n_sample,
               est.vs[CAST(ceil(0.5 * est.n_sample) AS INT)] AS q50_est,
               ex.vs[CAST(ceil(0.5 * ex.n) AS INT)] AS q50_exact,
               abs(est.vs[CAST(ceil(0.5 * est.n_sample) AS INT)]
                   - ex.vs[CAST(ceil(0.5 * ex.n) AS INT)]) AS q50_err,
               est.vs[CAST(ceil(0.9 * est.n_sample) AS INT)] AS q90_est,
               ex.vs[CAST(ceil(0.9 * ex.n) AS INT)] AS q90_exact,
               abs(est.vs[CAST(ceil(0.9 * est.n_sample) AS INT)]
                   - ex.vs[CAST(ceil(0.9 * ex.n) AS INT)]) AS q90_err
        FROM est JOIN ex ON est.grp = ex.grp
        ORDER BY 1"""),
      (s, d) => {
        val ev = t(s, d, "events")
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("event_id"), col("value"))
        val est = Sketches.quantileSampleEstimate(
          Sketches.quantileSampleBuild(ev, "event_type", "event_id",
            "value", 64),
          "event_type", Seq("q50_est" -> 0.5, "q90_est" -> 0.9))
        // the exact side is the AUDIT (full per-group sort); the
        // sketch is the product at scale
        val exact = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sort_array(collect_list(col("value"))).as("vs"))
          .select(col("event_type"), col("n"),
            element_at(col("vs"),
              ceil(lit(0.5) * col("n")).cast("int")).as("q50_exact"),
            element_at(col("vs"),
              ceil(lit(0.9) * col("n")).cast("int")).as("q90_exact"))
        est.join(exact, "event_type")
          .select(col("event_type"), col("n"), col("n_sample"),
            col("q50_est"), col("q50_exact"),
            abs(col("q50_est") - col("q50_exact")).as("q50_err"),
            col("q90_est"), col("q90_exact"),
            abs(col("q90_est") - col("q90_exact")).as("q90_err"))
          .orderBy(col("event_type"))
      }),

    // Priority sampling (Sketches.prioritySampleSummary scaladoc):
    // weighted subset-sum estimation from k rows per group, with the
    // estimator's error itself hash-oracled. Weights are integered
    // with an explicit floor() because Spark's double→long cast
    // truncates while DuckDB's rounds — floor is IEEE-exact in both.
    QueryDef(
      "q199_priority_sample",
      Some("""
        WITH h AS (SELECT event_type AS grp,
                     CAST(event_id AS VARCHAR) AS key,
                     CAST(floor(abs(value) * 1000) AS BIGINT) + 1 AS w,
                     (('0x'||substr(md5(CAST(event_id AS VARCHAR)),1,15))
                        ::BIGINT)::DOUBLE / 1152921504606846976.0 AS u
                   FROM events WHERE value IS NOT NULL),
        r AS (SELECT grp, key, w, CAST(w AS DOUBLE) / u AS pri,
                     row_number() OVER (PARTITION BY grp
                       ORDER BY CAST(w AS DOUBLE) / u DESC, key) AS rk
              FROM h),
        kept AS (SELECT * FROM r WHERE rk <= 65),
        tau AS (SELECT grp, CASE WHEN count(*) = 65 THEN min(pri)
                            ELSE 0.0 END AS tau
                FROM kept GROUP BY 1),
        samp AS (SELECT kept.grp AS grp, rk,
                        greatest(CAST(w AS DOUBLE), tau.tau) AS wa
                 FROM kept JOIN tau ON kept.grp = tau.grp
                 WHERE rk <= 64),
        est AS (SELECT samp.grp AS grp, count(*) AS k_used,
                       list_reduce(list(wa ORDER BY rk),
                                   (a, b) -> a + b) AS est_sum
                FROM samp GROUP BY 1),
        ex AS (SELECT grp, count(*) AS n,
                      CAST(sum(w) AS BIGINT) AS exact_sum
               FROM h GROUP BY 1)
        SELECT est.grp AS event_type, ex.n, est.k_used, tau.tau,
               est.est_sum, ex.exact_sum,
               abs(est.est_sum - CAST(ex.exact_sum AS DOUBLE))
                 / CAST(ex.exact_sum AS DOUBLE) AS rel_err
        FROM est JOIN ex ON est.grp = ex.grp
                 JOIN tau ON est.grp = tau.grp
        ORDER BY 1"""),
      (s, d) => {
        val ev = t(s, d, "events")
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("event_id"),
            (floor(abs(col("value")) * 1000) + 1).cast("long").as("wgt"))
        Sketches.prioritySampleSummary(ev, "event_type", "event_id",
          "wgt", 64)
          .orderBy(col("event_type"))
      }),

    // Per-key Bloom membership (Sketches.bloomMayContain — the probe
    // half of the q192 audit, and what a training-side
    // decontamination pass actually consults against the streaming
    // filter store): the lang='en' vocabulary as a deterministic md5
    // Bloom (m = 4096, h = 3) probed by every non-en token. Bit
    // layout is hash60-derived, so every answer INCLUDING the false
    // positives hash-matches.
    QueryDef(
      "q236_bloom_membership",
      Some("""
        WITH tk AS (SELECT lang, unnest(string_split(text,' ')) AS tok
                    FROM documents),
        hs AS (SELECT unnest([1, 2, 3]) AS i),
        en AS (SELECT DISTINCT tok FROM tk WHERE lang = 'en'),
        bits AS (SELECT DISTINCT
                   ('0x'||substr(md5(tok||'#'||i),1,15))
                     ::BIGINT % 4096 AS pos
                 FROM en, hs),
        probe AS (SELECT DISTINCT tok FROM tk WHERE lang <> 'en'),
        pp AS (SELECT tok,
                 ('0x'||substr(md5(tok||'#'||i),1,15))
                   ::BIGINT % 4096 AS pos
               FROM probe, hs),
        hit AS (SELECT pos, 1 AS h FROM bits)
        SELECT pp.tok, sum(coalesce(hit.h, 0)) = 3 AS may_contain
        FROM pp LEFT JOIN hit USING (pos)
        GROUP BY 1"""),
      (s, d) => {
        val tk = t(s, d, "documents")
        def toks(f: org.apache.spark.sql.Column) = tk.filter(f)
          .select(explode(TextOps.tokens(col("text"))).as("tok"))
        Sketches.bloomMayContain(
          toks(col("lang") =!= "en"), "tok",
          Sketches.bloomBuild(toks(col("lang") === "en"), "tok",
            4096, 3),
          4096, 3)
      })
  )

  /** The Morton interleave as SQL arithmetic — bit i of x to position
    * 2i, of y to 2i+1; disjoint positions make `+` the bitwise OR.
    * Mirrors Sharding.zorderKey term-for-term. */
  private def zTermsSql(xExpr: String, yExpr: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"(((($xExpr) >> $i) & 1) << ${2 * i})",
      s"(((($yExpr) >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
}
