package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmops.{Mixture, Sharding, Similarity, TextOps}
import graft.ops.Incremental

/** Lake-lifecycle operator family: the operations a daily-snapshot
  * 100 TB lake needs between ingestion and training — snapshot deltas,
  * subset-duplication detection, semantic dedup, range-partitioned
  * export planning, and split assignment.
  *
  * Same determinism contract as the rest of the engine (see
  * LlmQueries): md5-derived 60-bit hashes, sequential-fold double dot
  * products, exact integer/DECIMAL arithmetic everywhere else.
  */
object CorpusLakeQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** DuckDB fragment: 60-bit md5 hash (TextOps.hash60 parity). */
  private def dkHash60(e: String): String =
    s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** DuckDB fragment: sequential-fold double dot product. */
  private def dkDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"s -> CAST(s[1] AS DOUBLE)*CAST(s[2] AS DOUBLE)), (x,y) -> x+y)"

  /** DuckDB fragment: unrounded zero-norm-guarded cosine. */
  private def dkCos(dot: String, na: String, nb: String): String =
    s"(CASE WHEN $na = 0 OR $nb = 0 THEN 0.0 " +
      s"ELSE $dot / (sqrt($na)*sqrt($nb)) END)"

  def defs: Seq[QueryDef] = Seq(

    // Snapshot delta: added/removed/changed rows between two dated
    // dumps of the same keyed table — the reference's daily-dump churn
    // question. Snapshots are derived deterministically from orders
    // (drop different key residues per side, double some prices on the
    // new side) so all three statuses appear.
    QueryDef(
      "q98_snapshot_diff",
      Some("""
        WITH a AS (SELECT o_orderkey, o_totalprice AS price
                   FROM orders WHERE o_orderkey % 10 <> 3),
        b AS (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                          ELSE o_totalprice END AS price
              FROM orders WHERE o_orderkey % 7 <> 2),
        j AS (SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
                     a.price AS old_price, b.price AS new_price,
                     a.o_orderkey IS NOT NULL AS in_a,
                     b.o_orderkey IS NOT NULL AS in_b
              FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey),
        s AS (SELECT o_orderkey, old_price, new_price,
                     CASE WHEN NOT in_a THEN 'added'
                          WHEN NOT in_b THEN 'removed'
                          WHEN old_price IS DISTINCT FROM new_price
                            THEN 'changed' END AS status
              FROM j)
        SELECT o_orderkey, status, old_price, new_price
        FROM s WHERE status IS NOT NULL"""),
      (s, d) => {
        val orders = t(s, d, "orders")
        val snapA = orders.filter(col("o_orderkey") % 10 =!= 3)
          .select(col("o_orderkey"), col("o_totalprice").as("price"))
        val snapB = orders.filter(col("o_orderkey") % 7 =!= 2)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice")).as("price"))
        Incremental.snapshotDiff(snapA, snapB,
          Seq("o_orderkey"), Seq("price"))
      }),

    // Directed near-containment pairs: quotes/excerpts buried in
    // larger documents — high containment, low Jaccard, invisible to
    // symmetric dedup (q41). Oracle mirrors the minShingles floor and
    // the df>1000 hot-shingle cap exactly.
    QueryDef(
      "q99_containment_pairs",
      Some(s"""
        WITH t AS (SELECT doc_id, string_split(text,' ') toks
                   FROM documents),
        sarr AS (SELECT doc_id,
                CASE WHEN len(toks) >= 3
                     THEN list_transform(range(1, len(toks)-1),
                            i -> array_to_string(toks[i:i+2], ' '))
                     ELSE []::VARCHAR[] END AS shs
              FROM t),
        sh0 AS (SELECT doc_id, len(shsd) AS nsh, unnest(shsd) AS sh
                FROM (SELECT doc_id, list_distinct(
                        list_transform(shs, g -> ${dkHash60("g")})) shsd
                      FROM sarr)),
        sh AS (SELECT * FROM sh0 WHERE nsh >= 5),
        kept AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 1000),
        c AS (SELECT a.doc_id da, b.doc_id db, a.nsh na, count(*) common
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
              JOIN kept k ON a.sh = k.sh
              GROUP BY 1, 2, 3)
        SELECT da AS contained, db AS container,
               CAST(common AS DOUBLE)/na AS containment
        FROM c WHERE CAST(common AS DOUBLE)/na >= 0.5"""),
      (s, d) =>
        TextOps.containmentPairs(t(s, d, "documents"), "doc_id", "text",
          minContain = 0.5, minShingles = 5, maxDf = 1000)),

    // Quoted-document drop list — the release decision over q99's
    // exact containment index (LSH banding recalls by Jaccard and
    // misses exactly these low-J quote pairs — q278 is the estimator
    // calibration, THIS is the decision): over the exact-deduped
    // corpus, drop every doc ≥ 0.9-contained in another; mutual ≥τ
    // containment (near-identical sets) keeps the lower id, and
    // one-directional containment implies a strictly larger
    // container, so no size tiebreak is needed. Quote chains drop
    // every inner doc; the outermost survivor carries the text.
    QueryDef(
      "q279_contained_drop",
      Some(s"""
        WITH dd AS (SELECT min(doc_id) AS doc_id FROM documents
                    GROUP BY md5(text)),
        ddocs AS (SELECT d.* FROM documents d JOIN dd USING (doc_id)),
        t AS (SELECT doc_id, string_split(text,' ') toks FROM ddocs),
        sarr AS (SELECT doc_id,
                CASE WHEN len(toks) >= 3
                     THEN list_transform(range(1, len(toks)-1),
                            i -> array_to_string(toks[i:i+2], ' '))
                     ELSE []::VARCHAR[] END AS shs
              FROM t),
        sh0 AS (SELECT doc_id, len(shsd) AS nsh, unnest(shsd) AS sh
                FROM (SELECT doc_id, list_distinct(
                        list_transform(shs, g -> ${dkHash60("g")})) shsd
                      FROM sarr)),
        sh AS (SELECT * FROM sh0 WHERE nsh >= 5),
        kept AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 1000),
        c AS (SELECT a.doc_id da, b.doc_id db, a.nsh na, count(*) common
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
              JOIN kept k ON a.sh = k.sh
              GROUP BY 1, 2, 3),
        p AS (SELECT da AS x, db AS y FROM c
              WHERE CAST(common AS DOUBLE)/na >= 0.9),
        dr AS (SELECT p.x AS doc, count(*) AS n_containers
               FROM p LEFT JOIN p q ON p.x = q.y AND p.y = q.x
               WHERE q.x IS NULL OR p.x > p.y
               GROUP BY 1)
        SELECT dd.doc_id,
               COALESCE(dr.n_containers, 0) AS n_containers,
               dr.doc IS NULL AS is_kept
        FROM dd LEFT JOIN dr ON dr.doc = dd.doc_id"""),
      (s, d) =>
        TextOps.containedDropList(t(s, d, "documents"), "doc_id",
          "text")),

    // SemDeDup-style semantic dedup: within each cell (label), a
    // vector survives iff no earlier vector is cosine-closer than the
    // threshold — deterministic first-occurrence keep rule (q84
    // precedent), no iteration, no closure.
    QueryDef(
      "q100_semdedup_keep",
      Some(s"""
        WITH e AS (SELECT vec_id, label, embedding v,
                          ${dkDot("embedding", "embedding")} AS nn
                   FROM embeddings),
        d AS (SELECT DISTINCT a.vec_id
              FROM e a JOIN e b ON a.label = b.label
                                AND b.vec_id < a.vec_id
              WHERE ${dkCos(dkDot("a.v", "b.v"), "a.nn", "b.nn")} > 0.3)
        SELECT e.vec_id, e.label, d.vec_id IS NULL AS kept
        FROM e LEFT JOIN d ON e.vec_id = d.vec_id"""),
      (s, d) =>
        Similarity.semdedupKeep(t(s, d, "embeddings"),
          "vec_id", "embedding", "label", 0.3)),

    // Equi-depth range-shard manifest: exact NTILE cut points over
    // (n_chars, doc_id) with NO single-partition stage — the
    // distributed global row-number decomposition in
    // Sharding.globalRowNumber. The manifest is what
    // repartitionByRange approximates by sampling at export time.
    QueryDef(
      "q101_range_shards",
      Some("""
        WITH r AS (SELECT n_chars,
                          NTILE(32) OVER (ORDER BY n_chars, doc_id)
                            AS shard
                   FROM documents)
        SELECT CAST(shard AS INT) AS shard, count(*) AS n_docs,
               min(n_chars) AS min_sort, max(n_chars) AS max_sort,
               CAST(sum(n_chars) AS BIGINT) AS mass
        FROM r GROUP BY 1"""),
      (s, d) =>
        Sharding.rangeShardManifest(t(s, d, "documents"),
          "n_chars", "doc_id", 32)),

    // Deterministic train/val/test split: hash-bucket assignment
    // (stable as the corpus grows — no rand(), no reshuffling of
    // yesterday's docs), summarized per (lang, split).
    QueryDef(
      "q102_train_split",
      Some(s"""
        WITH s AS (SELECT lang, n_chars,
                     ${dkHash60("CAST(doc_id AS VARCHAR)||':split'")}
                       % 100 AS bucket
                   FROM documents)
        SELECT lang,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        FROM s GROUP BY 1, 2"""),
      (s, d) =>
        Mixture.trainSplit(t(s, d, "documents"), "doc_id")
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars_total"))),

    // SCD type-2 history: collapse N dated snapshots into per-key
    // validity intervals (q98's N-snapshot generalization). Snapshots
    // derive deterministically from orders — each key's price doubles
    // at exactly one of three snapshots, so every key produces 2-3
    // interval rows.
    QueryDef(
      "q103_scd2_history",
      Some("""
        WITH s AS (SELECT o_orderkey, snap,
                          CASE WHEN o_orderkey % 3 = snap
                               THEN o_totalprice * 2
                               ELSE o_totalprice END AS price
                   FROM orders CROSS JOIN range(0, 3) r(snap)
                   WHERE o_orderkey % 100 < 20),
        m AS (SELECT o_orderkey, snap, price,
                     lag(price) OVER
                       (PARTITION BY o_orderkey ORDER BY snap) AS pp,
                     lag(snap) OVER
                       (PARTITION BY o_orderkey ORDER BY snap) AS ps
              FROM s),
        h AS (SELECT o_orderkey, snap, price FROM m
              WHERE ps IS NULL OR price IS DISTINCT FROM pp)
        SELECT o_orderkey, price, snap AS valid_from,
               lead(snap) OVER
                 (PARTITION BY o_orderkey ORDER BY snap) AS valid_to
        FROM h"""),
      (s, d) => {
        val snaps = t(s, d, "orders")
          .filter(col("o_orderkey") % 100 < 20)
          .select(col("o_orderkey"), col("o_totalprice"),
            explode(sequence(lit(0L), lit(2L))).as("snap"))
          .select(col("o_orderkey"), col("snap"),
            when(col("o_orderkey") % 3 === col("snap"),
              col("o_totalprice") * 2)
              .otherwise(col("o_totalprice")).as("price"))
        Incremental.scdHistory(snaps, Seq("o_orderkey"), Seq("price"),
          "snap")
      }),

    // Rendezvous (highest-random-weight) sharding: per-node doc
    // counts under argmax-of-hash assignment. Narrow per-row compute
    // (no shuffle until the count); adding a node moves only ~1/(N+1)
    // of the corpus — mod-N resharding moves nearly all of it.
    QueryDef(
      "q111_rendezvous_shards",
      Some(s"""
        WITH nd AS (SELECT unnest(['n0','n1','n2','n3','n4']) AS node),
        s AS (SELECT d.doc_id, nd.node,
                     ${dkHash60("CAST(d.doc_id AS VARCHAR)||'@'||nd.node")}
                       AS score
              FROM documents d CROSS JOIN nd),
        a AS (SELECT doc_id, node FROM
                (SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, node) AS rk FROM s)
              WHERE rk = 1)
        SELECT node, count(*) AS n_docs FROM a GROUP BY 1"""),
      (s, d) =>
        Sharding.rendezvousAssign(t(s, d, "documents"), "doc_id",
          Seq("n0", "n1", "n2", "n3", "n4"))
          .groupBy(col("node"))
          .agg(count(lit(1)).as("n_docs"))),

    // Data-quality profile: per-column row/null/exact-distinct counts
    // in ONE scan and ONE aggregation (ops/Profile.profile) — the
    // release gate a lake runs on every new snapshot.
    QueryDef(
      "q113_data_profile",
      Some("""
        SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
               count(*) FILTER (WHERE o_custkey IS NULL) AS n_nulls,
               count(DISTINCT o_custkey) AS n_distinct
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*),
               count(*) FILTER (WHERE o_orderstatus IS NULL),
               count(DISTINCT o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*),
               count(*) FILTER (WHERE o_orderpriority IS NULL),
               count(DISTINCT o_orderpriority)
        FROM orders"""),
      (s, d) =>
        graft.ops.Profile.profile(t(s, d, "orders"),
            Seq("o_custkey", "o_orderstatus", "o_orderpriority"))
          .withColumnRenamed("column", "col_name")),

    // Referential-integrity audit: orphan counts per declared FK
    // relationship (one anti-join each) — the cross-table consistency
    // check over snapshot families (DBS datasets/files/blocks in the
    // reference; TPC-H's FK chain here).
    QueryDef(
      "q114_fk_audit",
      Some("""
        SELECT 'lineitem->orders' AS relationship,
               (SELECT count(*) FROM lineitem) AS n_rows,
               (SELECT count(*) FROM lineitem l
                LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_orderkey IS NULL) AS n_orphans
        UNION ALL
        SELECT 'orders->customer',
               (SELECT count(*) FROM orders),
               (SELECT count(*) FROM orders x
                LEFT JOIN customer c ON x.o_custkey = c.c_custkey
                WHERE c.c_custkey IS NULL)
        UNION ALL
        SELECT 'customer->nation',
               (SELECT count(*) FROM customer),
               (SELECT count(*) FROM customer x
                LEFT JOIN nation n ON x.c_nationkey = n.n_nationkey
                WHERE n.n_nationkey IS NULL)"""),
      (s, d) =>
        graft.ops.Profile.fkAudit(s, Seq(
          ("lineitem->orders", t(s, d, "lineitem"), "l_orderkey",
            t(s, d, "orders"), "o_orderkey"),
          ("orders->customer", t(s, d, "orders"), "o_custkey",
            t(s, d, "customer"), "c_custkey"),
          ("customer->nation", t(s, d, "customer"), "c_nationkey",
            t(s, d, "nation"), "n_nationkey")))),

    // Apply a CDC delta to a snapshot (MERGE-INTO semantics, the
    // inverse of q98): upserts override, deletes drop, untouched rows
    // carry through. Delta derives deterministically from orders —
    // updates (key % 7 = 0, price doubled), deletes (key % 11 = 3),
    // and inserts (shifted new keys) all exercised.
    QueryDef(
      "q119_apply_changes",
      Some("""
        WITH s AS (SELECT o_orderkey AS k, o_totalprice AS price
                   FROM orders),
        d AS (SELECT o_orderkey AS k,
                     CASE WHEN o_orderkey % 7 = 0 THEN 'U'
                          ELSE 'D' END AS op,
                     o_totalprice * 2 AS price
              FROM orders
              WHERE o_orderkey % 7 = 0 OR o_orderkey % 11 = 3
              UNION ALL
              SELECT o_orderkey + 10000000, 'U', o_totalprice
              FROM orders WHERE o_orderkey % 13 = 1),
        j AS (SELECT coalesce(s.k, d.k) AS k, s.price AS oldp,
                     d.op, d.price AS newp
              FROM s FULL OUTER JOIN d ON s.k = d.k)
        SELECT k, CASE WHEN op IS NOT NULL THEN newp
                       ELSE oldp END AS price
        FROM j WHERE op IS NULL OR op <> 'D'"""),
      (s, d) => {
        val orders = t(s, d, "orders")
        val snapshot = orders.select(col("o_orderkey").as("k"),
          col("o_totalprice").as("price"))
        val updatesDeletes = orders
          .filter(col("o_orderkey") % 7 === 0 ||
            col("o_orderkey") % 11 === 3)
          .select(col("o_orderkey").as("k"),
            when(col("o_orderkey") % 7 === 0, lit("U"))
              .otherwise(lit("D")).as("op"),
            (col("o_totalprice") * 2).as("price"))
        val inserts = orders.filter(col("o_orderkey") % 13 === 1)
          .select((col("o_orderkey") + 10000000L).as("k"),
            lit("U").as("op"), col("o_totalprice").as("price"))
        Incremental.applyChanges(snapshot,
          updatesDeletes.unionByName(inserts),
          Seq("k"), Seq("price"), "op")
      }))
}
