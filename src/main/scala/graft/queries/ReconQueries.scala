package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.BarrierOps
import graft.core.Tables
import graft.ops.{Aggregates, Calendar, Events, Graphs, Incremental,
  Linkage, Skew}

/** Reconciliation / linkage / graph-structure operator family: the
  * master-data and graph-analysis layer over a multi-feed lake —
  * coordinated sampling that survives joins, golden-record
  * survivorship, point-in-time SCD2 lookups, clustering agreement,
  * degree-capped triangle counting, hop-bounded BFS, and the salted
  * skew join proven exactly equal to its plain form.
  *
  * Reference anchors: the multi-source reconciliation shape is
  * dbs_phedex.py / rucio vs dbs cross-checks; everything else is the
  * standard lake tooling the reference's consumers hand-roll.
  * Determinism contract as elsewhere: md5-derived membership, exact
  * integer pair counts, DECIMAL sums, single final divisions with
  * mirrored expression trees.
  */
object ReconQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.loadSpread(s, d, n)

  /** DuckDB fragment: 60-bit md5 hash (TextOps.hash60 parity). */
  private def dkHash60(e: String): String =
    s"('0x'||substr(md5($e),1,15))::BIGINT"

  /** Shared derived graph for q202/q208: part co-purchase edges on the
    * mod-10 partkey slice, degree-capped at 50. The slice keeps the
    * graph sparse at every SF (TPC-H holds orders-per-part roughly
    * constant, so degrees don't grow with scale); the cap is the
    * semantic guard that keeps wedge enumeration bounded if a source
    * ever ships a celebrity vertex. */
  private val edgeCte = """
        lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
               WHERE l_partkey % 10 = 0),
        e0 AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
               FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                                   AND a.l_partkey < b.l_partkey),
        deg AS (SELECT v, count(*) AS deg FROM
                  (SELECT src AS v FROM e0
                   UNION ALL SELECT dst FROM e0) GROUP BY 1),
        keep AS (SELECT v FROM deg WHERE deg <= 50),
        e AS (SELECT src, dst FROM e0
              JOIN keep ka ON e0.src = ka.v
              JOIN keep kb ON e0.dst = kb.v)"""

  /** Shared q205/q209 derivation: three deterministic feed versions
    * per customer. Fields go missing independently per feed; names
    * AGREE across feeds for even keys and CONFLICT for odd ones (the
    * version-suffixed variant), acctbal always drifts per version,
    * mktsegment is always consistent — so the conflict matrix has a
    * nonzero, a near-total, and a zero row. */
  private val feedsCte = """
        feeds AS (
          SELECT c_custkey, v,
                 CASE WHEN (c_custkey + v) % 3 = 0 THEN NULL
                      ELSE c_name || '#' ||
                        CASE WHEN c_custkey % 2 = 0 THEN 'x'
                             ELSE CAST(v AS VARCHAR) END
                 END AS name,
                 CASE WHEN (c_custkey + v) % 4 = 0 THEN NULL
                      ELSE c_acctbal + v END AS acctbal,
                 CASE WHEN (c_custkey + v) % 5 = 0 THEN NULL
                      ELSE c_mktsegment END AS mktsegment
          FROM customer CROSS JOIN range(0, 3) r(v))"""

  private def goldenFeeds(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"),
        explode(sequence(lit(0L), lit(2L))).as("v"))
      .select(col("c_custkey"), col("v"),
        when((col("c_custkey") + col("v")) % 3 === 0, lit(null))
          .otherwise(concat(col("c_name"), lit("#"),
            when(col("c_custkey") % 2 === 0, lit("x"))
              .otherwise(col("v").cast("string")))).as("name"),
        when((col("c_custkey") + col("v")) % 4 === 0, lit(null))
          .otherwise(col("c_acctbal") + col("v")).as("acctbal"),
        when((col("c_custkey") + col("v")) % 5 === 0, lit(null))
          .otherwise(col("c_mktsegment")).as("mktsegment"))

  private def copurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val lp = t(s, d, "lineitem")
      .filter(col("l_partkey") % 10 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
    val pairs = lp.as("a")
      .join(lp.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    Graphs.degreeCapped(pairs, 50)
  }

  def defs: Seq[QueryDef] = Seq(

    // Coordinated (join-preserving) 10% sample across customer AND
    // orders: membership is md5(key)-derived, so every sampled order's
    // customer is provably in the customer sample — n_orphans is
    // computed, not assumed, and is 0. Per-nation sampled totals scale
    // by 10× unbiasedly; independent per-table sampling would keep only
    // 1% of join pairs and orphan the rest.
    QueryDef(
      "q201_coordinated_sample",
      Some(s"""
        WITH cs AS (SELECT * FROM customer
                    WHERE ${dkHash60(
          "CAST(c_custkey AS VARCHAR)||':cosample'")} % 100 < 10),
        os AS (SELECT * FROM orders
               WHERE ${dkHash60(
          "CAST(o_custkey AS VARCHAR)||':cosample'")} % 100 < 10),
        orph AS (SELECT count(*) AS n_orphans
                 FROM os LEFT JOIN cs ON os.o_custkey = cs.c_custkey
                 WHERE cs.c_custkey IS NULL)
        SELECT c.c_nationkey AS nationkey,
               count(DISTINCT c.c_custkey) AS n_cust,
               count(o.o_orderkey) AS n_orders,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE) AS sum_price,
               max(orph.n_orphans) AS n_orphans
        FROM cs c
        LEFT JOIN os o ON c.c_custkey = o.o_custkey
        CROSS JOIN orph
        GROUP BY 1"""),
      (s, d) => {
        val cs = t(s, d, "customer")
          .filter(Linkage.coordinatedKeep(col("c_custkey"),
            ":cosample", 10))
        val os = t(s, d, "orders")
          .filter(Linkage.coordinatedKeep(col("o_custkey"),
            ":cosample", 10))
        val orphans = os
          .join(cs.select(col("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        cs.join(os, col("c_custkey") === col("o_custkey"), "left")
          .crossJoin(broadcast(orphans))
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(
            countDistinct(col("c_custkey")).as("n_cust"),
            count(col("o_orderkey")).as("n_orders"),
            Aggregates.decSum(col("o_totalprice")).as("sum_price"),
            max(col("n_orphans")).as("n_orphans"))
      }),

    // Degree-capped triangle participation per vertex on the part
    // co-purchase graph — the clustering-structure probe that, run on
    // near-dup candidate pairs, separates genuine duplicate cliques
    // from chains of borderline matches. Ordered (a<b<c) wedge
    // enumeration counts each triangle once; the degree cap bounds the
    // wedge space (the shuffle bomb at 100 TB is one celebrity vertex).
    QueryDef(
      "q202_triangle_count",
      Some(s"""
        WITH $edgeCte,
        tri AS (SELECT w.a, w.b, w.c FROM
                  (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM e e1 JOIN e e2 ON e1.dst = e2.src) w
                JOIN e e3 ON w.a = e3.src AND w.c = e3.dst)
        SELECT v, count(*) AS n_triangles FROM
          (SELECT a AS v FROM tri
           UNION ALL SELECT b FROM tri
           UNION ALL SELECT c FROM tri)
        GROUP BY 1"""),
      (s, d) => Graphs.triangleCounts(copurchaseEdges(s, d))),

    // Pair-counting agreement between two independent groupings of the
    // documents (lang vs source): contingency reductions → Rand index
    // and ARI from exact integer pair counts — how you compare two
    // dedup clusterings without aligning their label vocabularies.
    // C(n,2) pairs are never materialized; everything reduces over the
    // |A|×|B| contingency cells.
    QueryDef(
      "q203_cluster_agreement",
      Some("""
        WITH cells AS (SELECT lang, source, count(*) AS nij
                       FROM documents GROUP BY 1, 2),
        s AS (SELECT CAST(sum(nij*(nij-1)//2) AS BIGINT) AS pairs_both,
                     CAST(sum(nij) AS BIGINT) AS n
              FROM cells),
        a AS (SELECT CAST(sum(ai*(ai-1)//2) AS BIGINT) AS pairs_a FROM
                (SELECT CAST(sum(nij) AS BIGINT) AS ai
                 FROM cells GROUP BY lang)),
        b AS (SELECT CAST(sum(bj*(bj-1)//2) AS BIGINT) AS pairs_b FROM
                (SELECT CAST(sum(nij) AS BIGINT) AS bj
                 FROM cells GROUP BY source))
        SELECT n, n*(n-1)//2 AS pairs_total,
               pairs_both, pairs_a, pairs_b,
               (CAST(n*(n-1)//2 AS DOUBLE)
                  + 2.0*CAST(pairs_both AS DOUBLE)
                  - CAST(pairs_a AS DOUBLE) - CAST(pairs_b AS DOUBLE))
                 / CAST(n*(n-1)//2 AS DOUBLE) AS rand_index,
               (CAST(pairs_both AS DOUBLE)
                  - CAST(pairs_a AS DOUBLE)*CAST(pairs_b AS DOUBLE)
                    / CAST(n*(n-1)//2 AS DOUBLE))
                 / ((CAST(pairs_a AS DOUBLE)+CAST(pairs_b AS DOUBLE))
                      / 2.0
                    - CAST(pairs_a AS DOUBLE)*CAST(pairs_b AS DOUBLE)
                      / CAST(n*(n-1)//2 AS DOUBLE)) AS ari
        FROM s CROSS JOIN a CROSS JOIN b"""),
      (s, d) =>
        Linkage.clusterAgreement(t(s, d, "documents"), "lang",
          "source")),

    // Point-in-time join: enrich each lineitem (taken "as of" snapshot
    // l_linenumber % 3) with the SCD2 price that was valid at that
    // snapshot — the lookup side of q103's history build. One equi-join
    // with the interval test as a residual; intervals are disjoint per
    // key so exactly one dim row survives per fact row.
    QueryDef(
      "q204_pit_join",
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
              WHERE ps IS NULL OR price IS DISTINCT FROM pp),
        dim AS (SELECT o_orderkey, price, snap AS valid_from,
                       lead(snap) OVER
                         (PARTITION BY o_orderkey ORDER BY snap)
                         AS valid_to
                FROM h),
        f AS (SELECT l_orderkey, l_linenumber,
                     CAST(l_linenumber % 3 AS BIGINT) AS at_snap
              FROM lineitem WHERE l_orderkey % 100 < 20)
        SELECT f.l_orderkey, f.l_linenumber, f.at_snap,
               d.price AS price_at
        FROM f LEFT JOIN dim d
          ON f.l_orderkey = d.o_orderkey
         AND f.at_snap >= d.valid_from
         AND (d.valid_to IS NULL OR f.at_snap < d.valid_to)"""),
      (s, d) => {
        val snaps = t(s, d, "orders")
          .filter(col("o_orderkey") % 100 < 20)
          .select(col("o_orderkey"), col("o_totalprice"),
            explode(sequence(lit(0L), lit(2L))).as("snap"))
          .select(col("o_orderkey"), col("snap"),
            when(col("o_orderkey") % 3 === col("snap"),
              col("o_totalprice") * 2)
              .otherwise(col("o_totalprice")).as("price"))
        val dim = Incremental.scdHistory(snaps, Seq("o_orderkey"),
          Seq("price"), "snap")
        val fact = t(s, d, "lineitem")
          .filter(col("l_orderkey") % 100 < 20)
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_linenumber") % 3).cast("long").as("at_snap"))
        Linkage.pointInTimeJoin(fact, "l_orderkey", "at_snap",
            dim, "o_orderkey")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("at_snap"), col("__dv.price").as("price_at"))
      }),

    // Golden-record survivorship: three deterministic feed versions per
    // customer (fields go missing independently per feed), collapsed to
    // one row per entity taking PER FIELD the latest non-null value.
    // One two-phase hash aggregation of max_by partials — no window, no
    // self-join, hot entities cost O(1) state.
    QueryDef(
      "q205_golden_record",
      Some(s"""
        WITH $feedsCte
        SELECT c_custkey,
               max_by(name, CASE WHEN name IS NOT NULL THEN v END)
                 AS name,
               max_by(acctbal, CASE WHEN acctbal IS NOT NULL THEN v END)
                 AS acctbal,
               max_by(mktsegment,
                      CASE WHEN mktsegment IS NOT NULL THEN v END)
                 AS mktsegment,
               count(*) AS n_records,
               max(v) AS last_version
        FROM feeds GROUP BY 1"""),
      (s, d) =>
        Linkage.goldenRecord(goldenFeeds(s, d), Seq("c_custkey"), "v",
          Seq("name", "acctbal", "mktsegment"))),

    // Native session-window aggregation: Spark's session_window()
    // (SessionWindowing + merging-session aggregate exec) rather than
    // q76's gaps-and-islands windows — the same 30-minute-gap sessions
    // expressed as a FIRST-CLASS GROUPING, which is what survives at
    // scale (one aggregation, mergeable state, no per-user sort
    // windows). Session end = last event + gap, per Spark's semantics;
    // a new session starts when the gap is >= 30 min (strict interval
    // overlap), both mirrored in the oracle.
    QueryDef(
      "q206_session_window",
      Some("""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                          value
                   FROM events),
        f AS (SELECT user_id, event_id, ts_us, value,
                     CASE WHEN ts_us - lag(ts_us) OVER
                            (PARTITION BY user_id
                             ORDER BY ts_us, event_id) < 1800000000
                          THEN 0 ELSE 1 END AS nf
              FROM e),
        -- the cumulative sum MUST tiebreak on event_id exactly like
        -- the flag window: with duplicate per-user timestamps a
        -- ts_us-only order would accumulate flags in a different row
        -- order than they were computed in, making session ids
        -- nondeterministic
        n AS (SELECT user_id, ts_us, value,
                     CAST(sum(nf) OVER (PARTITION BY user_id
                       ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session
              FROM f)
        SELECT user_id,
               min(ts_us) AS start_us,
               max(ts_us) + 1800000000 AS end_us,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_value
        FROM n GROUP BY user_id, session"""),
      (s, d) =>
        t(s, d, "events")
          // loadSpread normalizes ts to epoch-nanos BIGINT (vintage
          // contract, core/Tables); session_window needs a TIMESTAMP.
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
          .groupBy(col("user_id"),
            session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"),
            Aggregates.decSum(col("value")).as("sum_value"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("start_us"),
            unix_micros(col("session_window.end")).as("end_us"),
            col("n_events"), col("sum_value"))),

    // Salted skew join proven exact: lineitem ⋈ part with the join key
    // widened to (key, salt) — one hot part's probe rows spread over 16
    // reducers, the dim replicated 16× (the skewed-fact × modest-dim
    // shape where broadcast doesn't fit and one reducer can't hold the
    // hot key). The oracle is the PLAIN join: the salted plan must
    // reproduce it bit-for-bit.
    QueryDef(
      "q207_salted_join",
      Some("""
        SELECT p_brand,
               count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice *
                 (CAST(1 AS DOUBLE) - l_discount) AS DECIMAL(18,4)))
                 AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1"""),
      (s, d) =>
        Skew.saltedJoin(
            t(s, d, "lineitem"), "l_partkey",
            t(s, d, "part"), "p_partkey",
            struct(col("l_orderkey"), col("l_linenumber")), 16)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_items"),
            Aggregates.decSum(col("l_extendedprice") *
              (lit(1.0) - col("l_discount"))).as("revenue"))),

    // Hop-bounded multi-source BFS over the co-purchase graph: minimum
    // hop distance (≤ 3) from the seed parts — the "blast radius"
    // question (which docs are within k dedup-link hops of a known-bad
    // source). Per hop: one frontier join + one dedup + one anti-join;
    // the oracle is an independent recursive-CTE formulation.
    QueryDef(
      "q208_graph_bfs",
      Some(s"""
        WITH RECURSIVE $edgeCte,
        sym AS (SELECT src AS u, dst AS v FROM e
                UNION ALL SELECT dst, src FROM e),
        verts AS (SELECT DISTINCT u AS v FROM sym),
        reach(v, hop) AS (
          SELECT v, CAST(0 AS BIGINT) FROM verts WHERE v % 97 = 1
          UNION
          SELECT sym.v, r.hop + 1
          FROM reach r JOIN sym ON sym.u = r.v
          WHERE r.hop < 3)
        SELECT v, min(hop) AS hop FROM reach GROUP BY 1"""),
      (s, d) => {
        val edges = copurchaseEdges(s, d)
        val verts = edges.select(col("src").as("v"))
          .unionByName(edges.select(col("dst").as("v")))
          .distinct()
        val seeds = verts.filter(col("v") % 97 === 1)
        Graphs.bfsHops(edges, seeds, 3)
      }),

    // Per-field feed-disagreement matrix over q205's derived feeds:
    // for each field, how many entities carry any value and how many
    // carry ≥2 DISTINCT non-null values (active contradiction, not
    // mere omission) — the diagnostic run before trusting golden-
    // record survivorship. One per-entity aggregation computing all
    // fields' distinct counts at once, then a tiny unpivoted rollup.
    QueryDef(
      "q209_feed_conflicts",
      Some(s"""
        WITH $feedsCte,
        pe AS (SELECT c_custkey,
                      count(DISTINCT name) AS d_name,
                      count(DISTINCT acctbal) AS d_acctbal,
                      count(DISTINCT mktsegment) AS d_mktsegment
               FROM feeds GROUP BY 1)
        SELECT 'name' AS field,
               count(*) FILTER (WHERE d_name >= 1) AS n_with_value,
               count(*) FILTER (WHERE d_name >= 2) AS n_conflicted
        FROM pe
        UNION ALL
        SELECT 'acctbal',
               count(*) FILTER (WHERE d_acctbal >= 1),
               count(*) FILTER (WHERE d_acctbal >= 2)
        FROM pe
        UNION ALL
        SELECT 'mktsegment',
               count(*) FILTER (WHERE d_mktsegment >= 1),
               count(*) FILTER (WHERE d_mktsegment >= 2)
        FROM pe"""),
      (s, d) =>
        Linkage.fieldConflicts(goldenFeeds(s, d), Seq("c_custkey"),
          Seq("name", "acctbal", "mktsegment"))),

    // SCD2 integrity audit on a deliberately corrupted dimension:
    // detect overlapping intervals, history holes, empty/inverted
    // bounds, and non-final open intervals — the disjointness contract
    // q204's point-in-time join relies on, checked instead of assumed.
    // The corruption pattern is deterministic so every defect class
    // has a known nonzero count.
    QueryDef(
      "q210_scd2_integrity",
      Some("""
        WITH dim AS (
          SELECT o_orderkey AS k, 0 AS valid_from,
                 CASE WHEN o_orderkey % 13 = 0 THEN NULL
                      ELSE 2 + o_orderkey % 3 END AS valid_to
          FROM orders WHERE o_orderkey % 100 < 30
          UNION ALL
          SELECT o_orderkey, 3,
                 CASE WHEN o_orderkey % 5 = 0 THEN NULL
                      WHEN o_orderkey % 17 = 0 THEN 3
                      ELSE 6 END
          FROM orders WHERE o_orderkey % 100 < 30),
        f AS (SELECT k, valid_from, valid_to,
                     lead(valid_from) OVER
                       (PARTITION BY k ORDER BY valid_from) AS nf
              FROM dim)
        SELECT 'overlap' AS defect,
               count(*) FILTER (WHERE valid_to IS NOT NULL
                 AND nf IS NOT NULL AND valid_to > nf) AS n_rows
        FROM f
        UNION ALL
        SELECT 'gap',
               count(*) FILTER (WHERE valid_to IS NOT NULL
                 AND nf IS NOT NULL AND valid_to < nf)
        FROM f
        UNION ALL
        SELECT 'bad_bounds',
               count(*) FILTER (WHERE valid_to IS NOT NULL
                 AND valid_to <= valid_from)
        FROM f
        UNION ALL
        SELECT 'open_not_last',
               count(*) FILTER (WHERE valid_to IS NULL
                 AND nf IS NOT NULL)
        FROM f"""),
      (s, d) => {
        val base = t(s, d, "orders")
          .filter(col("o_orderkey") % 100 < 30)
        val first = base.select(col("o_orderkey").as("k"),
          lit(0).as("valid_from"),
          when(col("o_orderkey") % 13 === 0, lit(null))
            .otherwise(lit(2) + col("o_orderkey") % 3)
            .cast("int").as("valid_to"))
        val second = base.select(col("o_orderkey").as("k"),
          lit(3).as("valid_from"),
          when(col("o_orderkey") % 5 === 0, lit(null))
            .when(col("o_orderkey") % 17 === 0, lit(3))
            .otherwise(lit(6)).cast("int").as("valid_to"))
        Linkage.scdAudit(first.unionByName(second), "k")
      }),

    // Local clustering coefficient on the co-purchase graph: per
    // vertex, 2·triangles/(deg·(deg−1)) — clique-likeness of each
    // neighborhood (≈1 on duplicate cliques, ≈0 on match chains).
    // Integer numerator/denominator, ONE division, so the score is
    // engine-exact; degree < 2 excluded (undefined).
    QueryDef(
      "q211_clustering_coeff",
      Some(s"""
        WITH $edgeCte,
        tri AS (SELECT w.a, w.b, w.c FROM
                  (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                   FROM e e1 JOIN e e2 ON e1.dst = e2.src) w
                JOIN e e3 ON w.a = e3.src AND w.c = e3.dst),
        tcnt AS (SELECT v, count(*) AS n_triangles FROM
                   (SELECT a AS v FROM tri
                    UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri)
                 GROUP BY 1),
        dg AS (SELECT v, count(*) AS deg FROM
                 (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
               GROUP BY 1)
        SELECT dg.v, deg,
               COALESCE(n_triangles, 0) AS n_triangles,
               (2.0 * CAST(COALESCE(n_triangles, 0) AS DOUBLE))
                 / CAST(deg * (deg - 1) AS DOUBLE) AS coeff
        FROM dg LEFT JOIN tcnt ON dg.v = tcnt.v
        WHERE deg >= 2"""),
      (s, d) => Graphs.clusteringCoefficient(copurchaseEdges(s, d))),

    // Interval-overlap join: per customer, order-derived interval set A
    // × interval set B with exact integer overlap lengths — the
    // "how much of each transfer window did each outage eat" shape.
    // One equi-join on the key with the overlap test as residual;
    // bounded per-key interval counts keep it linear.
    QueryDef(
      "q212_interval_overlap",
      Some("""
        WITH a AS (SELECT o_custkey AS k, o_orderkey AS a_id,
                          o_orderkey % 100 AS a_start,
                          o_orderkey % 100 + 1 + o_orderkey % 20 AS a_end
                   FROM orders WHERE o_orderkey % 2 = 0),
        b AS (SELECT o_custkey AS k, o_orderkey AS b_id,
                     o_orderkey % 100 AS b_start,
                     o_orderkey % 100 + 1 + o_orderkey % 20 AS b_end
              FROM orders WHERE o_orderkey % 2 = 1)
        SELECT a.k, a_id, b_id, a_start, a_end, b_start, b_end,
               least(a_end, b_end) - greatest(a_start, b_start)
                 AS overlap_len
        FROM a JOIN b ON a.k = b.k
        WHERE least(a_end, b_end) - greatest(a_start, b_start) > 0"""),
      (s, d) => {
        val orders = t(s, d, "orders")
        def ivals(par: Int, idName: String, sName: String,
            eName: String) = orders
          .filter(col("o_orderkey") % 2 === par)
          .select(col("o_custkey").as("k"),
            col("o_orderkey").as(idName),
            (col("o_orderkey") % 100).as(sName),
            (col("o_orderkey") % 100 + 1 + col("o_orderkey") % 20)
              .as(eName))
        Events.overlapJoin(
          ivals(0, "a_id", "a_start", "a_end"),
          ivals(1, "b_id", "b_start", "b_end"),
          "k", "a_id", "a_start", "a_end", "b_id", "b_start", "b_end")
      }),

    // Partition-gap report: per event_type, which hourly bins between
    // the type's first and last hour are missing, and the longest
    // consecutive hole — the day_delta/candidateDirs "did the feed
    // skip snapshots" audit. The window runs over DISTINCT
    // (type, hour) rows, never raw events.
    QueryDef(
      "q213_partition_gaps",
      Some("""
        WITH hb AS (SELECT DISTINCT event_type,
                           epoch_us(ts) // 3600000000 AS hr
                    FROM events),
        g AS (SELECT event_type, hr,
                     COALESCE(lead(hr) OVER
                       (PARTITION BY event_type ORDER BY hr) - hr - 1,
                       0) AS gap
              FROM hb)
        SELECT event_type,
               min(hr) AS first_bin, max(hr) AS last_bin,
               max(hr) - min(hr) + 1 AS n_expected,
               count(*) AS n_present,
               max(hr) - min(hr) + 1 - count(*) AS n_missing,
               max(gap) AS longest_gap
        FROM g GROUP BY 1"""),
      (s, d) =>
        // loadSpread ts is epoch nanos; µs then hours, integer div
        Calendar.missingBins(t(s, d, "events"), "event_type",
          expr("(ts div 1000) div 3600000000"))),

    // CDC ordering audit: keys whose version order and event-time
    // order disagree (adjacent inversions + worst backwards jump) —
    // run before trusting any "latest wins" merge. Versions and a
    // deterministically jittered ts derive from orders; ~1/7 of keys
    // get one backwards timestamp.
    QueryDef(
      "q214_cdc_order_audit",
      Some("""
        WITH ch AS (SELECT o_orderkey AS k, v,
                           o_orderkey * 10 + v * 2
                             - CASE WHEN v = 1 AND o_orderkey % 7 = 0
                                    THEN 5 ELSE 0 END AS ts
                    FROM orders CROSS JOIN range(0, 3) r(v)
                    WHERE o_orderkey % 100 < 40),
        f AS (SELECT k, v, ts,
                     lag(ts) OVER (PARTITION BY k ORDER BY v) AS pts
              FROM ch),
        g AS (SELECT k, count(*) AS n_changes,
                     count(*) FILTER (WHERE ts < pts) AS n_inversions,
                     max(CASE WHEN ts < pts THEN pts - ts ELSE 0 END)
                       AS max_backstep
              FROM f GROUP BY 1)
        SELECT k, n_changes, n_inversions, max_backstep
        FROM g WHERE n_inversions > 0"""),
      (s, d) => {
        val ch = t(s, d, "orders")
          .filter(col("o_orderkey") % 100 < 40)
          .select(col("o_orderkey").as("k"),
            explode(sequence(lit(0L), lit(2L))).as("v"))
          .select(col("k"), col("v"),
            (col("k") * 10 + col("v") * 2 -
              when(col("v") === 1 && col("k") % 7 === 0, 5)
                .otherwise(0)).as("ts"))
        Incremental.orderAudit(ch, "k", "v", "ts")
      }),

    // Rendezvous-rebalance audit: the old→new transition matrix when
    // node n5 joins the q111 ring — measures rendezvous hashing's
    // guarantee that only ~1/(N+1) of keys move (a mod-N reshard moves
    // ~N/(N+1)). Both argmax assignments run in one narrow projection:
    // one scan, zero joins, one count aggregation.
    QueryDef(
      "q221_rendezvous_rebalance",
      Some(s"""
        WITH nd5 AS (SELECT unnest(['n0','n1','n2','n3','n4']) AS node),
        nd6 AS (SELECT unnest(['n0','n1','n2','n3','n4','n5'])
                  AS node),
        s5 AS (SELECT d.doc_id, nd5.node,
                      ${dkHash60(
          "CAST(d.doc_id AS VARCHAR)||'@'||nd5.node")} AS score
               FROM documents d CROSS JOIN nd5),
        a5 AS (SELECT doc_id, node AS old_node FROM
                 (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, node) AS rk FROM s5)
               WHERE rk = 1),
        s6 AS (SELECT d.doc_id, nd6.node,
                      ${dkHash60(
          "CAST(d.doc_id AS VARCHAR)||'@'||nd6.node")} AS score
               FROM documents d CROSS JOIN nd6),
        a6 AS (SELECT doc_id, node AS new_node FROM
                 (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, node) AS rk FROM s6)
               WHERE rk = 1)
        SELECT old_node, new_node, count(*) AS n_docs
        FROM a5 JOIN a6 USING (doc_id)
        GROUP BY 1, 2"""),
      (s, d) =>
        graft.llmops.Sharding.rendezvousRebalance(
          t(s, d, "documents"), "doc_id",
          Seq("n0", "n1", "n2", "n3", "n4"),
          Seq("n0", "n1", "n2", "n3", "n4", "n5"))),

    // Self-join size forecast from per-key counts: exact output
    // cardinality of the events-per-user pairing (Σ c²) plus the hot
    // key's share — the pre-flight check that decides salt-vs-run
    // BEFORE paying the shuffle. Never materializes a single pair.
    QueryDef(
      "q222_join_size_forecast",
      Some("""
        WITH c AS (SELECT user_id, count(*) AS n
                   FROM events GROUP BY 1)
        SELECT count(*) AS n_join_keys,
               CAST(sum(n*n) AS BIGINT) AS join_rows,
               CAST(max(n*n) AS BIGINT) AS max_key_pairs,
               CAST(max(n*n) AS DOUBLE) / CAST(sum(n*n) AS DOUBLE)
                 AS top_key_share
        FROM c"""),
      (s, d) =>
        graft.ops.Profile.selfJoinForecast(t(s, d, "events"),
          "user_id")),

    // Degree assortativity: Pearson correlation of endpoint degrees
    // over the symmetrized edge list — do high-degree vertices attach
    // to each other (assortative, >0) or to leaves (disassortative,
    // <0)? Read together with q211: high clustering + assortative core
    // means dedup components will chain through hubs. Engine-exact by
    // the q121 contract: integer moment sums in DECIMAL, sqrt is
    // IEEE-exact, one final division.
    QueryDef(
      "q227_degree_assortativity",
      Some(s"""
        WITH $edgeCte,
        sym AS (SELECT src AS u, dst AS v FROM e
                UNION ALL SELECT dst, src FROM e),
        dgs AS (SELECT u AS w, count(*) AS dg FROM sym GROUP BY 1),
        p AS (SELECT da.dg AS du, db.dg AS dv
              FROM sym JOIN dgs da ON sym.u = da.w
                       JOIN dgs db ON sym.v = db.w),
        g AS (SELECT 'copurchase' AS graph, count(*) AS n,
                     sum(du) AS sx, sum(dv) AS sy, sum(du*dv) AS sxy,
                     sum(du*du) AS sxx, sum(dv*dv) AS syy
              FROM p)
        SELECT graph, n,
               CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0
                    THEN NULL
                    ELSE CAST(n*sxy - sx*sy AS DOUBLE)
                       / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                        * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) END
                 AS pearson_r
        FROM g"""),
      (s, d) => {
        val edges = copurchaseEdges(s, d).barrier()
        val sym = edges.select(col("src").as("u"), col("dst").as("v"))
          .unionByName(
            edges.select(col("dst").as("u"), col("src").as("v")))
        val deg = sym.groupBy(col("u").as("w"))
          .agg(count(lit(1)).as("dg"))
          .barrier()
        val pairs = sym
          .join(broadcast(deg.select(col("w").as("u"),
            col("dg").as("du"))), Seq("u"))
          .join(broadcast(deg.select(col("w").as("v"),
            col("dg").as("dv"))), Seq("v"))
          .withColumn("graph", lit("copurchase"))
        Aggregates.groupPearson(pairs, "graph", "du", "dv")
      }))
}
