package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Aggregates, Graphs, Incremental, Linkage, Skew}

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
        s AS (SELECT CAST(sum(nij*(nij-1)/2) AS BIGINT) AS pairs_both,
                     CAST(sum(nij) AS BIGINT) AS n
              FROM cells),
        a AS (SELECT CAST(sum(ai*(ai-1)/2) AS BIGINT) AS pairs_a FROM
                (SELECT CAST(sum(nij) AS BIGINT) AS ai
                 FROM cells GROUP BY lang)),
        b AS (SELECT CAST(sum(bj*(bj-1)/2) AS BIGINT) AS pairs_b FROM
                (SELECT CAST(sum(nij) AS BIGINT) AS bj
                 FROM cells GROUP BY source))
        SELECT n, CAST(n*(n-1)/2 AS BIGINT) AS pairs_total,
               pairs_both, pairs_a, pairs_b,
               (CAST(n*(n-1)/2 AS DOUBLE)
                  + 2.0*CAST(pairs_both AS DOUBLE)
                  - CAST(pairs_a AS DOUBLE) - CAST(pairs_b AS DOUBLE))
                 / CAST(n*(n-1)/2 AS DOUBLE) AS rand_index,
               (CAST(pairs_both AS DOUBLE)
                  - CAST(pairs_a AS DOUBLE)*CAST(pairs_b AS DOUBLE)
                    / CAST(n*(n-1)/2 AS DOUBLE))
                 / ((CAST(pairs_a AS DOUBLE)+CAST(pairs_b AS DOUBLE))
                      / 2.0
                    - CAST(pairs_a AS DOUBLE)*CAST(pairs_b AS DOUBLE)
                      / CAST(n*(n-1)/2 AS DOUBLE)) AS ari
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
      Some("""
        WITH feeds AS (
          SELECT c_custkey, v,
                 CASE WHEN (c_custkey + v) % 3 = 0 THEN NULL
                      ELSE c_name || '#' || CAST(v AS VARCHAR)
                 END AS name,
                 CASE WHEN (c_custkey + v) % 4 = 0 THEN NULL
                      ELSE c_acctbal + v END AS acctbal,
                 CASE WHEN (c_custkey + v) % 5 = 0 THEN NULL
                      ELSE c_mktsegment END AS mktsegment
          FROM customer CROSS JOIN range(0, 3) r(v))
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
      (s, d) => {
        val feeds = t(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("c_mktsegment"),
            explode(sequence(lit(0L), lit(2L))).as("v"))
          .select(col("c_custkey"), col("v"),
            when((col("c_custkey") + col("v")) % 3 === 0, lit(null))
              .otherwise(concat(col("c_name"), lit("#"),
                col("v").cast("string"))).as("name"),
            when((col("c_custkey") + col("v")) % 4 === 0, lit(null))
              .otherwise(col("c_acctbal") + col("v")).as("acctbal"),
            when((col("c_custkey") + col("v")) % 5 === 0, lit(null))
              .otherwise(col("c_mktsegment")).as("mktsegment"))
        Linkage.goldenRecord(feeds, Seq("c_custkey"), "v",
          Seq("name", "acctbal", "mktsegment"))
      }),

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
        f AS (SELECT user_id, ts_us, value,
                     CASE WHEN ts_us - lag(ts_us) OVER
                            (PARTITION BY user_id
                             ORDER BY ts_us, event_id) < 1800000000
                          THEN 0 ELSE 1 END AS nf
              FROM e),
        n AS (SELECT user_id, ts_us, value,
                     CAST(sum(nf) OVER (PARTITION BY user_id
                       ORDER BY ts_us
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
      }))
}
