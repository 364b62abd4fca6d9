package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.BarrierOps

/** Distributed graph primitives over an edge DataFrame — the
  * structural-analysis companions to `llmops/GraphRank.pageRank` and
  * `llmops/DedupClusters` (label propagation). Used on derived graphs:
  * near-dup candidate pairs, co-occurrence edges, lineage links.
  *
  * All algorithms here are join-expressed (no driver-side adjacency),
  * exact-integer, and explicitly BOUNDED — triangle enumeration is
  * degree-capped and BFS is hop-capped — because on a 100 TB-derived
  * graph the unbounded forms are the textbook shuffle bombs: wedge
  * count grows as Σ deg², so one celebrity vertex of degree 10⁶
  * contributes 10¹² wedges on its own. The cap is part of the
  * SEMANTICS (mirrored in the oracles), not a sampling shortcut.
  */
object Graphs {

  /** Canonical undirected edge list: distinct (src < dst) pairs from
    * any directed/duplicated pair stream. One shuffle (the distinct). */
  def undirectedEdges(pairs: DataFrame, aCol: String, bCol: String)
      : DataFrame =
    pairs.select(
      least(col(aCol), col(bCol)).as("src"),
      greatest(col(aCol), col(bCol)).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** Drop every edge touching a vertex of degree > cap. Returns the
    * surviving edges. Degrees are exact (one agg over the exploded
    * endpoints); the filter is two semi-join-shaped inner joins against
    * the small surviving-vertex set. This is the standard preprocessing
    * that makes triangle/wedge enumeration linear-ish in |E| instead of
    * quadratic in the hottest degree. */
  def degreeCapped(edges: DataFrame, cap: Int): DataFrame = {
    val degs = edges.select(explode(array(col("src"), col("dst")))
        .as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= cap)
      .select(col("v"))
      .barrier()
    edges
      .join(degs.withColumnRenamed("v", "src"), Seq("src"))
      .join(degs.withColumnRenamed("v", "dst"), Seq("dst"))
      .select(col("src"), col("dst"))
  }

  /** Per-vertex triangle participation counts (vertices in ≥1 triangle
    * only). Standard ordered wedge enumeration: with edges kept as
    * (src < dst), a triangle a<b<c is found exactly once as the wedge
    * (a,b)+(b,c) closed by (a,c) — no triple counting, no orientation
    * dedup pass. Plan: two shuffle joins on vertex keys; the wedge
    * frame is bounded by Σ deg² of the CAPPED graph, which the caller
    * controls via [[degreeCapped]]. The found-triangle frame is
    * barriered once and exploded to its three corners for the
    * per-vertex counts. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).barrier()
    val wedges = e.select(col("src").as("a"), col("dst").as("b"))
      .join(e.select(col("src").as("b"), col("dst").as("c")), Seq("b"))
    val tris = wedges
      .join(e.select(col("src").as("a"), col("dst").as("c")),
        Seq("a", "c"))
      .barrier()
    tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient per vertex: 2·triangles / (deg·(deg−1))
    * — how clique-like each vertex's neighborhood is (near 1 on genuine
    * duplicate clusters, near 0 on chains of borderline matches, which
    * is exactly the q202 use reversed into a per-vertex score). Exact
    * integer numerator/denominator with ONE final division, so the
    * score itself is engine-reproducible. Vertices of degree < 2 are
    * excluded (coefficient undefined). Plan: [[triangleCounts]] + the
    * degree aggregation joined on the vertex — the triangle frame is
    * the expensive part and is computed once. */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val e = edges.barrier()
    val degs = e.select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2)
    degs.join(triangleCounts(e), Seq("v"), "left")
      .select(col("v"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        ((lit(2.0) * coalesce(col("n_triangles"), lit(0L))
          .cast("double")) /
          (col("deg") * (col("deg") - 1)).cast("double")).as("coeff"))
  }

  /** Hop-bounded multi-source BFS: minimum hop distance (≤ maxHops)
    * from any seed vertex, over undirected (src < dst) edges. Returns
    * (v, hop) for every reached vertex, seeds at hop 0.
    *
    * Unrolled frontier expansion — per hop: ONE join of the current
    * frontier against the (symmetrized) edges + ONE min-agg to dedup
    * the new frontier + an anti-join against visited. Frontier and
    * visited frames are barriered per iteration so lineage stays flat
    * (same hygiene as GraphRank / DedupClusters). maxHops is small and
    * fixed (it is part of the query semantics — "within 3 hops"), so
    * the loop is a compile-time unroll, not a convergence iteration. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int)
      : DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionByName(
        edges.select(col("dst").as("u"), col("src").as("v")))
      .barrier()
    var visited = seeds.select(col("v"), lit(0L).as("hop")).barrier()
    var frontier = visited.select(col("v"))
    for (h <- 1 to maxHops) {
      val next = sym.join(frontier.withColumnRenamed("v", "u"), Seq("u"))
        .select(col("v"))
        .distinct()
        .join(visited.select(col("v")), Seq("v"), "left_anti")
        .withColumn("hop", lit(h.toLong))
        .barrier()
      visited = visited.unionByName(next).barrier()
      frontier = next.select(col("v"))
    }
    visited
  }
}
