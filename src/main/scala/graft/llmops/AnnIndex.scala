package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.BarrierOps

/** End-to-end ANN index build + search + audit — the composition of
  * the oracled primitives q62/q63 (IVF k-means), q64 (PQ encode),
  * q66 (ADC search) and q161's recall-audit shape into ONE lake job
  * (`JobRunner` registry: `ann_index`): a single CLI invocation
  * trains the coarse quantizer, encodes the corpus, persists the
  * index artifacts, searches a deterministic query sample, and
  * reports recall against exact brute force.
  *
  * Scale shape (unchanged from the parts, SCALE.md's ANN family):
  * centroids and codebooks are k-row broadcasts; training assignment
  * and PQ encode are narrow maps over the corpus; each Lloyd round
  * barriers (localCheckpoint) so the iterative plan stays O(1) deep;
  * the ADC search touches the corpus only through its m-byte codes.
  * Everything deterministic: seeds are the smallest ids, every argmin
  * tie-breaks on id, double sums fold in sorted order. */
object AnnIndex {

  /** IVF coarse-quantizer training: seed centroids = the `kCells`
    * smallest-id vectors (deterministic, the q62 convention), then
    * `iters` Lloyd rounds of [[Similarity.kmeansAssign]] +
    * [[Similarity.kmeansUpdate]], re-assembling each round's
    * (cell, dim, mean) rows into centroid vectors by dim-sorted fold.
    * A cell that loses all members drops out (standard k-means
    * degeneracy; the remaining cells stay valid). */
  def trainCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      kCells: Int, iters: Int): DataFrame = {
    require(kCells >= 1 && iters >= 0,
      s"trainCentroids: kCells=$kCells iters=$iters")
    var cents = vecs.orderBy(col(idCol)).limit(kCells)
      .select(col(idCol).cast("long").as("cell"),
        col(vecCol).as("cvec"))
      .barrier()
    for (_ <- 0 until iters) {
      val assigned = Similarity.kmeansAssign(vecs, idCol, vecCol,
        cents, "cell", "cvec")
      cents = Similarity.kmeansUpdate(assigned, vecs, idCol, vecCol)
        .groupBy(col("cell"))
        .agg(expr("transform(sort_array(collect_list(" +
          "struct(dim, mean_x))), s -> s.mean_x)").as("cvec"))
        .barrier() // per-round barrier: iterative plan stays O(1)
    }
    cents
  }

  /** PQ codebook by the q64 convention: the `kCodes` smallest-id
    * vectors' subvectors, (subspace, code, cvec). */
  def pqCodebook(vecs: DataFrame, idCol: String, vecCol: String,
      kCodes: Int, m: Int, dim: Int): DataFrame = {
    val sub = dim / m
    vecs.orderBy(col(idCol)).limit(kCodes)
      .select(col(idCol).as("code"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(col(vecCol), j * sub + lit(1), lit(sub))))
          .as(Seq("subspace", "cvec")))
  }

  /** Exact brute-force top-k by SQUARED L2 — the ground truth in the
    * same metric the ADC search ranks by (q161 audits the cosine
    * route; ADC is L2). Queries broadcast. */
  def bruteL2TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("cand_id"))
    c.join(q, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        Similarity.sqDist(col("qv"), col("cv")).as("d2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** The whole job: train → encode → persist index artifacts under
    * `dest` (centroids / assignments / codebook / codes / topk) →
    * search the `nQueries` smallest-id vectors → return the per-query
    * recall audit (query_id, n_overlap, recall) of ADC vs exact L2 —
    * the summary frame the CLI writes to `--out`. */
  def buildSearchReport(vecs0: DataFrame, idCol: String,
      vecCol: String, kCells: Int, iters: Int, m: Int, dim: Int,
      kNn: Int, nQueries: Int, dest: String): DataFrame = {
    val vecs = vecs0.barrier() // feeds train, encode, search, truth
    val cents = trainCentroids(vecs, idCol, vecCol, kCells, iters)
    val assigned = Similarity.kmeansAssign(vecs, idCol, vecCol, cents,
      "cell", "cvec")
    val codebook = pqCodebook(vecs, idCol, vecCol, kCodes = kCells,
      m = m, dim = dim).barrier() // feeds encode AND both searches
    val codes = Similarity.pqEncode(vecs, idCol, vecCol, codebook,
      m = m, dim = dim).drop("err").barrier()
    cents.write.mode("overwrite").parquet(s"$dest/centroids")
    assigned.write.mode("overwrite").parquet(s"$dest/assignments")
    codebook.write.mode("overwrite").parquet(s"$dest/codebook")
    codes.write.mode("overwrite").parquet(s"$dest/codes")
    val queries = vecs.orderBy(col(idCol)).limit(nQueries).barrier()
    val approx = Similarity.pqSearchADC(queries, codes, codebook,
      idCol, vecCol, m = m, dim = dim, k = kNn).barrier()
    approx.write.mode("overwrite").parquet(s"$dest/topk")
    val brute = bruteL2TopK(queries, vecs, idCol, vecCol, kNn)
    brute
      .join(approx.select(col("query_id"), col("cand_id"),
          lit(1).as("hit")),
        Seq("query_id", "cand_id"), "left")
      .groupBy(col("query_id"))
      .agg(coalesce(sum(col("hit")), lit(0)).cast("long")
        .as("n_overlap"))
      .select(col("query_id"), col("n_overlap"),
        (col("n_overlap").cast("double") / lit(kNn.toDouble))
          .as("recall"))
  }
}
