package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Checkpoints.BarrierOps
import graft.ops.Graphs

/** The dedup pre-flight suite as ONE job: before trusting an LSH +
  * connected-components dedup pass over a new corpus (or a new corpus
  * VERSION), run the three measurements that validate its assumptions
  * and emit them as a single long-format report frame:
  *
  *  - `lsh_recall` — recall of the MinHash-LSH candidate set against
  *    the exact n-gram-Jaccard truth, per true-Jaccard band (q180's
  *    S-curve): is the banding catching the dups you care about?
  *  - `transitivity` — global clustering coefficient of the candidate
  *    graph (q226): are buckets genuine duplicate cliques (safe to
  *    glue with components) or chains of accidental collisions?
  *  - `simhash_hamming` — 60-bit Hamming histograms of true dup pairs
  *    vs bucket-sampled background pairs (q229): where to set a
  *    SimHash threshold, read off the measured two-curve gap.
  *
  * This is deliberately the EXPENSIVE verification-grade path (it
  * runs the exact pair join the production pipeline exists to avoid)
  * — an audit you run once per corpus release on a sample, not per
  * batch. Every section reuses the oracled operators (q41/q43/q180/
  * q226/q229 semantics, same caps and determinism contract); the
  * shared truth and candidate frames are barriered once. */
object DedupAudit {

  /** Long-format report: (section, dim, n, value). `bgBuckets` sizes
    * the background-pair sampler (expected n²/bgBuckets pairs — grow
    * it ∝ corpus size; 16 matches the q229 oracle at test scale). */
  def report(docs0: DataFrame, idCol: String, textCol: String,
      bgBuckets: Long = 16L): DataFrame = {
    // exact-dedup-first, structurally (TextOps.exactDedupFirst): the
    // audit measures the LSH route's behavior on the corpus that
    // route actually sees — byte-identical mass collapsed to keepers
    val docs = TextOps.exactDedupFirst(docs0, idCol, textCol).barrier()
    val truth = TextOps.ngramJaccardPairs(docs, idCol, textCol,
      minJac = 0.2, maxDf = 1000).barrier()
    val cand = TextOps.lshCandidatePairs(
      TextOps.minhashSignatures(docs, idCol, textCol), idCol)
      .barrier()

    // q180: per-band recall of the candidate set vs truth
    val recall = truth
      .join(cand.withColumn("hit", lit(1)), Seq("doc_a", "doc_b"),
        "left")
      .select(
        when(col("jac") >= 0.8, "[0.8,1.0]")
          .when(col("jac") >= 0.6, "[0.6,0.8)")
          .when(col("jac") >= 0.4, "[0.4,0.6)")
          .otherwise("[0.2,0.4)").as("dim"),
        coalesce(col("hit"), lit(0)).as("caught"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        (sum(col("caught")).cast("double") /
          count(lit(1)).cast("double")).as("value"))
      .select(lit("lsh_recall").as("section"), col("dim"), col("n"),
        col("value"))

    // q226: transitivity of the candidate graph
    val e = cand.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .distinct().barrier()
    val wedges = e
      .select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      .agg(sum(shiftright(col("deg") * (col("deg") - 1), 1))
        .cast("long").as("n_wedges"))
    val tris = Graphs.triangleCounts(e)
      .agg(coalesce((sum(col("n_triangles")) / 3).cast("long"),
        lit(0L)).as("t"))
    val transitivity = tris.crossJoin(broadcast(wedges))
      .select(lit("transitivity").as("section"),
        lit("global").as("dim"), col("t").as("n"),
        when(col("n_wedges") > 0,
          lit(3.0) * col("t").cast("double") /
            col("n_wedges").cast("double"))
          .otherwise(lit(0.0)).as("value"))

    // q229: dup vs background Hamming histogram (value = band floor).
    // bgBuckets parameterizes the sampler (scale knob — grows with
    // the corpus; TextOps.backgroundPairSample's scaladoc).
    val sh = TextOps.simhash60(docs, idCol, textCol).barrier()
    val bg = TextOps.backgroundPairSample(docs, idCol, bgBuckets)
    val pr = truth.filter(col("jac") >= 0.5)
      .select(col("doc_a"), col("doc_b"), lit("dup").as("label"))
      .unionByName(bg.select(col("doc_a"), col("doc_b"),
        lit("background").as("label")))
    val hamming = TextOps.hammingForPairs(pr, sh, idCol, "simhash")
      .select(col("label"),
        expr("CAST((hamming div 4) * 4 AS BIGINT)").as("ham_lo"))
      .groupBy(col("label"), col("ham_lo"))
      .agg(count(lit(1)).as("n"))
      .select(lit("simhash_hamming").as("section"),
        concat(col("label"), lit("@"), col("ham_lo")).as("dim"),
        col("n"), col("ham_lo").cast("double").as("value"))

    recall.unionByName(transitivity).unionByName(hamming)
  }

  /** Theoretical LSH banding planner — the S-curve design step that
    * precedes every [[report]] run: for each factorization
    * bands · rpb = sigLen and each similarity s on the 1/sGridDen
    * grid, the candidate-collision probability
    * p(s) = 1 − (1 − s^rpb)^bands, plus per (bands, rpb) the
    * smallest grid s with p ≥ ½ — the banding's effective threshold
    * (NULL when the curve never crosses ½ on the grid, e.g. one
    * 64-row band). Pure dimension table: corpus-free, so choosing
    * the banding for a 100 TB pass costs nothing. Powers fold by
    * ordered repeated multiplication — libm pow is not cross-engine
    * reproducible, left-fold products are.
    * Returns (bands, rpb, s, p_collide, s50). */
  def lshPlanCurve(spark: SparkSession, sigLen: Int, sGridDen: Int)
      : DataFrame = {
    require(sigLen >= 1 && sGridDen >= 2,
      s"lshPlanCurve: sigLen=$sigLen sGridDen=$sGridDen")
    val factors = (1 to sigLen).filter(sigLen % _ == 0)
      .map(b => (b, sigLen / b))
    val fac = spark.createDataFrame(factors).toDF("bands", "rpb")
    val sg = spark.range(1, sGridDen).select(
      (col("id").cast("double") / lit(sGridDen.toDouble)).as("s"))
    val curve = fac.crossJoin(sg)
      .withColumn("sr", aggregate(sequence(lit(1), col("rpb")),
        lit(1.0), (acc, _) => acc * col("s")))
      .withColumn("p_collide",
        lit(1.0) - aggregate(sequence(lit(1), col("bands")),
          lit(1.0), (acc, _) => acc * (lit(1.0) - col("sr"))))
      .drop("sr")
    curve.join(
      curve.groupBy(col("bands"), col("rpb"))
        .agg(min(when(col("p_collide") >= 0.5, col("s"))).as("s50")),
      Seq("bands", "rpb"))
  }
}
