package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `Array[Float]` columns.
  *
  * Precision contract: dot products fold LEFT-TO-RIGHT in double via the
  * `aggregate` higher-order function — bit-identical to any engine that
  * folds a list sequentially (float→double is exact; float×float in
  * double is exact at 24+24 < 53 mantissa bits). Cosines are ranked on
  * their 6-dp rounding with the candidate id as total tie-break, so
  * top-k is engine-reproducible.
  *
  * Scale shape: brute force is the correctness baseline (queries
  * broadcast against the corpus — one narrow map per corpus row, no
  * shuffle); the IVF and hyperplane-LSH variants are the 100 TB path —
  * they cut the candidate set by a partition-prunable cell/bucket key
  * before the same scoring kernel runs.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Self dot product (squared L2 norm). */
  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity, UNROUNDED: every op is IEEE arithmetic on
    * identical operands, so the value is bit-exact in any engine —
    * rounding would only introduce half-tie divergence. A zero-norm
    * operand yields 0 by definition here: under ANSI mode (Spark 4
    * default) the unguarded division THROWS on the first all-zero
    * vector — one degenerate embedding must not kill a corpus-scale
    * job. Prefer the precomputed-norm overload in joins: this form
    * re-folds both norms for every pair. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, norm2(a), norm2(b))

  /** Cosine from a pair dot and precomputed squared norms — O(dim) per
    * pair instead of O(3·dim). Zero-norm guard as in [[cosine]]. */
  def cosineWithNorms(a: Column, b: Column, n2a: Column,
      n2b: Column): Column =
    when(n2a === 0.0 || n2b === 0.0, lit(0.0))
      .otherwise(dot(a, b) / (sqrt(n2a) * sqrt(n2b)))

  /** Rank scored pairs: top-k per query by (cosine desc, id). */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.select(col("query_id"), col("cand_id"), col("cos_sim"),
      row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  /** Hard-negative triplet mining for contrastive embedding training:
    * per query, the top-ranked neighbor is the POSITIVE and ranks
    * `skip+1 .. skip+kNeg` are the hard negatives — similar enough to
    * be informative, ranked on the same deterministic
    * (cosine desc, id) total order as every search in this engine, so
    * the mined training set is byte-reproducible across runs and
    * engines (random negative sampling is not, and easy random
    * negatives teach the model nothing). One scored pass + one window
    * + a per-query self-join of k+1 narrow rows. */
  def hardNegativeTriplets(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, kNeg: Int = 3, skip: Int = 5)
      : DataFrame = {
    // the ranking IS bruteForceTopK's — one scoring kernel, so a fix
    // to the zero-norm guard or tie-break there cannot diverge from
    // the triplets mined here
    val ranked = bruteForceTopK(queries, corpus, idCol, vecCol,
      skip + kNeg)
    val pos = ranked.filter(col("rk") === 1)
      .select(col("query_id"), col("cand_id").as("pos_id"),
        col("cos_sim").as("pos_cos"))
    val negs = ranked.filter(col("rk") > skip)
      .select(col("query_id"), col("cand_id").as("neg_id"),
        col("cos_sim").as("neg_cos"), col("rk").as("neg_rank"))
    pos.join(negs, Seq("query_id"))
  }

  /** Brute-force top-k: for each row of `queries` (small, broadcast),
    * score every corpus row, keep k by (cosine desc, id). Excludes
    * self-matches on equal ids. Norms are computed once per vector in
    * the projections, not per pair. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm2(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      norm2(col(vecCol)).as("cn"))
    topK(c.join(q, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn"))
          .as("cos_sim")), k)
  }

  /** Maximal Marginal Relevance: diversified top-`k` — greedily pick
    * the candidate maximizing `λ·rel − (1−λ)·max_{s∈S} cos(c, s)`
    * over the already-selected set S, from a relevance-ranked pool of
    * `poolSize` per query ([[bruteForceTopK]]'s total order). The
    * selection a RAG context builder or a diverse-coreset sampler
    * wants: near-duplicate candidates can't fill the whole window.
    * Step 1 has an empty S — its score is λ·rel by the same formula
    * (the diversity term is vacuously 0), so one expression covers
    * every step and the oracle can unroll it verbatim.
    *
    * Deterministic end-to-end: pool ranks and pairwise cosines ride
    * the sequential-fold dot kernel, max over S is order-free, each
    * argmax tiebreaks on cand_id, and the interpolation literals are
    * computed identically in both engines (`1.0 − λ` in DOUBLE, never
    * a pre-rounded constant). Greedy selection is inherently
    * sequential in k — each of the k rounds is an aggregation + one
    * window over frames bounded by #queries × poolSize, barriered per
    * round (the IPF discipline), so iteration cost is independent of
    * corpus size; the corpus-sized work all lives in the audited
    * pool scoring pass.
    *
    * Output: (query_id, cand_id, step 1..k, mmr_score). Queries whose
    * pool holds fewer than k candidates emit fewer steps. */
  def mmrTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = 5, poolSize: Int = 20,
      lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && poolSize >= k,
      s"mmrTopK: k=$k poolSize=$poolSize")
    require(lambda >= 0.0 && lambda <= 1.0, s"mmrTopK: lambda=$lambda")
    import graft.core.Checkpoints.BarrierOps
    // the pool feeds every selection round — one scoring pass
    val pool = bruteForceTopK(queries, corpus, idCol, vecCol, poolSize)
      .select(col("query_id"), col("cand_id"), col("cos_sim").as("rel"))
      .barrier()
    // restrict to pool members BEFORE computing norms: norm2 is a
    // full-vector fold, and projecting it on the corpus side of the
    // join would add a second corpus-wide pass on top of the audited
    // pool scan — here it runs on ≤ #queries × poolSize rows
    val vecs = corpus.select(col(idCol).as("cand_id"),
      col(vecCol).as("v"))
    val pa = pool.select(col("query_id"), col("cand_id"))
      .join(vecs, Seq("cand_id"))
      .select(col("query_id"), col("cand_id"), col("v"),
        norm2(col("v")).as("n2"))
    val pb = pa.select(col("query_id"), col("cand_id").as("b"),
      col("v").as("vb"), col("n2").as("n2b"))
    // pairwise cosines within each query's pool (both orientations;
    // ≤ #queries × poolSize² rows) — consumed once per round
    val sims = pa.join(pb, Seq("query_id"))
      .filter(col("cand_id") =!= col("b"))
      .select(col("query_id"), col("cand_id"), col("b"),
        cosineWithNorms(col("v"), col("vb"), col("n2"), col("n2b"))
          .as("sim"))
      .barrier()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    def pick(scored: DataFrame, step: Int): DataFrame =
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("query_id"), col("cand_id"),
          lit(step).as("step"), col("score").as("mmr_score"))
    // round 1 ranks by REL (the oracle's order), not by fl(λ·rel):
    // multiplication by λ is not strictly monotone in IEEE double —
    // adjacent-double rels can collapse to one λ·rel value and the
    // id tiebreak would then pick the LOWER-rel candidate, diverging
    // from any engine that ranks pre-multiplication (and λ = 0 would
    // degenerate to id order entirely); λ·rel is emitted as the
    // score but the selection order is relevance
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("cand_id"))
    val first = pool.withColumn("rk", row_number().over(w1))
      .filter(col("rk") === 1)
      .select(col("query_id"), col("cand_id"), lit(1).as("step"),
        (lit(lambda) * col("rel")).as("mmr_score"))
    (2 to k).foldLeft(first.barrier()) { (sel, step) =>
      val selIds = sel.select(col("query_id"), col("cand_id"))
      val scored = pool
        .join(selIds, Seq("query_id", "cand_id"), "left_anti")
        .join(selIds.select(col("query_id"), col("cand_id").as("b")),
          Seq("query_id"))
        .join(sims, Seq("query_id", "cand_id", "b"))
        .groupBy(col("query_id"), col("cand_id"), col("rel"))
        .agg(max(col("sim")).as("mx"))
        .select(col("query_id"), col("cand_id"),
          (lit(lambda) * col("rel") -
            (lit(1.0) - lit(lambda)) * col("mx")).as("score"))
      sel.unionByName(pick(scored, step)).barrier()
    }
  }

  /** Two-stage truncated-dimension search (the Matryoshka / PCA-prefix
    * pattern): stage 1 scores every corpus row on only the FIRST
    * `dPrefix` dims and keeps `m` coarse candidates per query; stage 2
    * reranks exactly those candidates with the full-dimension cosine
    * and keeps `k`. Fully deterministic — both stages rank on
    * sequential-fold doubles with the candidate id as tie-break — so
    * the result is engine-reproducible end to end (unlike recall-based
    * ANN contracts).
    *
    * Scale shape: the corpus-wide work is the stage-1 scan, which
    * reads `dPrefix/dim` of the vector bytes when the prefix is stored
    * as its own column (store it that way at 100 TB — parquet column
    * pruning then skips the full vectors entirely), and the stage-1
    * window shuffles only (query_id, cand_id, score) narrow rows,
    * never vectors. Stage 2 touches full vectors for exactly
    * `#queries × m` rows: the candidate list is broadcast back
    * against the corpus as a semi-join, so the 100 TB side is scanned
    * once per stage and never shuffled. */
  def twoStageTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dPrefix: Int, m: Int, k: Int): DataFrame = {
    require(m >= k, s"rerank pool m=$m must be >= k=$k")
    val pre = slice(col(vecCol), 1, dPrefix)
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      pre.as("qp"), norm2(pre).as("qpn")))
    val c = corpus.select(col(idCol).as("cand_id"), pre.as("cp"),
      norm2(pre).as("cpn"))
    val coarse = topK(c.join(q, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        cosineWithNorms(col("qp"), col("cp"), col("qpn"), col("cpn"))
          .as("cos_sim")), m)
      .select(col("query_id"), col("cand_id"))
    val qf = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm2(col(vecCol)).as("qn")))
    val cf = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      norm2(col(vecCol)).as("cn"))
    topK(cf.join(broadcast(coarse), Seq("cand_id"))
      .join(qf, Seq("query_id"))
      .select(col("query_id"), col("cand_id"),
        cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn"))
          .as("cos_sim")), k)
  }

  /** IVF-style cell-restricted top-k: candidates share the query's
    * `cellCol` (the coarse quantizer cell — at scale, the partition
    * key of the vector store, so the scan prunes to one cell). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, cellCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm2(col(vecCol)).as("qn"),
      col(cellCol).as("cell")))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      norm2(col(vecCol)).as("cn"), col(cellCol).as("cell"))
    topK(c.join(q, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn"))
          .as("cos_sim")), k)
  }

  /** Deterministic pseudo-random hyperplane j (j ≥ 0) of dimension
    * `dim`: small signed ints from a fixed congruence — reproducible in
    * any engine, no RNG state. */
  def hyperplane(j: Int, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => ((lit(17 * (j + 1)) * (i + lit(3)) + lit(7)) % 19 - lit(9))
        .cast("double"))

  /** Sign-random-projection LSH bucket id over `nBits` hyperplanes:
    * bit j = [dot(v, r_j) > 0], bucket = Σ 2^j bit_j. A narrow map —
    * at scale this is the write-time partition key of the ANN index. */
  def lshBucket(vec: Column, nBits: Int, dim: Int): Column = {
    val bits = (0 until nBits).map { j =>
      when(aggregate(
        zip_with(vec, hyperplane(j, dim), (x, r) => x.cast("double") * r),
        lit(0.0), (acc, v) => acc + v) > 0, 1L << j).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN top-k: candidates share the query's bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, nBits: Int, dim: Int, k: Int): DataFrame = {
    val withBucket = (d: DataFrame, id: String, v: String, n: String) =>
      d.select(col(idCol).as(id), col(vecCol).as(v),
        norm2(col(vecCol)).as(n),
        lshBucket(col(vecCol), nBits, dim).as("bucket"))
    val q = broadcast(withBucket(queries, "query_id", "qv", "qn"))
    val c = withBucket(corpus, "cand_id", "cv", "cn")
    topK(c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        cosineWithNorms(col("qv"), col("cv"), col("qn"), col("cn"))
          .as("cos_sim")), k)
  }

  /** Embedding near-duplicate pairs within a cell: all (a < b) pairs
    * sharing `cellCol` with cosine ≥ threshold. The cell key bounds the
    * quadratic blowup — the same pruning an IVF index gives at scale.
    * Norms fold once per vector before the join. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      cellCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(cellCol).as("cell"), col(idCol).as("id_a"),
      col(vecCol).as("va"), norm2(col(vecCol)).as("na"))
    val b = df.select(col(cellCol).as("cell"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), norm2(col(vecCol)).as("nb"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineWithNorms(col("va"), col("vb"), col("na"), col("nb"))
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** SemDeDup-style semantic dedup over an embedding column: within
    * each cell, a vector survives iff NO earlier vector (smaller id) in
    * the same cell has cosine > `threshold` to it. The first-occurrence
    * rule is the same deterministic tie-break C4-style segment dedup
    * uses (q84): it needs no transitive closure, no iteration, and two
    * engines can agree on it exactly — unlike greedy cluster picking,
    * whose result depends on visit order.
    *
    * Plan shape: the cell key bounds the pair join exactly as in
    * [[nearDupPairs]] (an IVF cell from [[kmeansAssign]] or an LSH
    * bucket from [[lshBucket]] — any partition-prunable cell works);
    * norms fold once per vector before the join; the survivor test is
    * one distinct-project of the dropped side + a broadcast-able
    * left join back. Returns every input row with its cell and a
    * `kept` flag, so callers can either filter or audit drop rates. */
  def semdedupKeep(df: DataFrame, idCol: String, vecCol: String,
      cellCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(cellCol).as("cell"), col(idCol).as("id_a"),
      col(vecCol).as("va"), norm2(col(vecCol)).as("na"))
    val b = df.select(col(cellCol).as("cell"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), norm2(col(vecCol)).as("nb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_b") < col("id_a"))
      .filter(cosineWithNorms(col("va"), col("vb"), col("na"),
        col("nb")) > threshold)
      .select(col("id_a").as("drop_id"))
      .distinct()
    df.select(col(idCol), col(cellCol))
      .join(dropped, col(idCol) === col("drop_id"), "left")
      .select(col(idCol), col(cellCol),
        col("drop_id").isNull.as("kept"))
  }

  /** Sequential-fold squared L2 distance (same precision contract as
    * [[dot]] — bit-exact cross-engine). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** IVF index training, assignment step (one Lloyd iteration half):
    * every vector goes to its nearest centroid by squared L2, ties
    * broken by centroid id. `centroids` is (cell, vec) — k rows,
    * broadcast; the scan side is one narrow map per vector × k, no
    * shuffle until the caller aggregates. */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cellCol: String, centVecCol: String)
      : DataFrame = {
    val scored = df
      .crossJoin(broadcast(
        centroids.select(col(cellCol).as("cell"),
          col(centVecCol).as("cvec"))))
      .select(col(idCol), col("cell"),
        sqDist(col(vecCol), col("cvec")).as("d2"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("d2"), col("cell"))
    scored.select(col(idCol), col("cell"), col("d2"),
      row_number().over(w).as("rk"))
      .filter(col("rk") === 1)
      .drop("rk")
  }

  /** Product quantization encode: split each vector into `m` equal
    * subvectors; per subspace, assign the subvector to its nearest
    * codeword by squared L2 (tie-break on code id). `codebooks` is
    * (subspace, code, cvec) with subvectors of dim/m values —
    * broadcast (m·k rows). Output: one row per (vector, subspace) with
    * the chosen code and its quantization error — 8 bits/subspace
    * instead of 4·dim bytes, the memory layer under IVF-PQ ANN
    * indexes. Same narrow-map shape as [[kmeansAssign]]: no shuffle
    * until the caller aggregates codes. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    val sub = dim / m
    val subvecs = df.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col(vecCol), j * sub + lit(1), lit(sub))))
        .as(Seq("subspace", "sv")))
    val scored = subvecs
      .join(broadcast(codebooks), Seq("subspace"))
      .select(col(idCol), col("subspace"), col("code"),
        sqDist(col("sv"), col("cvec")).as("err"))
    val w = Window.partitionBy(col(idCol), col("subspace"))
      .orderBy(col("err"), col("code"))
    scored.select(col(idCol), col("subspace"), col("code"), col("err"),
      row_number().over(w).as("rk"))
      .filter(col("rk") === 1)
      .drop("rk")
  }

  /** PQ asymmetric-distance search (ADC): approximate nearest
    * neighbors over PQ CODES. Per query, a lookup table of
    * query-subvector→codeword distances is built (queries × m × k
    * rows — tiny, broadcast); the corpus is then touched only through
    * its codes — one broadcast join + one aggregation, never the raw
    * vectors. This is the IVF-PQ search path: at 100 TB the codes are
    * 8 bytes/vector instead of 256, and the scan is code-only.
    * The per-pair distance sums its m subspace entries in SUBSPACE
    * ORDER (sorted fold) so the double total is engine-deterministic. */
  def pqSearchADC(queries: DataFrame, codes: DataFrame,
      codebooks: DataFrame, idCol: String, vecCol: String, m: Int,
      dim: Int, k: Int): DataFrame = {
    val sub = dim / m
    val qsub = queries.select(col(idCol).as("query_id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
        j => slice(col(vecCol), j * sub + lit(1), lit(sub))))
        .as(Seq("subspace", "qsv")))
    val lut = qsub
      .join(codebooks, Seq("subspace"))
      .select(col("query_id"), col("subspace"), col("code"),
        sqDist(col("qsv"), col("cvec")).as("d2"))
    val scored = codes
      .join(broadcast(lut), Seq("subspace", "code"))
      .filter(col(idCol) =!= col("query_id"))
      .groupBy(col("query_id"), col(idCol).as("cand_id"))
      .agg(
        aggregate(
          transform(
            sort_array(collect_list(struct(col("subspace"), col("d2")))),
            s => s.getField("d2")),
          lit(0.0), (acc, v) => acc + v).as("approx_d2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d2"), col("cand_id"))
    scored.select(col("query_id"), col("cand_id"), col("approx_d2"),
      row_number().over(w).as("rk"))
      .filter(col("rk") <= k)
  }

  /** IVF index training, update step: per-(cell, dimension) mean of
    * the assigned vectors. Sums fold over the members SORTED BY ID
    * (`sort_array(collect_list(...))` + sequential fold), so the
    * double sum is order-deterministic and engine-reproducible —
    * a plain `avg` over shuffled doubles is not. Cell populations
    * bound the collect buffer (IVF cells are sized ~corpus/k by
    * construction; k-means rebalances outliers in later rounds). */
  def kmeansUpdate(assigned: DataFrame, df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val byDim = assigned.select(col(idCol), col("cell"))
      .join(df.select(col(idCol), col(vecCol).as("v")), Seq(idCol))
      .select(col(idCol), col("cell"),
        posexplode(col("v")).as(Seq("dim", "x")))
      .select(col(idCol), col("cell"), (col("dim") + 1).as("dim"),
        col("x").cast("double").as("x"))
    byDim
      .groupBy(col("cell"), col("dim"))
      .agg(
        aggregate(
          transform(
            sort_array(collect_list(struct(col(idCol), col("x")))),
            s => s.getField("x")),
          lit(0.0), (acc, v) => acc + v).as("sum_x"),
        count(lit(1)).as("n"))
      .select(col("cell"), col("dim"),
        (col("sum_x") / col("n")).as("mean_x"))
  }

  /** Background-similarity histogram from hash-bucket-sampled pairs:
    * the distribution of cosines between (approximately) random vector
    * pairs — the corpus-geometry diagnostic that calibrates a near-dup
    * threshold (where does the random-pair mass end and the duplicate
    * tail begin?) without touching the O(n²) pair space.
    *
    * Sampling is an EQUI-join on `hash60(id)%buckets` — each pair
    * survives iff both ends land in the same bucket (expected n²/B
    * pairs, deterministic, reproducible in the oracle) — never a
    * cross join with a filter, which would still evaluate all n²
    * pairs. Bins are the 10 dyadic [−1,1] slices (floor((cos+1)·5)),
    * zero-filled so the histogram schema is stable. */
  def bucketPairHistogram(df: DataFrame, idCol: String, vecCol: String,
      buckets: Int): DataFrame = {
    val tagged = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm2(col(vecCol)).as("nn"),
      pmod(TextOps.hash60(concat(col(idCol).cast("string"),
        lit(":pb"))), lit(buckets.toLong)).as("bk"))
    val pairs = tagged.as("a")
      .join(tagged.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(cosineWithNorms(col("a.v"), col("b.v"),
        col("a.nn"), col("b.nn")).as("cos"))
    // clamp BOTH ends: fp arithmetic can put a near-antipodal cosine
    // an epsilon below −1, whose unclamped bin (−1) would silently
    // vanish from the spine join and understate the pair count
    val hist = pairs
      .select(greatest(least(floor((col("cos") + 1.0) * 5.0),
        lit(9.0)), lit(0.0)).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_pairs"))
    // dense 10-bin spine so empty bins surface as zeros
    val spine = df.sparkSession.range(0, 10)
      .select(col("id").as("bin"))
    spine.join(hist, Seq("bin"), "left")
      .select(col("bin"),
        (col("bin").cast("double") / 5.0 - 1.0).as("cos_lo"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
  }

  /** Hubness profile: how often each corpus vector appears in the
    * top-k lists of the query sample — the high-dimensional pathology
    * check for ANN indexes (hub vectors show up in everyone's
    * neighborhood and poison both recall metrics and dedup clustering;
    * antihubs never appear). Returns vectors occurring in ≥ 2 lists
    * with occurrence and rank-1 counts. The cost is the
    * [[bruteForceTopK]] sample itself; the profile is one tiny
    * aggregation of its nQueries×k output. */
  def hubnessProfile(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    bruteForceTopK(queries, corpus, idCol, vecCol, k)
      .groupBy(col("cand_id"))
      .agg(count(lit(1)).as("n_occ"),
        graft.ops.Aggregates.countIf(col("rk") === 1).as("n_top1"))
      .filter(col("n_occ") >= 2)

  /** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 — the
    * CCMatrix/LASER recipe): mine aligned cross-corpus pairs between
    * two embedding sides by RATIO margin rather than raw cosine, which
    * corrects for hubness — a vector whose neighborhood is uniformly
    * hot scores no margin. Pipeline, all inside shared LSH cells:
    *
    *  1. candidates = cross-side pairs sharing an [[lshBucket]] cell
    *     (the same partition-prunable key the ANN index writes at
    *     scale — mining is always run shard-approximate, never exact);
    *  2. per side, each vector's k-NN cosine sum over ITS candidates
    *     (rank order (cos desc, id) — the sum folds in rank order, so
    *     the double is bit-reproducible);
    *  3. margin(x,y) = cos(x,y) / ((sumK(x)+sumK(y)) / 2k), the
    *     paper's "ratio" criterion; a non-positive denominator (all-
    *     negative neighborhoods) pins margin to 0 — deterministic and
    *     ANSI-safe instead of a division blow-up;
    *  4. keep pairs that are each other's best margin (mutual argmax,
    *     tie-broken by partner id) with margin ≥ `minMargin`.
    *
    * Plan shape at 100 TB: one narrow map per side for norms+bucket,
    * one equi-join on the cell key (never cartesian), two windows and
    * two aggregations all partitioned by vector id and bounded by
    * cell occupancy. Returns (id_a, id_b, cos_sim, margin). */
  def bitextMarginMine(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, nBits: Int, dim: Int, k: Int,
      minMargin: Double): DataFrame = {
    require(k >= 1, s"bitextMarginMine: k=$k must be >= 1")
    val side = (d: DataFrame, id: String, v: String, n: String) =>
      d.select(col(idCol).as(id), col(vecCol).as(v),
        norm2(col(vecCol)).as(n),
        lshBucket(col(vecCol), nBits, dim).as("bucket"))
    val cand = side(a, "id_a", "va", "na")
      .join(side(b, "id_b", "vb", "nb"), Seq("bucket"))
      .select(col("id_a"), col("id_b"),
        cosineWithNorms(col("va"), col("vb"), col("na"), col("nb"))
          .as("cos_sim"))
    // Exchange-frugal staging: each side's k-NN rank window, its sum
    // aggregation, and the join back all share ONE hash partitioning
    // on that side's id, with the ranked candidate table BARRIERED —
    // it feeds both the sum aggregation and the join back, and the
    // barrier is exactly the candidate-materialization point a real
    // mining pipeline persists anyway. The mutual-argmax windows run
    // id_b first — right after the id_b stage — so only the final
    // id_a window pays a fresh exchange.
    import graft.core.Checkpoints.BarrierOps
    def withKnnSum(df: DataFrame, id: String, other: String,
        out: String) = {
      val w = Window.partitionBy(col(id))
        .orderBy(col("cos_sim").desc, col(other))
      val rn = df.withColumn("rn", row_number().over(w)).barrier()
      rn.join(
        rn.filter(col("rn") <= k)
          .groupBy(col(id))
          .agg(graft.ops.Aggregates
            .orderedSum(col("rn"), col("cos_sim")).as(out)),
        Seq(id))
        .drop("rn")
    }
    val denom = (col("s_a") + col("s_b")) / lit(2.0 * k)
    val mg = withKnnSum(withKnnSum(cand, "id_a", "id_b", "s_a"),
        "id_b", "id_a", "s_b")
      .withColumn("margin",
        when(col("s_a") + col("s_b") <= 0.0, lit(0.0))
          .otherwise(col("cos_sim") / denom))
    val wb = Window.partitionBy(col("id_b"))
      .orderBy(col("margin").desc, col("id_a"))
    val wa = Window.partitionBy(col("id_a"))
      .orderBy(col("margin").desc, col("id_b"))
    mg.withColumn("rmb", row_number().over(wb))
      .withColumn("rma", row_number().over(wa))
      .filter(col("rma") === 1 && col("rmb") === 1 &&
        col("margin") >= minMargin)
      .select(col("id_a"), col("id_b"), col("cos_sim"), col("margin"))
  }

  /** Simplified silhouette over an IVF/k-means centroid assignment
    * (the centroid-distance form of Rousseeuw's silhouette —
    * per-point pair distances would be quadratic): per vector,
    * a = distance to its nearest centroid (its cell), b = distance
    * to the second-nearest, s = (b − a)/max(a, b) ∈ [0, 1] under
    * nearest-assignment (0-pinned when the vector sits ON two
    * coincident centroids). Per cell: count, id-ordered mean, min,
    * max — the index-quality audit read before trusting IVF recall:
    * cells with mean_sil near 0 sit on cell boundaries and leak
    * neighbors at probe time.
    *
    * `centroids` must have ≥ 2 rows (b is undefined otherwise); it
    * broadcasts, so the candidate table is #vectors × k with no
    * shuffle until the per-vector aggregation. sqrt is correctly
    * rounded and the mean folds in id order — cross-engine exact. */
  def simplifiedSilhouette(df: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, cellCol: String,
      centVecCol: String): DataFrame = {
    val scored = df
      .crossJoin(broadcast(centroids.select(col(cellCol).as("cell"),
        col(centVecCol).as("cvec"))))
      .select(col(idCol).as("vid"), col("cell"),
        sqDist(col(vecCol), col("cvec")).as("d2"))
    val w = Window.partitionBy(col("vid"))
      .orderBy(col("d2"), col("cell"))
    val p = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .groupBy(col("vid"))
      .agg(min(when(col("rk") === 1, col("cell"))).as("cell"),
        sqrt(min(when(col("rk") === 1, col("d2")))).as("a"),
        sqrt(min(when(col("rk") === 2, col("d2")))).as("b"))
    p.withColumn("sv",
        when(greatest(col("a"), col("b")) <= 0.0, lit(0.0))
          .otherwise((col("b") - col("a"))
            / greatest(col("a"), col("b"))))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        (graft.ops.Aggregates.orderedSum(col("vid"), col("sv"))
          / count(lit(1)).cast("double")).as("mean_sil"),
        min(col("sv")).as("min_sil"), max(col("sv")).as("max_sil"))
  }
}
