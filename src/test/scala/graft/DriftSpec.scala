package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.{Classifier, Drift}

/** Semantic invariants of the distribution-shift audits (Drift) and
  * the hashed linear classifier (Classifier). Cross-engine value
  * parity is enforced by the DuckDB oracle gate (q254–q257); these
  * specs pin the statistics on hand-computable frames. */
class DriftSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-drift-test")
  import spark.implicits._

  test("ksByGroup: hand-computed D and achieving value") {
    // group a: values 1,1,2,3 ; group b: values 2,3,3,4
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val got = Drift.ksByGroup(df, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toMap
    // F_a = (.5, .75, 1, 1) at v=1,2,3,4 ; F_b = (0, .25, .75, 1)
    // D = .5 at v=1 for both directions
    assert(got("a") == ((4L, 4L, 0.5, 1L)))
    assert(got("b") == ((4L, 4L, 0.5, 1L)))
  }

  test("ksByGroup: identical groups have zero D; single group drops") {
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("g", "v")
    val gotSame = Drift.ksByGroup(same, "g", "v").collect()
    assert(gotSame.length == 2)
    assert(gotSame.forall(_.getDouble(3) == 0.0))
    val single = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    assert(Drift.ksByGroup(single, "g", "v").count() == 0)
  }

  test("binDrift: a group that IS the corpus has exactly zero drift") {
    val df = Seq(("a", 0L), ("a", 1L), ("a", 3L)).toDF("g", "b")
    val r = Drift.binDrift(df, "g", "b", 4).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 3L)
    assert(r.head.getDouble(2) == 0.0) // p_b == q_b bit-for-bit
    assert(r.head.getDouble(3) == 0.0)
  }

  test("binDrift: disjoint groups — positive, symmetric-ish drift") {
    val df = (Seq.fill(8)(("a", 0L)) ++ Seq.fill(8)(("b", 3L)))
      .toDF("g", "b")
    val got = Drift.binDrift(df, "g", "b", 4).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got("a")._1 > 0.0 && got("b")._1 > 0.0)
    // both groups sit at the same distance from the pooled corpus
    assert(got("a") == got("b"))
    // squared Hellinger is bounded by 1
    assert(got.values.forall(v => v._2 > 0.0 && v._2 <= 1.0))
  }

  test("medianShiftBhFdr: shifted cell rejected, null cell not") {
    // global lower median is 100 (60 of 100 docs sit at v=100);
    // cell (s1, x) sits entirely below it, cell (s2, x) exactly AT it
    val rows =
      (1 to 40).map(i => ("s1", "x", i.toLong, i.toLong)) ++
        (1 to 60).map(i => ("s2", "x", 100L + i, 100L))
    val df = rows.toDF("src", "lng", "doc_id", "v")
    val got = Drift
      .medianShiftBhFdr(df, Seq("src", "lng"), "doc_id", "v",
        probe = 30, alpha = 0.1)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
          r.getInt(7))).toMap
    // s1: every probed doc below the median → p = 2/2^30, rejected
    val (m1, w1, p1, bh1, rej1) = got("s1")
    assert(m1 == 30L && w1 == 0L)
    assert(math.abs(p1 - 2.0 / math.pow(2.0, 30)) < 1e-15)
    assert(rej1 == 1 && bh1 <= 0.1)
    // s2: every probed doc AT the median → m = 0, p = 1, not rejected
    val (m2, w2, p2, bh2, rej2) = got("s2")
    assert(m2 == 0L && w2 == 0L)
    assert(p2 == 1.0 && rej2 == 0 && bh2 == 1.0)
  }

  test("medianShiftBhFdr: p_bh is monotone in p_sign rank, capped") {
    val rows =
      (1 to 20).map(i => ("a", "x", i.toLong, i.toLong)) ++
        (1 to 20).map(i => ("b", "x", 50L + i, 10L + i)) ++
        (1 to 20).map(i => ("c", "x", 90L + i, 21L + i))
    val got = Drift
      .medianShiftBhFdr(rows.toDF("src", "lng", "doc_id", "v"),
        Seq("src", "lng"), "doc_id", "v", probe = 20, alpha = 0.1)
      .collect()
      .map(r => (r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(got.forall { case (_, bh) => bh >= 0.0 && bh <= 1.0 })
    // adjusted p-values are non-decreasing along the p_sign order
    assert(got.sliding(2).forall(w =>
      w.length < 2 || w(0)._2 <= w(1)._2))
    // BH never adjusts below the raw p
    assert(got.forall { case (p, bh) => bh >= p - 1e-12 })
  }

  test("medianShiftBhFdr: probe=62 boundary is exact — the C(m,k) " +
      "fold runs in DECIMAL where BIGINT intermediates would wrap") {
    // cell a: 32 probed docs above / 30 below the global median →
    // m = 62, the documented boundary where the fold intermediate
    // C(62,31)·62 ≈ 2.6e19 exceeds 2^63−1; cell b pins med = 5
    val rows =
      (1 to 32).map(i => ("a", "x", i.toLong, 10L)) ++
        (1 to 30).map(i => ("a", "x", 100L + i, 0L)) ++
        (1 to 100).map(i => ("b", "x", 1000L + i, 5L))
    val got = Drift
      .medianShiftBhFdr(rows.toDF("src", "lng", "doc_id", "v"),
        Seq("src", "lng"), "doc_id", "v", probe = 62, alpha = 0.1)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val (m, wins, p) = got("a")
    assert(m == 62L && wins == 32L)
    // exact reference via BigInt: tail = Σ_{k=32}^{62} C(62,k)
    def c(n: Int, k: Int): BigInt =
      (1 to k).foldLeft(BigInt(1))((a, i) => a * (n - k + i) / i)
    val tail = (32 to 62).map(k => c(62, k)).sum
    val exp = math.min(1.0,
      2.0 * tail.toDouble / math.pow(2.0, 62))
    assert(math.abs(p - exp) < 1e-12)
    // a wrapped fold lands far away; the true value is ≈ 0.899
    assert(p > 0.89 && p < 0.91)
  }

  test("conformalCoverage: tau is the exact order statistic; " +
      "coverage matches a manual count") {
    val df = (1 to 200).map(i => (i.toLong, "g", i.toDouble / 200.0))
      .toDF("id", "grp", "score")
    // replicate the operator's hash split to learn the calibration
    // members, then compute the expected tau/coverage by hand
    val calIds = df.select(col("id"),
        pmod(graft.llmops.TextOps.hash60(col("id").cast("string")),
          lit(4L)).as("h"))
      .collect().filter(_.getLong(1) == 0L).map(_.getLong(0)).toSet
    assert(calIds.nonEmpty && calIds.size < 200)
    def disc(i: Long): Long =
      math.floor((i / 200.0) * 1000.0).toLong // the operator's path
    val calQ = calIds.toSeq.map(disc).sorted
    val k = ((calQ.size + 1) * 9 + 9) / 10
    val expTau = if (k <= calQ.size) calQ(k - 1) else -1L
    assert(k <= calQ.size, "fixture: calibration too small")
    val evalQ = (1 to 200).filterNot(i => calIds(i.toLong))
      .map(i => disc(i.toLong))
    val expCov = evalQ.count(_ <= expTau).toDouble / evalQ.size
    val r = Drift.conformalCoverage(df, "id", "grp", "score",
      scaleTo = 1000, calibBuckets = 4, keepNum = 9, keepDen = 10)
      .collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == expTau)
    assert(r.head.getLong(2) == calIds.size.toLong)
    assert(r.head.getLong(3) == evalQ.size.toLong)
    assert(r.head.getDouble(5) == expCov)
  }

  test("conformalCoverage: empty calibration gives NULL tau, " +
      "zero coverage") {
    // calibBuckets > any hash60 residue multiplicity is impossible
    // to force directly; instead feed ids whose hash residue mod 2
    // is 1 (probe until found) so the calibration slice is empty
    val ids = (1 to 400).map(_.toLong)
    val res = ids.map(i => i -> i).toDF("id", "v")
      .select(col("id"),
        pmod(graft.llmops.TextOps.hash60(col("id").cast("string")),
          lit(2L)).as("h"))
      .collect().filter(_.getLong(1) == 1L).map(_.getLong(0)).take(10)
    val df = res.toSeq.map(i => (i, "g", 0.5))
      .toDF("id", "grp", "score")
    val r = Drift.conformalCoverage(df, "id", "grp", "score",
      scaleTo = 1000, calibBuckets = 2, keepNum = 9, keepDen = 10)
      .collect()
    assert(r.length == 1)
    assert(r.head.isNullAt(1)) // tau
    assert(r.head.getLong(4) == 0L) // n_covered
    assert(r.head.getDouble(5) == 0.0)
  }

  test("thresholdFromHistogram: non-empty slice below the rank gives " +
      "the +inf sentinel (split conformal's tau), not NULL") {
    // n_cal = 3 at keep 9/10: ceil((3+1)·9/10) = 4 > 3 → τ = +∞
    val vh = Seq((5L, 2L), (7L, 1L)).toDF("q", "cnt")
    val r = Drift.thresholdFromHistogram(vh, 9, 10).collect().head
    assert(r.getLong(0) == Long.MaxValue && r.getLong(1) == 3L)
    // with enough mass the selected order statistic is unchanged
    val vh2 = (1 to 20).map(i => (i.toLong, 1L)).toDF("q", "cnt")
    val r2 = Drift.thresholdFromHistogram(vh2, 9, 10).collect().head
    assert(r2.getLong(0) == 19L && r2.getLong(1) == 20L)
  }

  test("conformalCoverage: calibration slice smaller than the rank " +
      "reports FULL coverage (conservative), not zero") {
    // pick 3 calibration ids (hash residue 0 mod 2) and 10 eval ids
    // so n_cal = 3 < 9 — the rank selects no histogram row
    val res = (1 to 500).map(_.toLong).toDF("id")
      .select(col("id"),
        pmod(graft.llmops.TextOps.hash60(col("id").cast("string")),
          lit(2L)).as("h"))
      .collect()
    val cal = res.filter(_.getLong(1) == 0L).map(_.getLong(0)).take(3)
    val ev = res.filter(_.getLong(1) == 1L).map(_.getLong(0)).take(10)
    val df = (cal ++ ev).toSeq.map(i => (i, "g", 0.5))
      .toDF("id", "grp", "score")
    val r = Drift.conformalCoverage(df, "id", "grp", "score",
      scaleTo = 1000, calibBuckets = 2, keepNum = 9, keepDen = 10)
      .collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == Long.MaxValue) // tau sentinel
    assert(r.head.getLong(2) == 3L) // n_cal
    assert(r.head.getLong(4) == 10L) // n_covered == n_eval
    assert(r.head.getDouble(5) == 1.0)
  }

  test("simplifiedSilhouette: hand-computed a/b margins per cell") {
    import graft.llmops.Similarity
    val cents = Seq((0L, Seq(0f, 0f)), (1L, Seq(10f, 0f)))
      .toDF("cell", "cvec")
    val vecs = Seq((10L, Seq(1f, 0f)), // a=1, b=9 → s=8/9, cell 0
      (11L, Seq(5f, 0f)), // equidistant → cell 0 (tie), s=0
      (12L, Seq(10f, 0f)) // ON centroid 1 → a=0, b=10 → s=1
    ).toDF("vec_id", "embedding")
    val got = Similarity.simplifiedSilhouette(vecs, "vec_id",
        "embedding", cents, "cell", "cvec")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val s10 = 8.0 / 9.0
    assert(got(0L)._1 == 2L)
    assert(math.abs(got(0L)._2 - (s10 + 0.0) / 2.0) < 1e-12)
    assert(got(0L)._3 == 0.0 && math.abs(got(0L)._4 - s10) < 1e-12)
    assert(got(1L) == ((1L, 1.0, 1.0, 1.0)))
  }

  test("rankAucByGroup: separation gives 1/0, identical groups 0.5 " +
      "exactly under ties") {
    val sep = ((1 to 10).map(i => ("lo", i.toLong)) ++
      (1 to 10).map(i => ("hi", 100L + i))).toDF("g", "v")
    val gotSep = Drift.rankAucByGroup(sep, "g", "v").collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(gotSep("hi") == ((1.0, 1.0)))
    assert(gotSep("lo") == ((0.0, -1.0)))
    // identical tied distributions: the ½-per-tie correction lands
    // AUC on exactly 0.5 (2U = 100 of 200 in this fixture)
    val same = ((1 to 10).map(i => ("a", (i % 3).toLong)) ++
      (1 to 10).map(i => ("b", (i % 3).toLong))).toDF("g", "v")
    val gotSame = Drift.rankAucByGroup(same, "g", "v").collect()
      .map(_.getDouble(3))
    assert(gotSame.length == 2 && gotSame.forall(_ == 0.5))
  }

  test("energyDistanceByGroup: ~0 for identical, large and " +
      "symmetric for separated groups") {
    val same = ((1 to 12).map(i => ("a", (i % 4).toLong)) ++
      (1 to 12).map(i => ("b", (i % 4).toLong))).toDF("g", "v")
    val gotSame = Drift.energyDistanceByGroup(same, "g", "v")
      .collect().map(_.getDouble(3))
    assert(gotSame.length == 2)
    assert(gotSame.forall(e => math.abs(e) < 1e-12))
    val sep = ((1 to 8).map(i => ("lo", (i % 2).toLong)) ++
      (1 to 12).map(i => ("hi", 50L + i % 3))).toDF("g", "v")
    val got = Drift.energyDistanceByGroup(sep, "g", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // two groups: "rest of lo" IS hi, so both rows state the same
    // two-sample distance — and a ~50-token shift dominates it
    assert(got("lo") > 50.0 && got("lo") == got("hi"))
  }

  test("lshPlanCurve: S-curve shape, exact (1,1) diagonal, s50") {
    val c = graft.llmops.DedupAudit.lshPlanCurve(spark, 16, 10)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getDouble(2)),
        (r.getDouble(3), if (r.isNullAt(4)) None
          else Some(r.getDouble(4))))).toMap
    // 5 factorizations of 16 × 9 grid points
    assert(c.size == 45)
    // degenerate banding (1 band of 1 row): p(s) = s exactly
    // (sigLen=16 has no (1,1); check via p monotone + extremes)
    // extremes: many bands of 1 row ⇒ high collision at low s;
    // one band of 16 rows ⇒ near-zero collision below s≈0.8
    assert(c((16, 1, 0.2))._1 > 0.9)
    assert(c((1, 16, 0.5))._1 < 0.001)
    // monotone non-decreasing in s for every banding
    for (b <- Seq(1, 2, 4, 8, 16)) {
      val ps = (1 to 9).map(i => c((b, 16 / b, i / 10.0))._1)
      assert(ps.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
    // s50: the 16-row single band never crosses ½ on this grid
    assert(c((1, 16, 0.5))._2.isEmpty)
    // 16 bands of 1 row cross ½ at the first grid point
    assert(c((16, 1, 0.1))._2.contains(0.1))
  }

  test("hashedBigramMargin: feature count and margin bounds") {
    val df = Seq((1L, "en", "a b c"), (2L, "en", "solo"),
      (3L, "xx", "")).toDF("doc_id", "lang", "text")
    val got = Classifier
      .hashedBigramMargin(df, "doc_id", "text", Seq("lang"), 4096)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // "a b c" → 3 unigrams + 2 bigrams; "solo" → 1; "" → 1 ('' token)
    assert(got(1L)._1 == 5L)
    assert(got(2L)._1 == 1L)
    assert(got(3L)._1 == 1L)
    assert(got.values.forall(v => v._2 >= -1.0 && v._2 <= 1.0))
  }

  test("hashedBigramMargin: margin is the mean bucket weight / 500") {
    val df = Seq((1L, "w w w")).toDF("doc_id", "text")
    // all five features hash identically per feature string; compute
    // the expected margin from bucketWeight on the two feature hashes
    val w = Seq("w", "w w").toDF("f")
      .select(Classifier.bucketWeight(
        pmod(graft.llmops.TextOps.hash60(col("f")), lit(4096L))))
      .collect().map(_.getLong(0))
    val expected = (3 * w(0) + 2 * w(1)).toDouble / (500.0 * 5.0)
    val got = Classifier
      .hashedBigramMargin(df, "doc_id", "text", Nil, 4096)
      .collect().head.getDouble(2)
    assert(got == expected)
  }
}
