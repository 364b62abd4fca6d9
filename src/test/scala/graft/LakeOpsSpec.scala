package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.{Mixture, Sharding, Similarity, TextOps}
import graft.ops.Incremental

/** Boundary semantics for the lake-lifecycle operators (q98-q102):
  * snapshot diff, containment pairs, semantic dedup, distributed
  * global row number / range shards, train split. */
class LakeOpsSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-lake-test")
  import spark.implicits._

  // ---- snapshotDiff ----

  test("snapshotDiff classifies added/removed/changed, drops unchanged") {
    val a = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val b = Seq((2L, 20.0), (3L, 33.0), (4L, 40.0)).toDF("k", "v")
    val r = Incremental.snapshotDiff(a, b, Seq("k"), Seq("v"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff null-safe compare: null->value is changed") {
    val a = Seq((1L, Option.empty[Double]), (2L, Some(5.0))).toDF("k", "v")
    val b = Seq((1L, Some(1.0)), (2L, Option.empty[Double])).toDF("k", "v")
    val r = Incremental.snapshotDiff(a, b, Seq("k"), Seq("v"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "changed", 2L -> "changed"))
  }

  // ---- applyChanges ----

  test("applyChanges: upsert, delete, insert, carry-through; diff round-trips") {
    val snap = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val delta = Seq((2L, "U", 25.0), (3L, "D", 0.0), (4L, "U", 40.0))
      .toDF("k", "op", "v")
    val next = Incremental.applyChanges(snap, delta,
      Seq("k"), Seq("v"), "op")
    val r = next.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == Map(1L -> 10.0, 2L -> 25.0, 4L -> 40.0))
    // inverse property: diff(snap, applyChanges(snap, delta)) finds
    // exactly the delta's effects
    val diff = Incremental.snapshotDiff(snap, next, Seq("k"), Seq("v"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(diff == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  // ---- containmentPairs ----

  test("containment sees a quote inside a larger doc; Jaccard misses it") {
    val quote = "alpha beta gamma delta epsilon zeta eta"          // 5 shingles
    val host = quote + " one two three four five six seven eight" +
      " nine ten eleven twelve thirteen fourteen fifteen sixteen"
    val docs = Seq((1L, quote), (2L, host)).toDF("doc_id", "text")
    val c = TextOps.containmentPairs(docs, "doc_id", "text",
      minContain = 0.9, minShingles = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every shingle of doc 1 appears in doc 2 -> containment 1.0, one
    // direction only (doc 2 is nowhere near contained in doc 1)
    assert(c.toSeq == Seq((1L, 2L, 1.0)))
    val j = TextOps.ngramJaccardPairs(docs, "doc_id", "text", minJac = 0.5)
    assert(j.count() == 0) // symmetric dedup is blind to the subset
  }

  test("containment drops docs below the shingle floor") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d e f g h i j k l"))
      .toDF("doc_id", "text")
    // doc 1 has 2 distinct shingles < 5 -> filtered before the join
    val c = TextOps.containmentPairs(docs, "doc_id", "text",
      minContain = 0.1, minShingles = 5)
    assert(c.count() == 0)
  }

  // ---- semdedupKeep ----

  test("semdedup keeps the first of a near-dup pair, per cell") {
    val docs = Seq(
      (1L, Array(1f, 0f), 0),   // kept: first in cell 0
      (2L, Array(1f, 0.01f), 0), // dropped: cos to vec 1 ~ 1 > 0.9
      (3L, Array(0f, 1f), 0),   // kept: orthogonal to vec 1
      (4L, Array(1f, 0f), 1))   // kept: identical to vec 1 but other cell
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.semdedupKeep(docs, "vec_id", "embedding",
      "label", 0.9)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
  }

  test("semdedup zero-norm vectors never match (cos defined 0)") {
    val docs = Seq(
      (1L, Array(0f, 0f), 0),
      (2L, Array(0f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val r = Similarity.semdedupKeep(docs, "vec_id", "embedding",
      "label", 0.5)
    assert(r.filter(col("kept")).count() == 2)
  }

  // ---- globalRowNumber / rangeShardManifest ----

  test("globalRowNumber equals the single-partition row_number") {
    val df = (1L to 97L).map(i => (i, (i * 7) % 13)).toDF("id", "s")
    val got = Sharding.globalRowNumber(df, "s", "id")
      .select(col("id"), col("rn")).as[(Long, Long)].collect().toMap
    val want = df.selectExpr("id",
      "row_number() over (order by s, id) as rn")
      .as[(Long, Int)].collect().map { case (i, r) => i -> r.toLong }.toMap
    assert(got == want)
  }

  test("rangeShardManifest matches NTILE semantics incl. remainder") {
    val df = (1L to 10L).map(i => (i, i % 4)).toDF("id", "s")
    // 10 rows, 3 shards -> NTILE sizes 4,3,3
    val m = Sharding.rangeShardManifest(df, "s", "id", 3)
      .orderBy("shard")
      .select(col("shard"), col("n_docs")).as[(Int, Long)].collect()
    assert(m.toSeq == Seq((1, 4L), (2, 3L), (3, 3L)))
    val sql = df.selectExpr("s", "ntile(3) over (order by s, id) shard")
      .groupBy("shard").count().orderBy("shard")
      .as[(Int, Long)].collect()
    assert(m.map(x => (x._1, x._2)).toSeq == sql.toSeq)
  }

  // ---- scdHistory ----

  test("scdHistory collapses runs into validity intervals") {
    val snaps = Seq(
      (1L, 0L, 10.0), (1L, 1L, 10.0), (1L, 2L, 20.0), // change at 2
      (2L, 0L, 5.0), (2L, 1L, 5.0), (2L, 2L, 5.0),    // never changes
      (3L, 1L, 7.0))                                  // appears late
      .toDF("k", "snap", "v")
    val r = Incremental.scdHistory(snaps, Seq("k"), Seq("v"), "snap")
      .collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    assert(r == Set(
      (1L, 10.0, 0L, 2L), (1L, 20.0, 2L, -1L),
      (2L, 5.0, 0L, -1L),
      (3L, 7.0, 1L, -1L)))
  }

  test("scdHistory: value flapping A->B->A yields three intervals") {
    val snaps = Seq((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "A"))
      .toDF("k", "snap", "v")
    val r = Incremental.scdHistory(snaps, Seq("k"), Seq("v"), "snap")
    assert(r.count() == 3)
  }

  // ---- flowBigrams ----

  test("flowBigrams counts gap-bounded transitions only") {
    val ev = Seq(
      // user 1: a->b (close), b->c (too far apart)
      (1L, 100L, 1L, "a"), (1L, 150L, 2L, "b"), (1L, 900L, 3L, "c"),
      // user 2: a->b again
      (2L, 10L, 4L, "a"), (2L, 20L, 5L, "b"))
      .toDF("u", "ts", "eid", "typ")
    val r = graft.ops.Events.flowBigrams(ev, "u", "ts", "typ",
      gap = 100L, tieCol = "eid")
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3))).toSet
    assert(r == Set(("a", "b", 2L, 2L)))
  }

  // ---- groupTrendSlope ----

  test("groupTrendSlope: exact slope, null on constant x") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 1L, 3L), (1L, 2L, 5L),  // y = 2x+1 -> slope 2
      (2L, 5L, 9L), (2L, 5L, 100L))               // constant x -> null
      .toDF("k", "x", "y")
    val r = graft.ops.Aggregates.groupTrendSlope(df, "k", "x", "y")
      .collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
    assert(r == Map(1L -> Some(2.0), 2L -> None))
  }

  // ---- weightedMedian ----

  test("weightedMedian: weight mass picks the value, one row per group") {
    val df = Seq(
      // group a: values 1,2,3 weights 1,1,10 -> half of 12 is 6,
      // cumsum crosses at value 3
      ("a", 1L, 1L, 1L), ("a", 2L, 1L, 2L), ("a", 3L, 10L, 3L),
      // group b: equal weights, even count -> lower median (value 1:
      // 2*cum=2 >= tot=2 and prev cum 0 < 2)
      ("b", 1L, 1L, 4L), ("b", 2L, 1L, 5L))
      .toDF("g", "v", "w", "id")
    val r = graft.ops.Aggregates.weightedMedian(df, "g", "v", "w", "id")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    assert(r == Map("a" -> ((3L, 12L)), "b" -> ((1L, 2L))))
  }

  test("weightedQuantiles: p50 = weightedMedian; heavy tail pulls p90") {
    val df = Seq(
      // g: values 1..4, weight 10 on value 4 -> wp50 = wp90 = 4
      ("g", 1L, 1L, 1L), ("g", 2L, 1L, 2L), ("g", 3L, 1L, 3L),
      ("g", 4L, 10L, 4L),
      // h: uniform weights 1..10 -> wp50 = 5, wp90 = 9
      ("h", 1L, 1L, 5L), ("h", 2L, 1L, 6L), ("h", 3L, 1L, 7L),
      ("h", 4L, 1L, 8L), ("h", 5L, 1L, 9L), ("h", 6L, 1L, 10L),
      ("h", 7L, 1L, 11L), ("h", 8L, 1L, 12L), ("h", 9L, 1L, 13L),
      ("h", 10L, 1L, 14L))
      .toDF("g", "v", "w", "id")
    val r = graft.ops.Aggregates.weightedQuantiles(df, "g", "v", "w",
      "id", Seq(("wp50", 1, 2), ("wp90", 9, 10)))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(2), x.getLong(3)))).toMap
    assert(r == Map("g" -> ((4L, 4L)), "h" -> ((5L, 9L))))
    // the 1/2 quantile IS the weighted median
    val wm = graft.ops.Aggregates.weightedMedian(df, "g", "v", "w", "id")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.view.mapValues(_._1).toMap == wm)
  }

  test("weightedMedian singleton group returns its only value") {
    val df = Seq(("a", 42L, 7L, 1L)).toDF("g", "v", "w", "id")
    val r = graft.ops.Aggregates.weightedMedian(df, "g", "v", "w", "id")
      .head()
    assert(r.getLong(1) == 42L && r.getLong(2) == 7L)
  }

  // ---- rollingActive ----

  test("rollingActive counts trailing-window distinct entities") {
    val ev = Seq(
      (1L, 10L), (1L, 10L),        // dup activity collapses
      (2L, 12L),
      (3L, 20L))                   // outside any 7-day window of 10-12
      .toDF("u", "day")
    val r = graft.ops.Events.rollingActive(ev, "u", "day", 7)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // day 10: user 1; day 12: users 1 (10 in [6,12]) + 2; day 20: user 3
    assert(r == Map(10L -> 1L, 12L -> 2L, 20L -> 1L))
  }

  // ---- madOutliers ----

  test("madOutliers: robust to the outlier it flags") {
    // values 10,10,11,12,1000 -> median 11, devs 1,1,0,1,989 -> MAD 1
    val df = Seq((1L, 10L), (2L, 10L), (3L, 11L), (4L, 12L),
      (5L, 1000L)).map { case (i, v) => ("g", v, i) }
      .toDF("g", "v", "id")
    val r = graft.ops.Aggregates.madOutliers(df, "g", "v", "id", k = 3)
      .head()
    assert(r.getLong(1) == 5L)      // n_rows
    assert(r.getLong(2) == 11L)     // median
    assert(r.getLong(3) == 1L)      // mad
    assert(r.getLong(4) == 1L)      // only 1000 flagged (dev 989 > 3)
  }

  test("madOutliers: constant group has mad 0 and no outliers") {
    val df = Seq(("g", 5L, 1L), ("g", 5L, 2L), ("g", 5L, 3L))
      .toDF("g", "v", "id")
    val r = graft.ops.Aggregates.madOutliers(df, "g", "v", "id").head()
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
  }

  // ---- giniCoefficient ----

  test("gini: 0 for perfect equality, high for concentration, null for zeros") {
    val df = Seq(
      ("eq", 5L, 1L), ("eq", 5L, 2L), ("eq", 5L, 3L), ("eq", 5L, 4L),
      ("cc", 0L, 5L), ("cc", 0L, 6L), ("cc", 0L, 7L), ("cc", 100L, 8L),
      ("zz", 0L, 9L), ("zz", 0L, 10L))
      .toDF("g", "v", "id")
    val r = graft.ops.Aggregates.giniCoefficient(df, "g", "v", "id")
      .collect()
      .map(x => x.getString(0) ->
        (if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
    assert(r("eq") == Some(0.0))
    assert(r("cc") == Some(0.75)) // (2*400 - 5*100) / (4*100)
    assert(r("zz") == None)
  }

  // ---- rendezvousAssign ----

  test("rendezvous: adding a node only moves docs TO the new node") {
    val df = (1L to 300L).toDF("doc_id")
    def assign(nodes: Seq[String]) =
      graft.llmops.Sharding.rendezvousAssign(df, "doc_id", nodes)
        .select(col("doc_id"), col("node")).as[(Long, String)]
        .collect().toMap
    val before = assign(Seq("n0", "n1", "n2", "n3"))
    val after = assign(Seq("n0", "n1", "n2", "n3", "n4"))
    // monotonicity: every reassigned doc went to n4, nowhere else
    val moved = before.keys.filter(k => before(k) != after(k))
    assert(moved.nonEmpty && moved.forall(k => after(k) == "n4"))
    // and the move fraction is ~1/5 (hash-uniform; wide tolerance)
    assert(moved.size > 20 && moved.size < 120)
  }

  // ---- cumulativeReach ----

  test("cumulativeReach: first-touch decomposition equals cumulative distinct") {
    val ev = Seq(
      (1L, 10L), (2L, 10L),          // day 10: 2 new
      (1L, 12L),                     // day 12: user 1 returns, 0 new
      (3L, 15L), (1L, 15L))          // day 15: 1 new
      .toDF("u", "day")
    val r = graft.ops.Events.cumulativeReach(ev, "u", "day")
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(10L -> ((2L, 2L)), 12L -> ((0L, 2L)),
      15L -> ((1L, 3L))))
  }

  // ---- Profile ----

  test("profile counts nulls and exact distincts per column, one pass") {
    val df = Seq(
      (Some(1L), Some("a")), (None, Some("a")), (Some(1L), None),
      (Some(2L), Some("b")))
      .toDF("k", "s")
    val r = graft.ops.Profile.profile(df, Seq("k", "s"))
      .collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("k") == ((4L, 1L, 2L)))
    assert(r("s") == ((4L, 1L, 2L)))
  }

  test("fkAudit finds orphans, counts null keys as orphans") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = graft.ops.Profile.fkAudit(spark,
      Seq(("c->p", child, "fk", parent, "pk"))).head()
    assert(r.getString(0) == "c->p")
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L) // 99 and null
  }

  test("fkAudit works when child FK and parent key share a name") {
    val child = Seq(1L, 5L).toDF("custkey")
    val parent = Seq(1L, 2L).toDF("custkey")
    val r = graft.ops.Profile.fkAudit(spark,
      Seq(("same-name", child, "custkey", parent, "custkey"))).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L)
  }

  // ---- trainSplit ----

  test("trainSplit is total, deterministic, and growth-stable") {
    val df = (1L to 200L).toDF("doc_id")
    val r1 = Mixture.trainSplit(df, "doc_id")
      .select(col("doc_id"), col("split")).as[(Long, String)]
      .collect().toMap
    assert(r1.size == 200 && r1.values.toSet.subsetOf(
      Set("train", "val", "test")))
    // adding docs must not move existing assignments
    val r2 = Mixture.trainSplit((1L to 400L).toDF("doc_id"), "doc_id")
      .select(col("doc_id"), col("split")).as[(Long, String)]
      .collect().toMap
    assert(r1.forall { case (k, v) => r2(k) == v })
    // rough proportions (hash-uniform): train strictly the majority
    val n = r1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n.getOrElse("train", 0) > n.getOrElse("val", 0) &&
      n.getOrElse("train", 0) > n.getOrElse("test", 0))
  }

  // ---- rollingMedian ----

  test("rollingMedian: exact middle, even-window average, range bound") {
    val df = Seq(
      ("u", 1L, 10L), ("u", 2L, 2L), ("u", 3L, 30L),  // span grows
      ("u", 10L, 100L))                                // gap: own window
      .toDF("k", "x", "v")
    val r = graft.ops.Aggregates.rollingMedian(df, "k", "x", "v", 7L)
      .collect().map(x => x.getLong(1) -> x.getDouble(3)).toMap
    assert(r(1L) == 10.0)            // [10]
    assert(r(2L) == 6.0)             // [2,10] -> (2+10)/2
    assert(r(3L) == 10.0)            // [2,10,30]
    assert(r(10L) == 100.0)          // days 4..10 window: only day 10
  }

  // ---- winsorizedMean ----

  test("winsorizedMean: clips at exact rank values, keeps n") {
    // 20 values 1..20: p05 rank = ceil(1) = 1 -> lo=1,
    // p95 rank = ceil(19) = 19 -> hi=19; clipped mean =
    // (sum(1..19) + 19)/20 = (190+19)/20 = 10.45
    val df = (1L to 20L).map(v => ("g", v, v)).toDF("k", "v", "id")
    val r = graft.ops.Aggregates.winsorizedMean(df, "k", "v", "id")
      .head()
    assert(r.getLong(1) == 20L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 19L)
    assert(r.getDouble(4) == 10.45)
  }

  // ---- forwardFill ----

  test("forwardFill: gaps carry last value, per-key grid bounds") {
    val df = Seq(
      ("a", 10L, 1.0), ("a", 13L, 4.0),           // gap 11,12 -> 1.0
      ("b", 5L, 7.0))                              // singleton key
      .toDF("k", "day", "v")
    val r = graft.ops.Calendar.forwardFill(df, "k", "day", "v")
      .collect()
      .map(x => (x.getString(0), x.getLong(1)) ->
        ((x.getDouble(2), x.getBoolean(3)))).toMap
    assert(r == Map(
      ("a", 10L) -> ((1.0, true)), ("a", 11L) -> ((1.0, false)),
      ("a", 12L) -> ((1.0, false)), ("a", 13L) -> ((4.0, true)),
      ("b", 5L) -> ((7.0, true))))
  }

  // ---- intervalCoverage ----

  test("intervalCoverage: overlap once, touching continuous, disjoint sums") {
    val df = Seq(
      ("ov", 0L, 10L), ("ov", 5L, 15L),    // union [0,15) = 15
      ("tc", 0L, 10L), ("tc", 10L, 20L),   // touching -> 20
      ("dj", 0L, 10L), ("dj", 20L, 30L),   // disjoint -> 20
      ("nest", 0L, 100L), ("nest", 10L, 20L)) // nested -> 100
      .toDF("k", "s", "e")
    val r = graft.ops.Events.intervalCoverage(df, "k", "s", "e")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map("ov" -> ((15L, 2L)), "tc" -> ((20L, 2L)),
      "dj" -> ((20L, 2L)), "nest" -> ((100L, 2L))))
  }

  // ---- regressionOutliers ----

  test("regressionOutliers: perfect fit has zero RMSE and outliers") {
    val perfect = (0L to 9L).map(x => (1L, x, 2 * x + 1))
    // mid-range spike: an END spike has leverage (it tilts the fit
    // toward itself and can dodge the 3σ gate — observed); a middle
    // spike only shifts the intercept and stays flagged
    val spiked = (0L to 19L).map(x =>
      (2L, x, if (x == 10L) 1000L else x))
    val df = (perfect ++ spiked).toDF("k", "x", "y")
    val r = graft.ops.Aggregates.regressionOutliers(df, "k", "x", "y")
      .collect().map(x => x.getLong(0) ->
        ((x.getDouble(2), x.getDouble(3), x.getDouble(4),
          x.getLong(5)))).toMap
    // exact integer sums -> slope exactly 2, intercept exactly 1
    assert(r(1L) == ((1.0, 2.0, 0.0, 0L)))
    val (_, _, rmse2, out2) = r(2L)
    assert(rmse2 > 0 && out2 >= 1L) // the 1000 spike breaks the fit
  }

  // ---- groupPearson ----

  test("groupPearson: ±1 on exact lines, null on zero variance") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 1L, 3L), (1L, 2L, 5L),   // y = 2x+1  -> +1
      (2L, 0L, 9L), (2L, 1L, 7L), (2L, 2L, 5L),   // y = 9-2x  -> -1
      (3L, 0L, 4L), (3L, 1L, 4L), (3L, 2L, 4L))   // constant y -> null
      .toDF("k", "x", "y")
    val r = graft.ops.Aggregates.groupPearson(df, "k", "x", "y")
      .collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toMap
    assert(math.abs(r(1L).get - 1.0) < 1e-12)
    assert(math.abs(r(2L).get + 1.0) < 1e-12)
    assert(r(3L) == None)
  }

  // ---- groupMode ----

  test("groupMode: highest count wins, ties break to smallest value") {
    val df = Seq(
      ("a", "x"), ("a", "y"), ("a", "y"),          // y wins on count
      ("b", "q"), ("b", "p"),                      // tie -> p (smaller)
      ("b", null),                                  // nulls ignored
      ("c", "z"), ("d", null))                      // all-null key drops
      .toDF("g", "v")
    val r = graft.ops.Aggregates.groupMode(df, "g", "v")
      .collect().map(x => x.getString(0) -> ((x.getString(1),
        x.getLong(2)))).toMap
    assert(r == Map("a" -> (("y", 2L)), "b" -> (("p", 1L)),
      "c" -> (("z", 1L))))
  }

  // ---- heavyHitters ----

  test("heavyHitters: exact shares, rank order, tie-break at the cut") {
    // key 1: 4 rows, key 2: 3 rows, keys 3 and 4: 2 rows each (tie),
    // key 5: 1 row — topN=3 must cut at key 3 (tie broken ascending).
    val df = (Seq.fill(4)(1L) ++ Seq.fill(3)(2L) ++ Seq.fill(2)(3L) ++
      Seq.fill(2)(4L) ++ Seq(5L)).toDF("k")
    val r = graft.ops.Skew.heavyHitters(df, "k", 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, 4L, 4.0 / 12.0, 1L),
      (2L, 3L, 3.0 / 12.0, 2L),
      (3L, 2L, 2.0 / 12.0, 3L)))
  }
}
