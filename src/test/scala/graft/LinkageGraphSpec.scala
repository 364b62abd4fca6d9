package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Calendar, Events, Graphs, Incremental, Linkage, Skew}

/** Unit pins for the reconciliation/graph family (q201–q208): hand-
  * sized inputs with enumerable expected outputs, plus the exact-
  * equality law of the salted join. */
class LinkageGraphSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-linkage-test")
  import spark.implicits._

  test("goldenRecord takes per-field latest non-null, not latest row") {
    val feeds = Seq(
      // entity 1: name only in v0, acct updated each version,
      // seg goes missing in the LAST version — must not resurrect null
      (1L, 0L, Option("alice"), Option(10.0), Option("A")),
      (1L, 1L, None, Option(20.0), Option("B")),
      (1L, 2L, None, Option(30.0), None),
      // entity 2: single record
      (2L, 5L, Option("bob"), None, Option("C")))
      .toDF("k", "v", "name", "acct", "seg")
    val g = Linkage.goldenRecord(feeds, Seq("k"), "v",
      Seq("name", "acct", "seg"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val e1 = g(1L)
    assert(e1.getString(1) == "alice")     // survived from v0
    assert(e1.getDouble(2) == 30.0)        // latest non-null
    assert(e1.getString(3) == "B")         // v2's null did not win
    assert(e1.getLong(4) == 3 && e1.getLong(5) == 2L)
    val e2 = g(2L)
    assert(e2.getString(1) == "bob" && e2.isNullAt(2))
  }

  test("pointInTimeJoin resolves the interval valid at the fact ts") {
    val dim = Seq(
      (1L, "v1", 10L, Option(20L)),
      (1L, "v2", 20L, None),
      (2L, "w1", 5L, Option(6L)))
      .toDF("k", "attr", "valid_from", "valid_to")
    val fact = Seq((1L, 9L), (1L, 10L), (1L, 19L), (1L, 20L),
      (1L, 99L), (2L, 6L)).toDF("k", "at")
    val out = Linkage.pointInTimeJoin(fact, "k", "at", dim, "k")
      .select(col("k"), col("at"), col("__dv.attr").as("attr"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(out((1L, 9L)) == null)          // before first interval
    assert(out((1L, 10L)) == "v1")         // inclusive valid_from
    assert(out((1L, 19L)) == "v1")
    assert(out((1L, 20L)) == "v2")         // exclusive valid_to
    assert(out((1L, 99L)) == "v2")         // open interval
    assert(out((2L, 6L)) == null)          // after closed interval
    // exactly one output row per fact row (disjoint intervals)
    assert(Linkage.pointInTimeJoin(fact, "k", "at", dim, "k")
      .count() == fact.count())
  }

  test("clusterAgreement: identical clusterings score 1.0") {
    val df = Seq((1, "a", "x"), (2, "a", "x"), (3, "b", "y"),
      (4, "b", "y"), (5, "c", "z")).toDF("id", "ca", "cb")
    val r = Linkage.clusterAgreement(df, "ca", "cb").collect()(0)
    assert(r.getAs[Long]("n") == 5)
    assert(r.getAs[Long]("pairs_total") == 10)
    assert(r.getAs[Long]("pairs_both") == 2)
    assert(r.getAs[Long]("pairs_a") == 2)
    assert(r.getAs[Long]("pairs_b") == 2)
    assert(r.getAs[Double]("rand_index") == 1.0)
    assert(r.getAs[Double]("ari") == 1.0)
  }

  test("clusterAgreement: hand contingency case") {
    // A splits {1,2,3|4}, B splits {1,2|3,4}: cells (a,x)=2,(a,y)=1,
    // (b,y)=1 → both=1, a=3, b=2; rand = (6+2-3-2)/6 = 0.5
    val df = Seq((1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
      (4, "b", "y")).toDF("id", "ca", "cb")
    val r = Linkage.clusterAgreement(df, "ca", "cb").collect()(0)
    assert(r.getAs[Long]("pairs_both") == 1)
    assert(r.getAs[Long]("pairs_a") == 3)
    assert(r.getAs[Long]("pairs_b") == 2)
    assert(r.getAs[Double]("rand_index") == 0.5)
  }

  test("coordinatedKeep preserves referential integrity of samples") {
    val dim = spark.range(1, 2000).select(col("id").as("k"))
    val fact = spark.range(1, 6000)
      .select(pmod(col("id") * 7, lit(1999L) + 1).as("k"))
      .filter(col("k") > 0)
    val dimS = dim.filter(Linkage.coordinatedKeep(col("k"), ":t", 20))
    val factS = fact.filter(Linkage.coordinatedKeep(col("k"), ":t", 20))
    // sampled fact keys are a subset of sampled dim keys
    assert(factS.join(dimS, Seq("k"), "left_anti").count() == 0)
    // and the sample is non-trivial on both sides
    assert(dimS.count() > 0 && factS.count() > 0)
    // membership at a tighter pct is a subset (nested samples)
    val dim10 = dim.filter(Linkage.coordinatedKeep(col("k"), ":t", 10))
    assert(dim10.join(dimS, Seq("k"), "left_anti").count() == 0)
  }

  test("triangleCounts: K4 has 4 triangles, 3 per vertex") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("src", "dst")
    val out = Graphs.triangleCounts(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("degreeCapped drops every edge touching a hub") {
    // star around 0 (degree 4) plus one far edge
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (5L, 6L))
      .toDF("src", "dst")
    val kept = Graphs.degreeCapped(e, 3)
      .collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    assert(kept == Set((5L, 6L)))
  }

  test("bfsHops: min hop distances, bounded, unreachable absent") {
    // path 1-2-3-4-5-6 plus shortcut 1-4, isolated component 8-9
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 4L), (8L, 9L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("v")
    val out = Graphs.bfsHops(e, seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L,
      5L -> 2L, 6L -> 3L))   // 3 via min(2-3, 1-4-3); 8/9 unreachable
  }

  test("fieldConflicts: omission is not conflict") {
    val feeds = Seq(
      // entity 1: name agrees, acct contradicts, seg only in one feed
      (1L, 0L, Option("a"), Option(1.0), Option("S")),
      (1L, 1L, Option("a"), Option(2.0), None),
      // entity 2: name missing everywhere, acct single-valued
      (2L, 0L, None, Option(5.0), Option("T")),
      (2L, 1L, None, Option(5.0), Option("T")))
      .toDF("k", "v", "name", "acct", "seg")
    val m = Linkage.fieldConflicts(feeds, Seq("k"),
      Seq("name", "acct", "seg"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(m("name") == (1L, 0L))   // one entity has it, same value
    assert(m("acct") == (2L, 1L))   // entity 1 contradicts
    assert(m("seg") == (2L, 0L))    // omission in one feed ≠ conflict
  }

  test("scdAudit flags each defect class exactly") {
    val dim = Seq(
      (1L, 0L, Option(5L)), (1L, 4L, Option(8L)),   // overlap (5>4)
      (2L, 0L, Option(3L)), (2L, 5L, None),          // gap (3<5)
      (3L, 0L, Option(0L)),                          // bad_bounds
      (4L, 0L, None), (4L, 3L, Option(6L)),          // open_not_last
      (5L, 0L, Option(3L)), (5L, 3L, None))          // clean history
      .toDF("k", "valid_from", "valid_to")
    val m = Linkage.scdAudit(dim, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("overlap" -> 1L, "gap" -> 1L, "bad_bounds" -> 1L,
      "open_not_last" -> 1L))
  }

  test("clusteringCoefficient: triangle with a pendant") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val out = Graphs.clusteringCoefficient(e)
      .collect().map(r => r.getAs[Long]("v") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("n_triangles"),
          r.getAs[Double]("coeff"))).toMap
    assert(out(1L) == ((2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((3L, 1L, 1.0 / 3.0)))
    assert(!out.contains(4L))   // degree 1: undefined, excluded
  }

  test("overlapJoin: exact lengths, touching intervals dropped") {
    val a = Seq((1L, 10L, 0L, 10L), (1L, 11L, 20L, 30L))
      .toDF("k", "a_id", "a_start", "a_end")
    val b = Seq((1L, 20L, 5L, 25L), (1L, 21L, 10L, 12L),
      (2L, 22L, 0L, 100L)).toDF("k", "b_id", "b_start", "b_end")
    val out = Events.overlapJoin(a, b, "k", "a_id", "a_start", "a_end",
        "b_id", "b_start", "b_end")
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
        -> r.getAs[Long]("overlap_len")).toMap
    assert(out == Map((10L, 20L) -> 5L, (11L, 20L) -> 5L))
    // (10,21) touches at 10 → overlap 0 → dropped; key 2 never joins
  }

  test("missingBins: gap arithmetic over present bins only") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 5L), ("a", 9L), ("a", 2L),
      ("b", 7L)).toDF("k", "bin")
    val m = Calendar.missingBins(df, "k", col("bin"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = m("a")
    assert(a.getAs[Long]("first_bin") == 1 &&
      a.getAs[Long]("last_bin") == 9)
    assert(a.getAs[Long]("n_expected") == 9 &&
      a.getAs[Long]("n_present") == 4 &&
      a.getAs[Long]("n_missing") == 5)
    assert(a.getAs[Long]("longest_gap") == 3)   // 6,7,8 between 5 and 9
    val b = m("b")
    assert(b.getAs[Long]("n_missing") == 0 &&
      b.getAs[Long]("longest_gap") == 0)
  }

  test("orderAudit reports only keys with ts/version inversions") {
    val ch = Seq(
      (1L, 0L, 100L), (1L, 1L, 90L), (1L, 2L, 95L),  // one inversion
      (2L, 0L, 10L), (2L, 1L, 20L))                   // ordered
      .toDF("k", "v", "ts")
    val out = Incremental.orderAudit(ch, "k", "v", "ts").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("k") == 1L &&
      r.getAs[Long]("n_changes") == 3 &&
      r.getAs[Long]("n_inversions") == 1 &&
      r.getAs[Long]("max_backstep") == 10)
  }

  test("winnowingStats: density bounds and shared-run guarantee") {
    val docs = Seq(
      (1L, "a b c d e f"),                            // 4 grams, 1 window
      (2L, "x1 x2 P Q R S T U V y1 y2 y3"),           // shares 7-run
      (3L, "z1 z2 z3 P Q R S T U V z4"),              // with doc 2
      (4L, "a b c"),                                  // 1 gram, 0 windows
      (5L, ""))                                       // empty
      .toDF("doc_id", "text")
    val out = graft.llmops.TextOps.winnowingStats(docs, "doc_id",
      "text").collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_grams") == 4 &&
      d1.getAs[Long]("n_windows") == 1 &&
      d1.getAs[Long]("n_selected") == 1 &&
      d1.getAs[Double]("density") == 1.0)
    assert(out(4L).getAs[Long]("n_windows") == 0 &&
      out(4L).getAs[Long]("n_selected") == 0 &&
      out(4L).getAs[Double]("density") == 0.0)
    assert(out(5L).getAs[Long]("n_grams") == 0)
    // density bounds: 1/w <= n_selected/n_windows <= 1
    for (r <- out.values if r.getAs[Long]("n_windows") > 0) {
      val dens = r.getAs[Double]("density")
      assert(dens > 0.24 && dens <= 1.0)
    }
    // docs 2 and 3 share the 7-token run "P Q R S T U V" (>= w+k-1):
    // the full selected-set guarantee is exercised on the real corpus
    // by q215's oracle; here pin the density floor n_windows/w on both
    assert(out(2L).getAs[Long]("n_selected") >= 2 &&
      out(3L).getAs[Long]("n_selected") >= 2)
  }

  test("rbo10: identity, disjoint, and top-swap cases") {
    def ranks(rows: Seq[(Long, Long, Int)]) =
      rows.toDF("query_id", "cand_id", "rk")
    val a = ranks((1 to 10).map(r => (1L, r.toLong, r)))
    // identical
    val id = graft.llmops.Retrieval.rbo10(a, a).collect()(0)
    assert(id.getAs[Long]("n_common") == 10 &&
      id.getAs[Double]("rbo") == 1.0)
    // disjoint
    val b = ranks((1 to 10).map(r => (1L, 100L + r, r)))
    val dj = graft.llmops.Retrieval.rbo10(a, b).collect()(0)
    assert(dj.getAs[Long]("n_common") == 0 &&
      dj.getAs[Double]("rbo") == 0.0)
    // top-2 swapped: X_1 = 0, X_d = d for d >= 2
    val sw = ranks(Seq((1L, 1L, 2), (1L, 2L, 1)) ++
      (3 to 10).map(r => (1L, r.toLong, r)))
    val s = graft.llmops.Retrieval.rbo10(a, sw).collect()(0)
    assert(s.getAs[Long]("s_scaled") ==
      2L * 498200 + (2577960L - 1788440 - 498200))
  }

  test("gateInteractions: correlated vs disjoint gates") {
    val df = spark.range(0, 100).select(col("id"),
      (col("id") < 50).as("low"))
    val out = graft.ops.Profile.gateInteractions(df, Seq(
        ("a", col("id") < 50),          // identical to b → max corr
        ("b", col("id") < 50),
        ("c", col("id") >= 50)))        // disjoint from a/b
      .collect()
      .map(r => (r.getAs[String]("gate_a"), r.getAs[String]("gate_b"))
        -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("n_both") == 50 &&
      ab.getAs[Long]("corr") == 100L * 50 - 50L * 50)
    val ac = out(("a", "c"))
    assert(ac.getAs[Long]("n_both") == 0 &&
      ac.getAs[Long]("corr") == -50L * 50)
    assert(out.size == 3)
  }

  test("bucketPairHistogram: stable 10-bin schema, identical pair at top") {
    val vecs = (0L to 40L).map(i => (i, Array(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = graft.llmops.Similarity
      .bucketPairHistogram(vecs, "vec_id", "embedding", 4)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("cos_lo"), r.getAs[Long]("n_pairs"))).toMap
    assert(out.size == 10)                      // dense spine
    assert(out(9)._1 == 0.8)
    // all vectors identical → every sampled pair lands in bin 9
    assert((0 to 8).forall(b => out(b.toLong)._2 == 0))
    assert(out(9)._2 > 0)
  }

  test("hubnessProfile finds the hub") {
    // three tight queries + a hub on their axis + three orthogonal
    // decoys: every query's top-3 is {other two queries, hub}
    val corpus = (Seq((100L, Array(1f, 0f, 0f, 0f))) ++
      (1L to 3L).map(i => (i, Array(1f, 0f, 0f, i.toFloat / 100))) ++
      Seq((11L, Array(0f, 1f, 0f, 0f)), (12L, Array(0f, 0f, 1f, 0f)),
        (13L, Array(0f, 1f, 1f, 0f))))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") <= 3)
    val out = graft.llmops.Similarity
      .hubnessProfile(queries, corpus, "vec_id", "embedding", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_occ"), r.getAs[Long]("n_top1"))).toMap
    // every non-hub pair has cos ~0.95+; the hub is in all lists but
    // what we pin is structural: occurrences sum ≤ queries×k and the
    // hub appears for every query
    assert(out.contains(100L) && out(100L)._1 == 3)
  }

  test("boilerplatePosition: shared leading trigram hits decile 0") {
    val filler1 = (1 to 17).map("x" + _).mkString(" ")
    val filler2 = (1 to 17).map("y" + _).mkString(" ")
    val docs = Seq((1L, s"A B C $filler1"), (2L, s"A B C $filler2"))
      .toDF("doc_id", "text")
    val out = graft.llmops.TextOps
      .boilerplatePosition(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup"))).toMap
    assert(out.size == 10)
    assert(out(0L)._2 == 2)                     // "A B C" in both docs
    assert((1 to 9).forall(d => out(d.toLong)._2 == 0))
    assert(out.values.map(_._1).sum == 36)      // 2 docs × 18 grams
  }

  test("rendezvousRebalance: only the new node gains, bounded movement") {
    val docs = spark.range(0, 2000).select(col("id").as("doc_id"))
    val old5 = Seq("n0", "n1", "n2", "n3", "n4")
    val out = graft.llmops.Sharding
      .rendezvousRebalance(docs, "doc_id", old5, old5 :+ "n5")
      .collect()
    // every mover goes TO the new node — rendezvous never reshuffles
    // between surviving nodes
    assert(out.forall(r => r.getString(0) == r.getString(1) ||
      r.getString(1) == "n5"))
    val moved = out.filter(r => r.getString(0) != r.getString(1))
      .map(_.getLong(2)).sum
    val total = out.map(_.getLong(2)).sum
    assert(total == 2000)
    // expected 1/6 ≈ 333; allow generous slack for hash variance
    assert(moved > 200 && moved < 480)
  }

  test("selfJoinForecast equals the real join cardinality") {
    val df = Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("k")
    val f = graft.ops.Profile.selfJoinForecast(df, "k").collect()(0)
    assert(f.getAs[Long]("n_join_keys") == 3)
    assert(f.getAs[Long]("join_rows") == 9 + 4 + 1)
    assert(f.getAs[Long]("max_key_pairs") == 9)
    val actual = df.as("a").join(df.as("b"),
      col("a.k") === col("b.k")).count()
    assert(f.getAs[Long]("join_rows") == actual)
  }

  test("groupMinhash: shard signatures merge to the group signature") {
    val docs = (1L to 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11} pad$i",
        "g")).toDF("doc_id", "text", "src")
    val whole = graft.llmops.TextOps
      .groupMinhash(docs, "doc_id", "text", "src").collect()(0)
    val lo = graft.llmops.TextOps.groupMinhash(
      docs.filter(col("doc_id") <= 20), "doc_id", "text", "src")
      .collect()(0)
    val hi = graft.llmops.TextOps.groupMinhash(
      docs.filter(col("doc_id") > 20), "doc_id", "text", "src")
      .collect()(0)
    for (i <- 1 to 4)   // col 0 is the group key
      assert(whole.getLong(i) == math.min(lo.getLong(i), hi.getLong(i)))
  }

  test("saltedJoin is exactly the plain inner join") {
    // skewed fact: key 1 dominates
    val fact = spark.range(0, 3000)
      .select(when(col("id") % 10 < 8, 1L).otherwise(col("id") % 50)
        .as("fk"), col("id").as("rowid"))
    val dim = spark.range(0, 50).select(col("id").as("pk"),
      concat(lit("d"), col("id")).as("attr"))
    val plain = fact.join(dim, col("fk") === col("pk"))
      .groupBy(col("attr")).agg(count(lit(1)).as("n"),
        sum(col("rowid")).as("s"))
    val salted = Skew.saltedJoin(fact, "fk", dim, "pk",
        struct(col("rowid")), 8)
      .groupBy(col("attr")).agg(count(lit(1)).as("n"),
        sum(col("rowid")).as("s"))
    assert(plain.unionByName(salted).distinct().count() ==
      plain.count())
    assert(plain.count() == salted.count())
  }
}
