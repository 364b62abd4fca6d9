package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Aggregates, Calendar, Dedup, NameAlgebra}

/** Unit tests for the reusable operator library (SURVEY.md §2 semantics):
  * name algebra, conditional aggregates, tumbling bins, dedup. */
class OpsSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-ops-test")
  import spark.implicits._

  test("dataset name algebra splits /primds/procds/tier") {
    val df = Seq("/PrimDS/Proc-v1/RAW").toDF("ds")
    val r = df.select(
      NameAlgebra.primaryDataset($"ds").as("p"),
      NameAlgebra.processedDataset($"ds").as("q"),
      NameAlgebra.dataTier($"ds").as("t")).head()
    assert(r.getString(0) == "PrimDS")
    assert(r.getString(1) == "Proc-v1")
    assert(r.getString(2) == "RAW")
  }

  test("block name → dataset part") {
    val df = Seq("/A/B/RAW#uuid-123").toDF("b")
    assert(df.select(NameAlgebra.blockDataset($"b")).head.getString(0)
      == "/A/B/RAW")
  }

  test("site algebra: tier, country, clean name, tape endpoints") {
    val df = Seq("T2_US_FNAL_Buffer").toDF("s")
    val r = df.select(
      NameAlgebra.siteTier($"s"),
      NameAlgebra.siteCountry($"s"),
      NameAlgebra.cleanSiteName($"s"),
      NameAlgebra.isTapeEndpoint($"s")).head()
    assert(r.getString(0) == "T2")
    assert(r.getString(1) == "US")
    assert(r.getString(2) == "T2_US_FNAL")
    assert(r.getBoolean(3))
  }

  test("parseDn extracts the human CN, skipping numeric CNs") {
    val dn = "/DC=ch/DC=cern/OU=Users/CN=jdoe/CN=123456/CN=John Doe"
    val df = Seq(dn).toDF("dn")
    assert(df.select(NameAlgebra.parseDn($"dn")).head.getString(0)
      == "John Doe")
  }

  test("dn_uuid is callable from SQL via the session extension") {
    spark.range(1).createOrReplaceTempView("one")
    graft.core.Sessions.ensureQueryConfs(spark)
    val v = spark.sql("SELECT dn_uuid('John Doe') AS u FROM one")
      .head().getLong(0)
    // exact parity with the reference's Python:
    // int(hashlib.sha1(b'John Doe').hexdigest(), 16) % 10**16
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val hex = md.digest("John Doe".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(v == (BigInt(hex, 16) mod BigInt(10).pow(16)).toLong)
  }

  test("dnToUuid is deterministic and within 10^16") {
    val df = Seq("/CN=John Doe", "/CN=John Doe").toDF("dn")
    val got = df.select(NameAlgebra.dnToUuid($"dn")).collect().map(_.getLong(0))
    assert(got(0) == got(1))
    assert(got(0) >= 0 && got(0) < math.pow(10, 16).toLong)
  }

  test("countIf counts condition hits, null-safe") {
    val df = Seq(Some(1), Some(5), None, Some(10)).toDF("x")
    val n = df.agg(Aggregates.countIf($"x" > 2)).head.getLong(0)
    assert(n == 2)
  }

  test("tumbling bins: seconds and nanos agree") {
    val tsSec = 1704067798L
    val df = Seq((tsSec, tsSec * 1000000000L)).toDF("s", "ns")
    val r = df.select(
      Calendar.tumblingBinSeconds($"s", 720),
      Calendar.tumblingBinNanos($"ns", 720)).head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) % 720 == 0)
    assert(r.getLong(0) <= tsSec && tsSec < r.getLong(0) + 720)
  }

  test("exact dup groups finds duplicates") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
    val groups = Dedup.exactDupGroups(df, Seq("k", "v"))
      .collect().map(_.getLong(1)).sorted
    assert(groups.toSeq == Seq(1L, 2L))
  }

  test("anonymize replaces values with md5 hex") {
    val df = Seq("secret").toDF("pii")
    val v = Dedup.anonymize(df, Seq("pii")).head.getString(0)
    assert(v.matches("[0-9a-f]{32}"))
  }

  test("rangeJoin == brute-force BETWEEN join, incl. bin-boundary hits") {
    val rnd = new scala.util.Random(7)
    val events = (0 until 400)
      .map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("eid", "ts")
    // intervals deliberately include bin-aligned bounds (multiples of
    // the 50-tick bin width) and zero-length intervals
    val ivs = Seq((0L, 100L, 200L), (1L, 150L, 150L), (2L, 0L, 49L),
      (3L, 950L, 999L), (4L, 37L, 612L))
      .toDF("win", "lo", "hi")
    val got = graft.ops.Events
      .rangeJoin(events, "ts", ivs, "lo", "hi", binWidth = 50L)
      .select("eid", "win").as[(Long, Long)].collect().toSet
    val brute = events.join(ivs,
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("eid", "win").as[(Long, Long)].collect().toSet
    assert(got == brute)
    // exactly once per (event, interval): no bin-duplicate rows
    val n = graft.ops.Events
      .rangeJoin(events, "ts", ivs, "lo", "hi", binWidth = 50L).count()
    assert(n == brute.size)
  }

  test("rangeJoin whale guard: an interval spanning the whole axis " +
    "takes the broadcast route, never bin replication") {
    val events = (0 until 300)
      .map(i => (i.toLong, (i * 37L) % 100000L)).toDF("eid", "ts")
    // one whale spanning the entire axis (would replicate over 10k
    // 10-tick bins without the guard) + two ordinary intervals
    val ivs = Seq((0L, 0L, 99999L), (1L, 100L, 140L), (2L, 500L, 505L))
      .toDF("win", "lo", "hi")
    val got = graft.ops.Events
      .rangeJoin(events, "ts", ivs, "lo", "hi", binWidth = 10L,
        maxBinsPerInterval = 64L)
      .select("eid", "win").as[(Long, Long)].collect().toSet
    val brute = events.join(ivs,
        col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select("eid", "win").as[(Long, Long)].collect().toSet
    assert(got == brute)
    // the replicated (bin-exploded) relation never materializes a row
    // for the whale: the bin route's interval side is capped
    val replicas = ivs
      .filter((col("hi") - col("lo")) / 10L + 1L <= 64L)
      .withColumn("b", explode(expr(
        "sequence(lo div 10, hi div 10)")))
      .count()
    assert(replicas == 6L) // 5 bins for win 1 + 1 bin for win 2
  }

  test("rangeJoin whale-count guard: a binWidth far below the median " +
    "span (most intervals whales) fails loudly instead of silently " +
    "broadcasting the corpus") {
    val events = Seq((1L, 5L)).toDF("eid", "ts")
    // every interval spans > 2 bins of width 1 → all whales
    val ivs = (0 until 50).map(i => (i.toLong, 0L, 100L))
      .toDF("win", "lo", "hi")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Events.rangeJoin(events, "ts", ivs, "lo", "hi",
        binWidth = 1L, maxBinsPerInterval = 2L, maxWhales = 10L)
    }
    assert(ex.getMessage.contains("broadcast"))
    // under the limit the whales still join correctly
    val ok = graft.ops.Events.rangeJoin(events, "ts", ivs.limit(3),
      "lo", "hi", binWidth = 1L, maxBinsPerInterval = 2L,
      maxWhales = 10L)
    assert(ok.count() == 3L)
  }

  test("incremental merge == from-scratch partial, and is a schema " +
    "fixed point") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300)
      .map(i => (s"k${i % 7}", rnd.nextDouble() * 100 - 50))
    val full = rows.toDF("k", "v")
    val parts = rows.grouped(100).map(_.toDF("k", "v"))
      .map(d => graft.ops.Incremental.partial(d, Seq("k"), "v")).toSeq
    val merged = graft.ops.Incremental.merge(parts, Seq("k"))
    val direct = graft.ops.Incremental.partial(full, Seq("k"), "v")
    // exact equality of the DOUBLE faces (decimal sums are associative)
    val a = graft.ops.Incremental.present(merged, Seq("k"))
      .orderBy("k").collect().map(_.toSeq)
    val b = graft.ops.Incremental.present(direct, Seq("k"))
      .orderBy("k").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // merge-of-merges keeps the same schema as a fresh partial
    val twice = graft.ops.Incremental.merge(Seq(merged, merged), Seq("k"))
    assert(twice.schema.map(f => (f.name, f.dataType)) ==
      merged.schema.map(f => (f.name, f.dataType)))
  }

  test("quantilesDisc picks the sorted-array element at ceil(q*n)") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 237)
      .map(i => (s"g${i % 3}", rnd.nextInt(500).toLong, i.toLong))
      .toDF("g", "v", "id")
    val got = Aggregates.quantilesDisc(df, "g", "v", "id",
        Seq(("p50", 1, 2), ("p90", 9, 10)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val data = df.as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (g, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3)).map(_._2)
        val n = sorted.length
        def at(num: Int, den: Int) =
          sorted((num * n + den - 1) / den - 1)
        g -> (n.toLong, at(1, 2), at(9, 10))
      }
    assert(got == data)
  }

  test("funnel: conditional-min cascade honors strict stage ordering") {
    val ev = Seq(
      // full funnel in order
      (1L, 1L, 10L, "view"), (1L, 2L, 20L, "click"),
      (1L, 3L, 30L, "purchase"),
      // a click BEFORE the first view must not count; one after does
      (2L, 4L, 5L, "click"), (2L, 5L, 10L, "view"),
      (2L, 6L, 15L, "click"),
      // stage-3-only user: no stages at all, still visible
      (3L, 7L, 9L, "purchase"),
      // purchase at the SAME tick as the click: strictly-after misses
      (4L, 8L, 10L, "view"), (4L, 9L, 20L, "click"),
      (4L, 10L, 20L, "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = graft.ops.Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), tieCol = "event_id")
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
          (if (r.isNullAt(2)) -1L else r.getLong(2)),
          (if (r.isNullAt(3)) -1L else r.getLong(3)),
          r.getInt(4))).toMap
    assert(got(1L) == ((10L, 20L, 30L, 3)))
    assert(got(2L) == ((10L, 15L, -1L, 2)))
    assert(got(3L) == ((-1L, -1L, -1L, 0)))
    assert(got(4L) == ((10L, 20L, -1L, 2)))
  }

  test("retentionCohorts: first-week cohort x offset distinct counts") {
    // ticksPerWeek = 10: u1 active weeks 0,1,3; u2 active weeks 1,2
    // (two events in week 1 count once)
    val ev = Seq((1L, 1L), (1L, 12L), (1L, 35L),
        (2L, 15L), (2L, 17L), (2L, 25L))
      .toDF("user_id", "ts")
    val got = graft.ops.Events
      .retentionCohorts(ev, "user_id", "ts", ticksPerWeek = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("debounce keeps exactly the first event of each burst") {
    // user 1, type a: bursts {10,12,14}, {30}, {40,41} with gap 5
    // user 1, type b: independent stream, all within one burst
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "a", 12L, 2L), (1L, "a", 14L, 3L),
      (1L, "a", 30L, 4L), (1L, "a", 40L, 5L), (1L, "a", 41L, 6L),
      (1L, "b", 11L, 7L), (1L, "b", 13L, 8L))
      .toDF("user_id", "kind", "ts", "event_id")
    val kept = graft.ops.Events
      .debounce(ev, Seq("user_id", "kind"), "ts", gap = 5L,
        tieCol = "event_id")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L, 7L))
  }

  test("blockedPairs + editDistanceVerify: ordered in-block pairs, " +
      "capped Levenshtein, normalized similarity") {
    val df = Seq(
      (1L, "k1", "kitten"), (2L, "k1", "sitten"), (3L, "k1", "kitten"),
      (4L, "k2", "alone"))
      .toDF("doc_id", "blk", "text")
    val pairs = graft.ops.Dedup
      .blockedPairs(df, "doc_id", Seq("blk"), Seq("text"))
    val got = graft.ops.Dedup
      .editDistanceVerify(pairs, "text_a", "text_b")
      .collect()
      .map(r => (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"))
        -> (r.getAs[Int]("lev"), r.getAs[Double]("norm_sim"))).toMap
    // k1 yields the 3 ordered pairs, k2 none (block of one)
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got((1L, 2L)) == ((1, 1.0 - 1.0 / 6.0)))
    assert(got((1L, 3L)) == ((0, 1.0))) // exact dup
    // the cap bounds the kernel: beyond maxLen the texts look equal
    val longPair = Seq((1L, "x" * 50 + "a", "x" * 50 + "b"))
      .toDF("id", "text_a", "text_b")
    assert(graft.ops.Dedup
      .editDistanceVerify(longPair, "text_a", "text_b", maxLen = 50)
      .head.getAs[Int]("lev") == 0)
  }

  test("LevenshteinThreshold rule: banded kernel in the plan, " +
      "identical results, null-safe") {
    graft.core.Sessions.ensureQueryConfs(spark)
    // a parquet-backed relation: on a LocalRelation the whole filter
    // constant-folds away before the rewrite is observable
    val dir = java.nio.file.Files
      .createTempDirectory("graft-lev").toString + "/pairs"
    Seq(("kitten", "sitting"), ("abc", "abd"), ("same", "same"),
      ("aaaaaaaaaa", "bbbbbbbbbb"), (null, "x"))
      .toDF("a", "b").write.parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("lev_pairs")
    val q = spark.sql(
      "SELECT a, b FROM lev_pairs WHERE levenshtein(a, b) <= 3")
    // the rule rewrote the predicate to the three-arg banded form
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("levenshtein(a#") && opt.contains("Some(3)"),
      s"rule did not fire:\n$opt")
    assert(opt.contains(">= 0"))
    // results match the unbounded semantics exactly (null row drops)
    assert(q.collect().map(r => (r.getString(0), r.getString(1))).toSet
      == Set(("kitten", "sitting"), ("abc", "abd"), ("same", "same")))
    // strict < and flipped >= forms rewrite too
    val q2 = spark.sql(
      "SELECT count(*) FROM lev_pairs WHERE levenshtein(a, b) < 1")
    assert(q2.queryExecution.optimizedPlan.toString.contains("Some(0)"))
    assert(q2.head.getLong(0) == 1L) // only the exact-equal pair
    val q3 = spark.sql(
      "SELECT count(*) FROM lev_pairs WHERE 3 >= levenshtein(a, b)")
    assert(q3.queryExecution.optimizedPlan.toString.contains("Some(3)"))
    assert(q3.head.getLong(0) == 3L)
  }

  test("nfc_normalize: composes decomposed text, identity on NFC, " +
      "SQL-callable via the session extension") {
    graft.core.Sessions.ensureQueryConfs(spark)
    spark.range(1).createOrReplaceTempView("one_nfc")
    // input is e + COMBINING ACUTE U+0301 (2 codepoints); NFC composes
    // it to U+00E9 (1 codepoint)
    val dec = "e\u0301"
    val r = spark.sql(
      s"SELECT nfc_normalize('$dec') AS c, nfc_normalize('abc') AS a, " +
        s"length(nfc_normalize('$dec')) AS lc FROM one_nfc").head()
    assert(r.getString(0) == "\u00e9")
    assert(r.getString(1) == "abc")
    assert(r.getInt(2) == 1)
    // parity with the JDK reference implementation on mixed content:
    // decomposed accents, the Angstrom sign U+212B (NFC-maps to
    // U+00C5), and a non-BMP emoji (NFC identity)
    val s = "Pe\u0301rez naive\u0308 \u212b A\u030a \ud83d\ude00"
    val got = Seq(s).toDF("t")
      .select(call_function("nfc_normalize", $"t")).head.getString(0)
    assert(got == java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC))
    assert(got == "P\u00e9rez naiv\u00eb \u00c5 \u00c5 \ud83d\ude00")
  }
}
