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
}
