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
}
