package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.Privacy

/** Pins the DP geometric-mechanism release (llmops/Privacy): the
  * integer-only noise sampler against an independent Scala
  * reimplementation, the distribution's calibration (α = 1/2 two-sided
  * geometric), determinism under replay, and the suppression
  * semantics of dpNoisyCounts. */
class PrivacySpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-privacy-test")
  import spark.implicits._

  /** Independent reference: hash60 = first 15 hex chars of md5; noise
    * = tz(low 30 bits) − tz(next 30), each chunk sentinel-capped at
    * 30 via the 2^30 bit. */
  private def refNoise(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.take(15), 16)
    def tz(chunk: Long): Long =
      java.lang.Long.numberOfTrailingZeros(chunk | (1L << 30)).toLong
    tz(h & 1073741823L) - tz(h >> 30)
  }

  test("geometricNoise matches the independent reference sampler") {
    val keys = Seq("en|src0|dp1", "de|src3|dp1", "x", "", "a|b|c")
    val got = keys.toDF("k")
      .select(col("k"), Privacy.geometricNoise(col("k")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k => assert(got(k) == refNoise(k), s"key=$k") }
  }

  test("noise distribution is calibrated: P(0)≈1/3, mean≈0, symmetric") {
    val n = 4000
    val noises = (1 to n).map(i => refNoise(s"class-$i|dp1")).toArray
    val p0 = noises.count(_ == 0L).toDouble / n
    assert(math.abs(p0 - 1.0 / 3.0) < 0.04, s"P(noise=0)=$p0")
    val mean = noises.sum.toDouble / n
    assert(math.abs(mean) < 0.1, s"mean=$mean")
    val pPos = noises.count(_ > 0L).toDouble / n
    val pNeg = noises.count(_ < 0L).toDouble / n
    assert(math.abs(pPos - pNeg) < 0.05, s"+$pPos vs -$pNeg")
    // P(|k|=1) = 2·(1/3)·(1/2) = 1/3 for the α=1/2 two-sided geometric
    val p1 = noises.count(x => math.abs(x) == 1L).toDouble / n
    assert(math.abs(p1 - 1.0 / 3.0) < 0.04, s"P(|noise|=1)=$p1")
  }

  test("dpNoisyCounts: replay-deterministic, additive, suppression on " +
    "the noisy value, salt changes the draw") {
    val df = (1 to 200).map(i => (s"w$i", if (i <= 190) "big" else "tiny"))
      .toDF("word", "grp")
    def run(salt: String) =
      Privacy.dpNoisyCounts(df, Seq("grp"), salt, minRelease = 100L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).sortBy(_._1)
    val a = run("dp1")
    assert(a.toSeq == run("dp1").toSeq) // replay-exact
    a.foreach { case (_, nTrue, noise, nNoisy, suppressed, released) =>
      assert(nNoisy == nTrue + noise)
      assert(suppressed == (nNoisy < 100L))
      assert(released == (if (suppressed) None else Some(nNoisy)))
    }
    val big = a.find(_._1 == "big").get
    val tiny = a.find(_._1 == "tiny").get
    assert(!big._5 && big._6.isDefined) // 190±30 never below 100
    assert(tiny._5 && tiny._6.isEmpty)  // 10±30 never reaches 100
    // a fresh release salt re-randomizes at least one class's noise
    val b = run("dp2")
    assert(a.map(_._3).toSeq != b.map(_._3).toSeq)
  }

  test("kAnonymizeBands: finest passing level per row, band dropped " +
    "at the ladder end, sub-k bandless classes suppressed") {
    import spark.implicits._
    val rows =
      // A: 6 rows in one fine band → released at level 0
      (1L to 6L).map(i => (i, "n1", "s1", 100.0 * i)) ++
        // B: split 3/2 across fine bands, united at divisor 2000
        Seq((11L, "n1", "s2", 500.0), (12L, "n1", "s2", 510.0),
          (13L, "n1", "s2", 520.0), (14L, "n1", "s2", 1500.0),
          (15L, "n1", "s2", 1510.0)) ++
        // C: 2 rows — below k even bandless → suppressed
        Seq((21L, "n2", "s1", 100.0), (22L, "n2", "s1", 200.0)) ++
        // D: 5 rows spread so every banded level splits them → the
        // bandless rung catches the class exactly at k
        Seq((31L, "n3", "s1", 100.0), (32L, "n3", "s1", 9000.0),
          (33L, "n3", "s1", 17000.0), (34L, "n3", "s1", 25000.0),
          (35L, "n3", "s1", 33000.0))
    val got = Privacy
      .kAnonymizeBands(rows.toDF("id", "nation", "segment", "bal"),
        "id", Seq("nation", "segment"), "bal")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getBoolean(6)))).toMap
    (1L to 6L).foreach(i =>
      assert(got(i) == ((0, Some(0L), 6L, false)), s"A row $i"))
    Seq(11L, 12L, 13L, 14L, 15L).foreach(i =>
      assert(got(i) == ((1, Some(0L), 5L, false)), s"B row $i"))
    Seq(21L, 22L).foreach(i =>
      assert(got(i) == ((5, None, 0L, true)), s"C row $i"))
    Seq(31L, 32L, 33L, 34L, 35L).foreach(i =>
      assert(got(i) == ((4, None, 5L, false)), s"D row $i"))
  }

  test("kAnonymizeBands: mixed-sublevel classes never publish a " +
    "sub-k remainder — every released (level, class, band) group " +
    "has >= k rows") {
    import spark.implicits._
    // E: 5 rows in band [0,1000) + 1 in [1000,2000) under one class.
    // The naive one-shot count would release the lone row at the
    // divisor-2000 level with class_size 6 (uniquely re-identifiable
    // to anyone who knows its value range); the iterative release
    // must publish the 5 at level 0 and SUPPRESS the remainder.
    val rows = (1L to 5L).map(i => (i, "n4", "s1", 100.0 + 10 * i)) ++
      Seq((6L, "n4", "s1", 1500.0)) ++
      // F: 6 in band0 + 4 in band1 → band0 ships at level 0; the 4
      // remainder rows can only unite at the bandless rung, where 4
      // is still < k → suppressed (they never ride band0's size)
      (11L to 16L).map(i => (i, "n5", "s2", 50.0 + i)) ++
      (21L to 24L).map(i => (i, "n5", "s2", 1200.0 + i))
    val out = Privacy
      .kAnonymizeBands(rows.toDF("id", "nation", "segment", "bal"),
        "id", Seq("nation", "segment"), "bal")
    val got = out.collect()
      .map(r => r.getLong(0) -> ((r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getBoolean(6)))).toMap
    (1L to 5L).foreach(i =>
      assert(got(i) == ((0, Some(0L), 5L, false)), s"E kept $i"))
    assert(got(6L) == ((5, None, 0L, true)), "E remainder leaked")
    (11L to 16L).foreach(i =>
      assert(got(i) == ((0, Some(0L), 6L, false)), s"F kept $i"))
    (21L to 24L).foreach(i =>
      assert(got(i) == ((5, None, 0L, true)), s"F remainder $i"))
    // the k-anonymity invariant itself: every PUBLISHED group >= k
    val published = out.filter(!col("suppressed"))
      .groupBy(col("level"), col("nation"), col("segment"), col("band"))
      .agg(count(lit(1)).as("n"))
      .collect().map(_.getAs[Long]("n"))
    assert(published.nonEmpty && published.forall(_ >= 5L))
  }

  test("dpUserLevelCounts: one contributor moves a released count by " +
    "at most m (row-level release is unbounded); replay-exact") {
    import spark.implicits._
    val others = (1 to 20).map(i => (s"u$i", "A"))
    val whale = (1 to 1000).map(_ => ("u0", "A"))
    val df = (others ++ whale).toDF("user", "cls")
    val dfNoWhale = others.toDF("user", "cls")
    def nTrue(d: org.apache.spark.sql.DataFrame, m: Int) =
      Privacy.dpUserLevelCounts(d, Seq("cls"), "user", "s1", m)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = 4
    val w = nTrue(df, m)("A")
    val nw = nTrue(dfNoWhale, m)("A")
    assert(w == 24L && nw == 20L) // clamp: 20 singles + min(1000, m)
    assert(math.abs(w - nw) <= m, "contributor influence not bounded")
    // the row-level release the clamp replaces: moved by 1000
    val rowLevel = Privacy.dpNoisyCounts(df, Seq("cls"), "s1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rowLevel("A") == 1020L)
    // replay determinism of the full released frame
    def full(d: org.apache.spark.sql.DataFrame) =
      Privacy.dpUserLevelCounts(d, Seq("cls"), "user", "s1", m)
        .collect().map(_.toString).sorted.toSeq
    assert(full(df) == full(df))
  }

  test("dpNoisySums: clipping bounds any one row's influence to one " +
    "unit; released value is clip-quantized; replay-exact") {
    import spark.implicits._
    val clip = 100L
    val others = (1 to 50).map(i => ("A", 80L)) // 4000 clipped sum
    val whale = Seq(("A", 1000000L))            // clips to 100
    def run(rows: Seq[(String, Long)]) =
      Privacy.dpNoisySums(rows.toDF("cls", "v"), Seq("cls"), "v",
        clip, "s1", minReleaseUnits = 1L)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6),
          if (r.isNullAt(8)) None else Some(r.getLong(8)))).head
    val w = run(others ++ whale)
    val nw = run(others)
    // whale contributes exactly clip to the sum, ONE unit to the
    // released statistic (raw influence would be 10^6)
    assert(w._1 == 4100L && nw._1 == 4000L)
    assert(w._2 == 1L && nw._2 == 0L) // n_clipped audits the bias
    assert(w._3 == 0L && nw._3 == 0L) // no negatives here
    assert(w._4 - nw._4 == 1L)        // units_true moved by exactly 1
    // noise is keyed by (class, salt, mechanism tag) only -> identical
    // draw across the two datasets; released values differ by clip
    assert(w._5 == nw._5)
    assert((w._7.get - nw._7.get) == clip)
    assert(w._7.get == ((w._4 + w._5) * clip)) // clip-quantized release
    assert(run(others ++ whale) == w)          // replay-exact
    // floor clip is audited too: a negative row clamps to 0 (moving
    // the sum by nothing) and shows up in n_floor_clipped
    val neg = run(others ++ Seq(("A", -7L)))
    assert(neg._1 == 4000L && neg._3 == 1L)
  }

  test("noise key folds in the mechanism tag: counts, sums, and " +
    "user-level forms under ONE salt draw independent noise (no " +
    "cross-form cancellation)") {
    import spark.implicits._
    // many classes so per-class draw collisions (P=1/3 per class for
    // two independent draws landing equal) don't mask the law
    val rows = (1 to 400).map(i => (s"u${i % 40}", s"c${i % 20}", 10L))
    val df = rows.toDF("user", "cls", "v")
    val salt = "shared-salt"
    def noiseMap(d: org.apache.spark.sql.DataFrame, noiseIdx: Int) =
      d.collect().map(r => r.getString(0) -> r.getLong(noiseIdx)).toMap
    val cnt = noiseMap(
      Privacy.dpNoisyCounts(df, Seq("cls"), salt, minRelease = 1L), 2)
    val usr = noiseMap(Privacy.dpUserLevelCounts(df, Seq("cls"),
      "user", salt, maxPerContributor = 2, minRelease = 1L), 2)
    val sums = noiseMap(Privacy.dpNoisySums(df, Seq("cls"), "v",
      clip = 10L, salt = salt, minReleaseUnits = 1L), 5)
    val usums = noiseMap(Privacy.dpUserLevelSums(df, Seq("cls"),
      "user", "v", clip = 10L, salt = salt, maxPerContributor = 2,
      minReleaseUnits = 1L), 5)
    def differs(a: Map[String, Long], b: Map[String, Long]) =
      a.keySet.intersect(b.keySet).exists(k => a(k) != b(k))
    assert(differs(cnt, usr), "row vs user counts share noise")
    assert(differs(cnt, sums), "counts vs sums share noise")
    assert(differs(sums, usums), "row vs user sums share noise")
    assert(differs(usr, usums), "user counts vs user sums share noise")
    // and a different clip is a different release form too
    val sums20 = noiseMap(Privacy.dpNoisySums(df, Seq("cls"), "v",
      clip = 20L, salt = salt, minReleaseUnits = 1L), 5)
    assert(differs(sums, sums20), "clip=10 vs clip=20 share noise")
  }

  test("user-level releases refuse a contributor column that is also " +
    "a key or the value column") {
    import spark.implicits._
    val df = Seq(("u1", "A", 1L)).toDF("user", "cls", "v")
    intercept[IllegalArgumentException] {
      Privacy.dpUserLevelCounts(df, Seq("user"), "user", "s1")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpUserLevelSums(df, Seq("cls"), "v", "v", 10L, "s1")
    }
  }

  test("dpUserLevelSums: clamp + clip bound one CONTRIBUTOR's " +
    "influence to m units; released totals replay-stable") {
    import spark.implicits._
    val clip = 100L
    val m = 3
    // 20 singles at value 100 (exactly one unit each), one whale
    // with 1000 rows of huge values
    val others = (1 to 20).map(i => (s"u$i", "A", 100L))
    val whale = (1 to 1000).map(_ => ("u0", "A", 999999L))
    def unitsTrue(rows: Seq[(String, String, Long)]) =
      Privacy.dpUserLevelSums(rows.toDF("user", "cls", "v"),
        Seq("cls"), "user", "v", clip, "s1", m, minReleaseUnits = 1L)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val w = unitsTrue(others ++ whale)("A")
    val nw = unitsTrue(others)("A")
    // whale: m rows kept, each clipped to 100 -> exactly m units;
    // raw influence would be 10^9
    assert(nw == 20L && w == 20L + m)
    assert(math.abs(w - nw) <= 2L * m, "user influence not bounded")
    // replay determinism under the (class, value) ranking
    def full(rows: Seq[(String, String, Long)]) =
      Privacy.dpUserLevelSums(rows.toDF("user", "cls", "v"),
        Seq("cls"), "user", "v", clip, "s1", m)
        .collect().map(_.toString).sorted.toSeq
    val rows = others ++ whale
    assert(full(rows) == full(scala.util.Random.shuffle(rows)))
  }

  test("release-budget ledger: fresh salt passes, recorded salt " +
    "refuses unless reuse is explicit, composed view sums ε " +
    "additively per salt") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dp-ledger").toString + "/ledger"
    // guard on a not-yet-existing ledger is a pass (first release)
    Privacy.ledgerGuard(spark, dir, "s1", allowReuse = false)
    Privacy.ledgerAppend(spark, dir, "s1", "cnt:row", Seq("lang"), 1.0)
    // the same salt now refuses…
    val e = intercept[IllegalArgumentException] {
      Privacy.ledgerGuard(spark, dir, "s1", allowReuse = false)
    }
    assert(e.getMessage.contains("composes"))
    // …unless reuse (ε-additive) is explicit; a different salt passes
    Privacy.ledgerGuard(spark, dir, "s1", allowReuse = true)
    Privacy.ledgerGuard(spark, dir, "s2", allowReuse = false)
    Privacy.ledgerAppend(spark, dir, "s1", "sum:user", Seq("lang"), 4.0)
    Privacy.ledgerAppend(spark, dir, "s2", "cnt:user", Seq("lang"), 8.0)
    val view = Privacy.ledgerComposedView(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(view("s1")._1 == 2L && view("s1")._2 == 5.0)
    assert(view("s2")._1 == 1L && view("s2")._2 == 8.0)
    // epsilon_composed = units · ln2, the stated per-unit ε
    assert(math.abs(view("s1")._3 - 5.0 * Privacy.EpsUnit) < 1e-12)
  }

  test("ledgerBurn records the EXACT noise-key mechanism tag and the " +
    "shared ε derivation for every release form, and a refused burn " +
    "appends nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dp-ledger2").toString + "/ledger"
    // one burn per release form, each under a fresh salt
    Privacy.ledgerBurn(spark, dir, "c", Seq("lang"), None, None,
      allowReuse = false)
    Privacy.ledgerBurn(spark, dir, "cu", Seq("lang"), None, Some(3),
      allowReuse = false)
    Privacy.ledgerBurn(spark, dir, "s", Seq("lang"), Some(128L), None,
      allowReuse = false)
    Privacy.ledgerBurn(spark, dir, "su", Seq("lang"), Some(64L),
      Some(2), allowReuse = false)
    val rows = spark.read.parquet(dir)
      .select("salt", "mechanism", "eps_ln2_units")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getDouble(2)))).toMap
    // the recorded mechanism IS the tag the release folds into its
    // noise key (clip and m included — per-form budgets reconstruct
    // without guessing), ε from the same derivation authority
    assert(rows("c") == (("cnt", 1.0)))
    assert(rows("cu") == (("cnt:u3", 3.0)))
    assert(rows("s") == (("sum:c128", 1.0)))
    assert(rows("su") == (("sum:c64:u2", 4.0)))
    // a refused burn is atomic: the salt row count stays 1
    intercept[IllegalArgumentException] {
      Privacy.ledgerBurn(spark, dir, "c", Seq("lang"), None, None,
        allowReuse = false)
    }
    assert(spark.read.parquet(dir)
      .filter(col("salt") === "c").count() == 1L)
  }

  test("ledger mechanism tag law: the recorded tag, fed back as the " +
    "mechanismTag override, reproduces the release bit-exactly — " +
    "the ledger row joins to the release form with no translation") {
    import spark.implicits._
    val df = Seq(("en", 1L), ("en", 2L), ("de", 3L), ("de", 4L),
      ("fr", 5L), ("fr", 6L), ("fr", 7L)).toDF("lang", "v")
    val cls = df.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_true"))
    def frame(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    // row-level counts: default tag == mechanismTagOf(None, None)
    assert(frame(Privacy.dpNoisyCounts(df, Seq("lang"), "salt")) ==
      frame(Privacy.dpNoisyFromCounts(cls, Seq("lang"), "salt",
        mechanismTag = Privacy.mechanismTagOf(None, None))))
    // and a DIFFERENT form's tag draws different noise (the
    // cross-form cancellation defense the tag exists for)
    assert(frame(Privacy.dpNoisyFromCounts(cls, Seq("lang"), "salt",
        mechanismTag = Privacy.mechanismTagOf(None, Some(2)))) !=
      frame(Privacy.dpNoisyFromCounts(cls, Seq("lang"), "salt",
        mechanismTag = Privacy.mechanismTagOf(None, None))))
  }

  test("ledgerGuard treats an existing-but-fileless ledger dir as an " +
    "empty ledger, not a schema-inference error") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dp-ledger3").toString + "/ledger"
    new java.io.File(dir).mkdirs() // crash after mkdir, before append
    Privacy.ledgerGuard(spark, dir, "s1", allowReuse = false) // passes
    assert(Privacy.ledgerComposedView(spark, dir).count() == 0L)
  }

  test("classKey: NULL-explicit and length-prefixed — NULL keys still " +
    "draw noise, separator-bearing values cannot collide classes") {
    import spark.implicits._
    val enc = Seq(("a|b", "c"), ("a", "b|c"))
      .toDF("x", "y")
      .select(Privacy.classKey(Seq("x", "y")).as("k"))
      .collect().map(_.getString(0)).toSeq
    // the old concat_ws('|', …) rendered both as "a|b|c"
    assert(enc == Seq("v3:a|bv1:c", "v1:av3:b|c"))
    val nullKey = Seq((Option.empty[String], "x"))
      .toDF("x", "y")
      .select(Privacy.classKey(Seq("x", "y")).as("k"))
      .collect().map(_.getString(0)).toSeq
    assert(nullKey == Seq("nv1:x"))
    // and dpNoisyFromCounts over a NULL class key releases a real
    // (non-NULL) noisy count — concat_ws would have noised nothing
    val rel = Privacy.dpNoisyFromCounts(
      Seq((Option.empty[String], 50L)).toDF("lang", "n_true"),
      Seq("lang"), "s1", minRelease = 1L).collect()
    assert(rel.length == 1 && !rel(0).isNullAt(2)
      && rel(0).getLong(3) == 50L + rel(0).getLong(2))
  }
}
