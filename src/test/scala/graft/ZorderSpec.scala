package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.Sharding

/** Z-order layout (Sharding.zorderKey / writeZordered): key
  * bijectivity against a Scala-side Morton reference, and the claim
  * that actually matters at 100 TB — measured on real parquet files:
  * a z-clustered layout tightens per-file min/max ranges on BOTH
  * dimensions, so multi-dimensional predicates skip files that a
  * single-column linear sort must open. */
class ZorderSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-zorder-test")

  private val sf = "/root/testdata/sf0.001"

  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zorderKey matches the Scala Morton reference bit-for-bit") {
    val df = spark.range(1000).select(
      (col("id") * 37 % 256).as("x"), (col("id") * 91 % 256).as("y"))
    val got = df.select(col("x"), col("y"),
      Sharding.zorderKey(Seq(col("x"), col("y")), 8).as("z")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1), 8))
    }
  }

  test("zorderKey supports 3 columns with disjoint bit positions") {
    val df = spark.range(500).select(
      (col("id") % 16).as("a"), (col("id") / 16 % 16).as("b"),
      (col("id") / 256 % 16).as("c"))
    // 3-way interleave is a bijection on [0,16)^3 -> [0,4096)
    val n = df.select(
      Sharding.zorderKey(Seq(col("a"), col("b"), col("c")), 4).as("z"))
      .agg(countDistinct("z")).head.getLong(0)
    assert(n == 500)
  }

  test("z-clustered files bound BOTH dims; linear sort only one") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((col("l_orderkey") % 256).cast("long").as("x"),
        (col("l_partkey") % 256).cast("long").as("y"))
    val base = Files.createTempDirectory("graft-zorder").toString
    // identical file count; only the clustering differs
    Sharding.writeZordered(li, Seq(col("x"), col("y")), 8, 8, s"$base/z")
    li.repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$base/linear")
    def fileSpans(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .agg(avg("xs"), avg("ys")).head
    val zs = fileSpans(s"$base/z")
    val ls = fileSpans(s"$base/linear")
    val (zx, zy) = (zs.getDouble(0), zs.getDouble(1))
    val (lx, ly) = (ls.getDouble(0), ls.getDouble(1))
    // linear: x tight, y unconstrained (~full range per file).
    // z: both dims bounded — a 2^13-cell Morton segment spans <= ~128
    // per dim plus partitioner boundary slop.
    assert(ly > 180, s"linear y-span should be ~full range, got $ly")
    assert(zy < 0.75 * ly, s"z y-span $zy not < 0.75 * linear $ly")
    assert(zx < 180, s"z x-span should stay bounded, got $zx (linear $lx)")
    // file-skipping consequence: a 4-wide point-ish predicate on y
    // intersects every linear file but only the z files whose segment
    // covers that y-quadrant.
    def intersecting(path: String): Long = spark.read.parquet(path)
      .groupBy(input_file_name()).agg(min("y").as("lo"), max("y").as("hi"))
      .where(col("lo") <= 103 && col("hi") >= 100).count()
    val zHit = intersecting(s"$base/z")
    val lHit = intersecting(s"$base/linear")
    assert(lHit == 8, s"linear layout should have all 8 files hit, got $lHit")
    assert(zHit < lHit, s"z layout should skip files: $zHit vs $lHit")
  }
}
