package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.{Mixture, Packing, Sharding}

/** Semantic invariants for the sequence-packing audits and the
  * DoReMi-style domain reweighting. Value-level cross-engine parity
  * is the oracle gate's job (q250-q252); these pin the policy
  * semantics — conservation, bounds, the greedy fold against a
  * straight Scala replay, and the MWU direction. */
class PackingSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-pack-test")
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("concatChunk: token conservation, window count, pad bound") {
    val df = corpus((1L, "a b c"), (2L, "d e f g h i j"),
      (3L, "k"), (4L, "l m n o p"), (5L, "q r s t u v w x y z a2 b2"))
    val got = Packing.concatChunkStats(df, "doc_id", "text",
      ctx = 10, nShards = 2).collect()
    assert(got.map(_.getAs[Long]("n_tokens")).sum == 28L)
    assert(got.map(_.getAs[Long]("n_docs")).sum == 5L)
    got.foreach { r =>
      val (tok, win, pad) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_windows"), r.getAs[Long]("pad_tokens"))
      assert(win == (tok + 9) / 10)
      assert(pad == win * 10 - tok && pad >= 0 && pad < 10)
    }
  }

  test("concatChunk: exact-ctx docs never cross, ctx+1 docs always do") {
    val exact = corpus((1 to 6).map(i =>
      (i.toLong, Seq.fill(10)("w").mkString(" "))): _*)
    Packing.concatChunkStats(exact, "doc_id", "text", 10, 2)
      .collect().foreach { r =>
        assert(r.getAs[Long]("n_crossing") == 0L)
        assert(r.getAs[Long]("n_windows") == r.getAs[Long]("n_docs"))
      }
    val over = corpus((1 to 6).map(i =>
      (i.toLong, Seq.fill(11)("w").mkString(" "))): _*)
    Packing.concatChunkStats(over, "doc_id", "text", 10, 2)
      .collect().foreach { r =>
        assert(r.getAs[Long]("n_crossing") == r.getAs[Long]("n_docs"))
      }
  }

  test("greedyPack: fold matches a straight Scala replay of the shard order") {
    val lens = Seq(3, 7, 12, 1, 9, 5, 13, 2, 8, 6, 4, 11)
    val df = corpus(lens.zipWithIndex.map { case (n, i) =>
      ((i + 1).toLong, Seq.fill(n)("w").mkString(" "))
    }: _*)
    val ctx = 13
    // replay: same shard assignment, same (hash, id) order, same
    // truncate-then-first-fit recurrence
    val ordered = Sharding.assignShards(
        df.select($"doc_id",
          size(split($"text", " ")).cast("long").as("nt")),
        "doc_id", 2)
      .collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("sort_key"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("nt")))
      .groupBy(_._1).view.mapValues { rs =>
        val ls = rs.sortBy(t => (t._2, t._3)).map(_._4 min ctx)
        ls.foldLeft((0L, ctx.toLong)) { case ((bins, fill), l) =>
          if (fill + l <= ctx) (bins, fill + l) else (bins + 1, l)
        }._1
      }.toMap
    val got = Packing.greedyPackStats(df, "doc_id", "text", ctx, 2)
      .collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("n_windows"))
      .toMap
    assert(got == ordered)
  }

  test("greedyPack: truncation, lower bound, padding arithmetic") {
    val df = corpus((1L, Seq.fill(25)("w").mkString(" ")),
      (2L, "a b c"), (3L, Seq.fill(9)("x").mkString(" ")),
      (4L, "y z"))
    val got = Packing.greedyPackStats(df, "doc_id", "text",
      ctx = 10, nShards = 1).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_truncated") == 1L)
    assert(r.getAs[Long]("packed_tokens") == 10L + 3L + 9L + 2L)
    assert(r.getAs[Long]("n_windows") >=
      r.getAs[Long]("windows_lower_bound"))
    assert(r.getAs[Long]("pad_tokens") ==
      r.getAs[Long]("n_windows") * 10L -
        r.getAs[Long]("packed_tokens"))
  }

  test("greedyPack: exact-ctx docs pack one per window, zero pad") {
    val df = corpus((1 to 5).map(i =>
      (i.toLong, Seq.fill(10)("w").mkString(" "))): _*)
    Packing.greedyPackStats(df, "doc_id", "text", 10, 2)
      .collect().foreach { r =>
        assert(r.getAs[Long]("n_windows") == r.getAs[Long]("n_docs"))
        assert(r.getAs[Long]("pad_tokens") == 0L)
      }
  }

  test("doremi: weights sum to 1 per round and shift toward excess loss") {
    // clean domain = reference-like text; junk domain = all-OOV
    val docs = (
      (1 to 8).map(i => (i.toLong, "the cat sat on the mat", "en",
        "clean")) ++
      (9 to 16).map(i => (i.toLong, s"zz$i qq$i xx$i vv$i ww$i",
        "xx", "junk"))).toDF("doc_id", "text", "lang", "source")
    val ref = docs.filter($"lang" === "en")
    val got = Mixture.doremiWeights(docs, ref, "doc_id", "text",
      "source", rounds = 4).collect()
    assert(got.length == 8) // 4 rounds x 2 domains
    (1 to 4).foreach { r =>
      val round = got.filter(_.getAs[Int]("round") == r)
      val s = round.map(_.getAs[Double]("weight")).sum
      assert(math.abs(s - 1.0) < 1e-9, s"round $r sums to $s")
      val w = round.map(x =>
        x.getAs[String]("source") -> x.getAs[Double]("weight")).toMap
      assert(w("junk") > w("clean"),
        s"round $r: junk ${w("junk")} vs clean ${w("clean")}")
    }
    // MWU with a fixed positive excess keeps up-weighting
    val junk = got.filter(_.getAs[String]("source") == "junk")
      .sortBy(_.getAs[Int]("round")).map(_.getAs[Double]("weight"))
    assert(junk.zip(junk.tail).forall { case (a, b) => b >= a })
  }

  test("doremi: rounds out of range rejected") {
    val df = Seq((1L, "a b", "en", "s")).toDF(
      "doc_id", "text", "lang", "source")
    intercept[IllegalArgumentException] {
      Mixture.doremiWeights(df, df, "doc_id", "text", "source",
        rounds = 0)
    }
  }
}
