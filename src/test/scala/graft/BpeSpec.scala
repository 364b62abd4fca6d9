package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.TextOps

/** BPE merge learning (TextOps.learnBpeMerges) pinned on hand-computed
  * corpora: the classic low/lower/newest/widest example, and the
  * overlapping-run case that distinguishes the greedy left-to-right
  * merge from naive replace-all. */
class BpeSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-bpe-test")

  test("classic corpus: merges and counts match the hand derivation") {
    import spark.implicits._
    val df = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest",
      "widest").toDF("text")
    val got = TextOps.learnBpeMerges(df, "text", 4)
      .orderBy("merge_rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // by-hand: pair counts l-o:7 o-w:7 (tie -> lexicographic lhs) ...
    assert(got == Seq(
      (1, "l", "o", 7L),
      (2, "lo", "w", 7L),
      (3, "e", "s", 4L),
      (4, "es", "t", 4L)))
  }

  test("overlapping runs merge greedily left-to-right") {
    import spark.implicits._
    val df = Seq("aaaaa aaaaa").toDF("text")
    val got = TextOps.learnBpeMerges(df, "text", 2)
      .orderBy("merge_rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    // word 'aaaaa' x2: 4 overlapping (a,a) pairs per word -> count 8;
    // greedy merge gives [aa,aa,a], NOT [aaaa,a] or replace-all
    // artifacts. Round 2: pairs (aa,aa):2 and (aa,a):2 tie ->
    // rhs 'a' < 'aa' picks (aa,a).
    assert(got == Seq(
      (1, "a", "a", 8L),
      (2, "aa", "a", 2L)))
  }

  test("per-source compression from the encoded vocabulary") {
    import spark.implicits._
    val df = Seq(
      ("low low low low low", "A"), ("lower lower", "A"),
      ("newest newest newest", "B"), ("widest", "B")).toDF("text", "source")
    val got = TextOps.bpeCompressionBySource(df, "text", "source", 4)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // global merges (l,o),(lo,w),(e,s),(es,t) encode low->1 symbol,
    // lower->3, newest->4, widest->4
    assert(got == Seq(
      ("A", 7L, 25L, 11L),
      ("B", 4L, 24L, 16L)))
  }

  test("single-char and empty tokens do not break the loop") {
    import spark.implicits._
    val df = Seq("x y  z", "ab ab").toDF("text")
    val got = TextOps.learnBpeMerges(df, "text", 1).collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "a" && got.head.getString(2) == "b")
  }

  test("wordpiece encodeTokens: greedy longest match, UNK consumes " +
    "one char, chars partition exactly") {
    import spark.implicits._
    val vocab = Seq("abc", "ab", "c", "a", "b", "x")
      .toDF("piece")
      .select(org.apache.spark.sql.functions.col("piece"),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("piece")).as("piece_len"))
    val toks = Seq("abcab", "abq", "q", "xabcx").toDF("tok")
    val got = graft.llmops.Tokenize.encodeTokens(toks, vocab)
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got("abcab") == ((5, 2L, 0L))) // abc + ab (longest first)
    assert(got("abq") == ((3, 2L, 1L)))   // ab + UNK(q)
    assert(got("q") == ((1, 1L, 1L)))     // pure UNK
    assert(got("xabcx") == ((5, 3L, 0L))) // x + abc + x
  }

  test("wordpiece encodeStats + learned vocab: end-to-end on the " +
    "hand-derived fixture (rare chars fall to UNK)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world hello xq"),
      (2L, "hello hello world"),
      (3L, "zz top")).toDF("doc_id", "text")
    // top-2 words {hello, world}; chars from top-3 tokens
    // {h,e,l,o,w,r,d,t,p} — x, q, z are all UNK
    val v = graft.llmops.Tokenize.vocab(docs, "text", topWords = 2,
      charWords = 3)
    val got = graft.llmops.Tokenize
      .encodeStats(docs, "doc_id", "text", v)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((4L, 17L, 5L, 2L))) // hello,world,hello + xq=2 UNK
    assert(got(2L) == ((3L, 15L, 3L, 0L)))
    assert(got(3L) == ((2L, 5L, 5L, 2L)))  // zz=2 UNK, top=t+o+p
  }
}
