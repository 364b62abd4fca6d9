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

  test("bpeEncodeTokens: merges apply in PRIORITY order — reversing " +
    "the rank order changes the segmentation") {
    import spark.implicits._
    val toks = Seq("abc").toDF("tok")
    def pieces(merges: Seq[(String, String)]) =
      graft.llmops.Tokenize.bpeEncodeTokens(toks, merges)
        .collect().map(r => r.getSeq[String](2)).head.toSeq
    // rank order (a,b) then (b,c): [a,b,c] -> [ab,c]; the later
    // (b,c) merge finds no bare 'b' left
    assert(pieces(Seq(("a", "b"), ("b", "c"))) == Seq("ab", "c"))
    // reversed priority: (b,c) first -> [a,bc]
    assert(pieces(Seq(("b", "c"), ("a", "b"))) == Seq("a", "bc"))
  }

  test("bpeEncodeTokens composes with learnBpeMerges: the apply stage " +
    "reproduces the training segmentation (q197's per-source totals)") {
    import spark.implicits._
    val df = Seq(
      ("low low low low low", "A"), ("lower lower", "A"),
      ("newest newest newest", "B"), ("widest", "B")).toDF("text", "source")
    val merges = TextOps.learnBpeMerges(df, "text", 4)
    // standalone apply over the corpus' distinct tokens ...
    val stats = graft.llmops.Tokenize
      .bpeEncodeStats(df.withColumn("doc_id",
          org.apache.spark.sql.functions.monotonically_increasing_id()),
        "doc_id", "text", merges)
    // ... must reproduce the training-fused bpeCompressionBySource
    // numbers: low->1 piece, lower->3, newest->4, widest->4
    val perWord = graft.llmops.Tokenize
      .bpeEncodeTokens(Seq("low", "lower", "newest", "widest").toDF("tok"),
        merges)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(perWord == Map("low" -> 1L, "lower" -> 3L,
      "newest" -> 4L, "widest" -> 4L))
    val totals = stats.agg(
      org.apache.spark.sql.functions.sum("n_tokens"),
      org.apache.spark.sql.functions.sum("n_chars"),
      org.apache.spark.sql.functions.sum("n_pieces"))
      .collect().head
    // q197 fixture: A (7 words, 25 chars, 11 pieces) + B (4, 24, 16)
    assert((totals.getLong(0), totals.getLong(1), totals.getLong(2))
      == ((11L, 49L, 27L)))
  }

  test("BPE apply diverges from max-munch: a whole-word vocab piece " +
    "the merge ladder can't build") {
    import spark.implicits._
    val docs = Seq((1L, "hello hello hello world")).toDF("doc_id", "text")
    // wordpiece vocab holds 'hello' whole -> max-munch encodes it as
    // ONE piece
    val v = graft.llmops.Tokenize.vocab(docs, "text", topWords = 2,
      charWords = 2)
    val mm = graft.llmops.Tokenize
      .encodeTokens(Seq("hello").toDF("tok"), v)
      .collect().map(r => r.getLong(2)).head
    assert(mm == 1L)
    // one learned merge (best pair: (e,l), the lexicographic winner
    // of the count-3 tie) can only reach [h,el,l,o] -> 4 pieces:
    // merge ORDER, not piece SET, decides
    val merges = TextOps.learnBpeMerges(docs, "text", 1)
    val bpe = graft.llmops.Tokenize
      .bpeEncodeTokens(Seq("hello").toDF("tok"), merges)
      .collect().map(r => (r.getSeq[String](2).toSeq, r.getLong(3))).head
    assert(bpe == ((Seq("h", "el", "l", "o"), 4L)))
    assert(bpe._2 != mm)
  }

  test("bpeFertilityByGroup: totals and ratios under the true encoder") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low lower", "en"),
      (2L, "newest widest", "de")).toDF("doc_id", "text", "lang")
    val merges = TextOps.learnBpeMerges(
      Seq("low low low low low", "lower lower",
        "newest newest newest", "widest").toDF("text"), "text", 4)
    val got = graft.llmops.Tokenize
      .bpeFertilityByGroup(docs, "doc_id", "text", "lang", merges)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // en: low(1pc)+low(1)+lower(3) = 3 toks, 11 chars, 5 pieces
    assert(got("en") == ((1L, 3L, 11L, 5L, 5.0 / 3.0)))
    // de: newest(4)+widest(4) = 2 toks, 12 chars, 8 pieces
    assert(got("de") == ((1L, 2L, 12L, 8L, 4.0)))
  }
}
