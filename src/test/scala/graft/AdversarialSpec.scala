package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.{Similarity, TextOps}

/** Edge-input totality: the operators must neither throw nor diverge
  * on degenerate rows under ANSI mode (Spark 4 default) — empty and
  * whitespace-only text, unicode and non-BMP emoji, stopword floods,
  * zero/negative/huge embedding vectors. The cross-engine value check
  * for these inputs lives in tools/make_advdata.py + oracle_check;
  * this spec keeps the crash-freedom property inside `sbt test`. */
class AdversarialSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-adv-test")
  import spark.implicits._

  private lazy val docs = Seq(
    "", " ", "   ", "a", "a b", "a b c",
    "the the the the the the",
    "é ü ñ 日本語 中文 한국어 русский",
    "🚀 🌍 🎉 🚀 🌍 🎉 🚀",
    "x'y \"quo\" `tick` \\slash",
    "word " * 50 + "end")
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  private lazy val vecs = Seq(
    (0L, Array.fill(4)(0f)),          // zero norm
    (1L, Array.fill(4)(1e-30f)),      // near-denormal
    (2L, Array.fill(4)(-1f)),
    (3L, Array.fill(4)(3.4e36f)),     // huge
    (4L, Array(0f, 0f, 0f, 1f)))
    .toDF("vec_id", "embedding")

  test("text operators are total on degenerate documents") {
    val n = docs.count()
    assert(TextOps.piiScrub(docs, "doc_id", "text").count() == n)
    assert(TextOps.repetitionMetrics(docs, "doc_id", "text").count() == n)
    assert(TextOps.simhash16(docs, "doc_id", "text").count() == n)
    assert(TextOps.chunkWindows(docs, "doc_id", "text").count() >= n)
    assert(docs.select(TextOps.langId(col("text"))).count() == n)
    assert(docs.select(TextOps.fingerprint(col("text"))).count() == n)
    assert(docs
      .select(col("doc_id") +: TextOps.qualityColumns(col("text")): _*)
      .count() == n)
    // short docs drop out of the shingle-based ops, long ones survive
    assert(TextOps.minhashSignatures(docs, "doc_id", "text").count() > 0)
    assert(TextOps.ngramJaccardPairs(docs, "doc_id", "text",
      minJac = 0.01).count() >= 0)
    // round-3 operators: every doc stays visible with zero counts
    assert(TextOps.decontaminate(docs, docs.limit(1), "doc_id", "text")
      .count() == n)
    assert(TextOps.dupNgramFraction(docs, "doc_id", "text").count() == n)
    assert(TextOps.simhash60(docs, "doc_id", "text").count() == n)
    assert(graft.llmops.Sharding
      .shardManifest(docs, "doc_id", "text", 4)
      .agg(sum(col("n_docs"))).head.getLong(0) == n)
    // round-5 operators
    assert(TextOps.chunkFrequencyFilter(docs, "doc_id", "text")
      .count() == n)
    assert(TextOps.vocabOovRate(docs, "doc_id", "text").count() == n)
    assert(graft.llmops.Retrieval.bm25TopK(docs,
      Seq((0, "the"), (1, "🚀")).toDF("query_id", "term"),
      "doc_id", "text", "query_id", "term").count() >= 1)
    assert(docs.select(call_function("nfc_normalize", col("text")))
      .count() == n)
    val grouped = docs.withColumn("src", pmod(col("doc_id"), lit(2)))
    assert(graft.llmops.Mixture
      .mixtureSample(grouped, "src", "doc_id").count() >= 0)
    assert(graft.llmops.Mixture
      .epochUpsample(grouped, "src", "doc_id").count() >= 0)
    assert(graft.llmops.Mixture
      .groupKSample(grouped, "src", "doc_id", 3).count() <= 6)
    assert(graft.ops.Dedup.editDistanceVerify(
      graft.ops.Dedup.blockedPairs(
        grouped.withColumn("len", length(col("text"))),
        "doc_id", Seq("src", "len"), Seq("text")),
      "text_a", "text_b").count() >= 0)
    // mid-round-5 operators: keyness totals both corpora (empty docs
    // contribute the "" term, both engines agree); bigrams skip
    // single-token docs; the prefix join is total on shingle-less docs
    assert(TextOps.chiSquareKeyness(grouped.filter(col("src") === 0),
      grouped.filter(col("src") === 1), "doc_id", "text", 100)
      .count() >= 1)
    assert(TextOps.bigramCounts(docs, "text", minCount = 1L)
      .count() >= 1)
    assert(TextOps.prefixJaccardJoin(docs, "doc_id", "text", 0.5)
      .count() >= 0)
    // round-6 operators: bloom decontamination total on degenerate
    // docs AND on an eval suite with no shingles at all; CMS build is
    // empty on an empty term stream, estimate then returns all zeros
    assert(TextOps.bloomDecontaminate(docs, docs.limit(1), "doc_id",
      "text").count() == n)
    assert(TextOps.bloomDecontaminate(docs,
      docs.filter(col("doc_id") < 0), "doc_id", "text").count() == n)
    val emptySketch = graft.llmops.Sketches.countMinBuild(
      docs.filter(col("doc_id") < 0)
        .select(explode(TextOps.tokens(col("text"))).as("term")),
      "term", 4, 64)
    assert(emptySketch.count() == 0)
    assert(graft.llmops.Sketches.countMinEstimate(
      Seq("w").toDF("term"), "term", emptySketch, 4, 64)
      .head().getLong(1) == 0L)
  }

  test("twoStageTopK tolerates zero-norm prefixes and empty corpora") {
    // first-4-dims prefix of the zero and axis vectors has zero norm →
    // stage-1 cosine is 0 by the guard, never an ANSI throw
    val wide = vecs.withColumn("embedding",
      concat(col("embedding"), col("embedding")))
    assert(Similarity.twoStageTopK(wide.filter(col("vec_id") === 0),
      wide, "vec_id", "embedding", dPrefix = 4, m = 4, k = 2)
      .count() == 2)
    assert(Similarity.twoStageTopK(wide.filter(col("vec_id") < 0),
      wide, "vec_id", "embedding", dPrefix = 4, m = 4, k = 2)
      .count() == 0)
  }

  test("similarity operators tolerate zero/huge/denormal vectors") {
    // zero-norm cosine = 0 by definition — must not throw (ANSI)
    val top = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") < 2), vecs, "vec_id", "embedding", k = 3)
      .collect()
    assert(top.nonEmpty)
    val zeroCos = vecs.filter(col("vec_id") === 0)
      .select(Similarity.cosine(col("embedding"), col("embedding")))
      .head().getDouble(0)
    assert(zeroCos == 0.0)
    // kmeans over degenerate centroids completes
    val cents = vecs.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cell"), col("embedding").as("cvec"))
    assert(Similarity.kmeansAssign(vecs, "vec_id", "embedding",
      cents, "cell", "cvec").count() == 5)
  }
}
