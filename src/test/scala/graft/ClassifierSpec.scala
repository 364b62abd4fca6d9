package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llmops.Classifier

/** Pins the in-engine quality-classifier TRAINER
  * (Classifier.trainHashedLogistic): a planted two-vocabulary corpus
  * separates (and beats the q257 pseudo-model's AUC), training is
  * bit-deterministic under input shuffling/repartitioning (the
  * floor-quantized integer folds), the fast-sigmoid link obeys its
  * laws, and the trained-weight scorer composes as a gate. */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-classifier-test")
  import spark.implicits._

  /** Planted corpus: `en` docs draw from vocabulary A, `xx` docs from
    * vocabulary B, with a small shared stopword overlap so the split
    * is learnable but not degenerate-by-disjointness. */
  private def planted(nPerClass: Int): Seq[(Long, String, Int)] = {
    val vocabA = Vector("the", "quick", "brown", "fox", "jumps",
      "over", "lazy", "dog", "reads", "daily")
    val vocabB = Vector("zork", "blag", "vrum", "klatz", "grep",
      "snark", "plonk", "wibble", "quux", "flarp")
    val shared = Vector("and", "of")
    def doc(id: Long, v: Vector[String]): String =
      (0 until 12).map(j =>
        if (j % 5 == 4) shared(((id + j) % shared.size).toInt)
        else v(((id * 7 + j * 3) % v.size).toInt)).mkString(" ")
    (0 until nPerClass).map(i =>
      (i.toLong, doc(i.toLong, vocabA), 1)) ++
      (0 until nPerClass).map(i =>
        (1000L + i, doc(1000L + i, vocabB), 0))
  }

  /** Trapezoid-free exact AUC from (score, label) pairs: fraction of
    * (pos, neg) pairs ranked correctly, ties counted half. */
  private def auc(scored: Seq[(Double, Int)]): Double = {
    val pos = scored.filter(_._2 == 1).map(_._1)
    val neg = scored.filter(_._2 == 0).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size.toDouble * neg.size.toDouble)
  }

  test("fastSigmoid: fixed point 1/2 at 0, strictly monotone, " +
    "bounded in (0,1), symmetric") {
    val zs = Seq(-1e6, -10.0, -1.0, -0.1, 0.0, 0.1, 1.0, 10.0, 1e6)
    val got = zs.toDF("z")
      .select(col("z"), Classifier.fastSigmoid(col("z")).as("s"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(0.0) == 0.5)
    zs.foreach(z => assert(got(z) > 0.0 && got(z) < 1.0, s"z=$z"))
    zs.sliding(2).foreach { case Seq(a, b) =>
      assert(got(a) < got(b), s"not monotone at ($a, $b)")
    }
    zs.foreach(z =>
      assert(math.abs((got(z) + got(-z)) - 1.0) < 1e-15, s"z=$z"))
  }

  test("planted corpus separates: trained margins rank en above xx " +
    "with AUC ~ 1, beating the pseudo-model gate") {
    val df = planted(30).toDF("doc_id", "text", "y")
      .withColumn("lang", when(col("y") === 1, "en").otherwise("xx"))
    val w = Classifier.trainHashedLogistic(df, "doc_id", "y", "text",
      512, epochs = 3, lr = 1.0)
    val trained = Classifier
      .marginWithWeights(df, "doc_id", "text", Seq("y"), w, 512)
      .collect().map(r => (r.getAs[Double]("margin"), r.getAs[Int]("y")))
      .toSeq
    val aucTrained = auc(trained)
    assert(aucTrained > 0.99, s"trained AUC=$aucTrained")
    // and the mean margins point the right way
    val mPos = trained.filter(_._2 == 1).map(_._1)
    val mNeg = trained.filter(_._2 == 0).map(_._1)
    assert(mPos.sum / mPos.size > mNeg.sum / mNeg.size)
    // the pseudo-model is label-blind — trained must beat it
    val pseudo = Classifier
      .hashedBigramMargin(df, "doc_id", "text", Seq("y"), 512)
      .collect().map(r => (r.getAs[Double]("margin"), r.getAs[Int]("y")))
      .toSeq
    assert(aucTrained > auc(pseudo) + 0.2,
      s"trained=$aucTrained pseudo=${auc(pseudo)}")
  }

  test("training is bit-deterministic under shuffling and " +
    "repartitioning (order-free integer folds)") {
    val rows = planted(25)
    val a = Classifier.trainHashedLogistic(
      rows.toDF("doc_id", "text", "y"), "doc_id", "y", "text",
      256, epochs = 2)
    val b = Classifier.trainHashedLogistic(
      scala.util.Random.shuffle(rows).toDF("doc_id", "text", "y")
        .repartition(7), "doc_id", "y", "text", 256, epochs = 2)
    def tbl(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(_._1).toSeq
    assert(tbl(a) == tbl(b))
  }

  test("training refuses NULL and non-binary labels instead of " +
    "silently poisoning the gradient") {
    val bad = Seq((1L, "some text here", 3), (2L, "more text", 0))
      .toDF("doc_id", "text", "y")
    intercept[IllegalArgumentException] {
      Classifier.trainHashedLogistic(bad, "doc_id", "y", "text", 64)
    }
    val nul = Seq((1L, "some text here", Some(1)),
      (2L, "more text", Option.empty[Int]))
      .toDF("doc_id", "text", "y")
    intercept[IllegalArgumentException] {
      Classifier.trainHashedLogistic(nul, "doc_id", "y", "text", 64)
    }
  }

  test("weight table is bounded by the bucket count and broadcastable " +
    "by construction; empty weights score margin 0") {
    val df = planted(10).toDF("doc_id", "text", "y")
    val w = Classifier.trainHashedLogistic(df, "doc_id", "y", "text",
      64, epochs = 1)
    assert(w.count() <= 64)
    val empty = spark.range(0).select(col("id").as("bucket"),
      col("id").cast("double").as("w"))
    val zeros = Classifier
      .marginWithWeights(df, "doc_id", "text", Nil, empty, 64)
      .collect().map(_.getAs[Double]("margin"))
    assert(zeros.forall(_ == 0.0))
  }

  /** Planted OVERFIT corpus: every doc is mostly doc-unique tokens
    * (perfectly memorizable through the hashed features) plus one
    * WEAK label signal — "sig" appears in 55% of positives but also
    * 45% of negatives, so generalizable ranking tops out barely
    * above chance while a trainer that memorizes ranks its own
    * training set far better than docs it never saw. */
  private def overfit(nPerClass: Int): Seq[(Long, String, Int)] =
    (0 until 2 * nPerClass).map { i =>
      val y = if (i < nPerClass) 1 else 0
      val id = i.toLong
      val uniq = (0 until 8).map(j => s"u${id}x$j")
      val cut = if (y == 1) 11 else 9
      val sig = if ((id * 2654435761L) % 20 < cut) Seq("sig") else Nil
      (id, (uniq ++ sig).mkString(" "), y)
    }

  test("L2 weight decay: shrinks the trained weight mass, stays " +
    "bit-deterministic under repartitioning, and λ=0 is the " +
    "undecayed trainer exactly") {
    val rows = planted(25)
    val df = rows.toDF("doc_id", "text", "y")
    def mass(l2: Double): Double =
      Classifier.trainHashedLogistic(df, "doc_id", "y", "text", 256,
        epochs = 3, lr = 1.0, l2 = l2)
        .agg(sum(abs(col("w")))).first().getDouble(0)
    assert(mass(0.05) < mass(0.0))
    def tbl(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(_._1).toSeq
    // decayed training replays bit-exactly at any layout
    assert(tbl(Classifier.trainHashedLogistic(df, "doc_id", "y",
        "text", 256, epochs = 3, lr = 1.0, l2 = 0.05)) ==
      tbl(Classifier.trainHashedLogistic(
        scala.util.Random.shuffle(rows).toDF("doc_id", "text", "y")
          .repartition(7), "doc_id", "y", "text", 256,
        epochs = 3, lr = 1.0, l2 = 0.05)))
    // λ=0 multiplies by exactly 1.0 — the undecayed weights
    assert(tbl(Classifier.trainHashedLogistic(df, "doc_id", "y",
        "text", 256, epochs = 2)) ==
      tbl(Classifier.trainHashedLogistic(df, "doc_id", "y",
        "text", 256, epochs = 2, l2 = 0.0)))
    // an out-of-range decay refuses
    intercept[IllegalArgumentException] {
      Classifier.trainHashedLogistic(df, "doc_id", "y", "text", 256,
        lr = 1.0, l2 = 1.5)
    }
  }

  test("held-out margins diverge from training margins on a planted " +
    "overfit corpus — why the gate threshold must come from " +
    "held-out data") {
    val df = overfit(200).toDF("doc_id", "text", "y")
    val split = graft.llmops.Mixture.trainSplit(df, "doc_id")
    val train = split.filter(col("split") === "train")
    val heldout = split.filter(col("split") === "val")
    // wide hash (few collisions) + deeper descent = memorization room
    val w = Classifier.trainHashedLogistic(train, "doc_id", "y",
      "text", 32768, epochs = 5, lr = 1.0)
    def aucOf(side: org.apache.spark.sql.DataFrame): Double =
      auc(Classifier
        .marginWithWeights(side, "doc_id", "text", Seq("y"), w, 32768)
        .collect()
        .map(r => (r.getAs[Double]("margin"), r.getAs[Int]("y")))
        .toSeq)
    val (trainAuc, valAuc) = (aucOf(train), aucOf(heldout))
    // memorized: ranks its own training set well above the weak
    // signal's ceiling (the mean-of-features normalization caps how
    // far memorization can push a single margin, so ~0.85, not 1.0)…
    assert(trainAuc > 0.8, s"train AUC=$trainAuc")
    // …but the held-out ranking collapses toward the weak signal —
    // a threshold read off the training set would be a fiction
    assert(trainAuc > valAuc + 0.15,
      s"train=$trainAuc heldout=$valAuc — no divergence planted?")
  }

  test("holdoutThresholdTable: derived grid spans the held-out " +
    "margins, counts are monotone in the threshold, and the " +
    "confusion columns are consistent") {
    val df = planted(100).toDF("doc_id", "text", "y")
    val rows = Classifier
      .holdoutThresholdTable(df, "doc_id", "y", "text", 512,
        gridSize = 8, epochs = 2)
      .collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.length == 9) // gridSize + 1 candidate thresholds
    val nVal = rows.head.getAs[Long]("n_docs")
    assert(nVal > 0 && rows.forall(_.getAs[Long]("n_docs") == nVal))
    // the lowest candidate is min(margin): everything passes; the
    // highest is max(margin): at least one doc still passes
    assert(rows.head.getAs[Long]("n_pass") == nVal)
    assert(rows.head.getAs[Double]("recall") == 1.0)
    assert(rows.last.getAs[Long]("n_pass") >= 1L)
    // raising the threshold never admits more: n_pass, tp, recall
    // all non-increasing
    Seq[org.apache.spark.sql.Row => Long](
      _.getAs[Long]("n_pass"), _.getAs[Long]("tp"))
      .foreach { f =>
        rows.sliding(2).foreach { case Array(a, b) =>
          assert(f(a) >= f(b), s"not monotone at ${b}")
        }
      }
    rows.foreach { r =>
      val (np, tp, fp, fn) = (r.getAs[Long]("n_pass"),
        r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"))
      assert(tp + fp == np)
      assert(r.getAs[Double]("pass_rate") == np.toDouble / nVal)
      if (np == 0) assert(r.isNullAt(r.fieldIndex("precision")))
      else assert(r.getAs[Double]("precision") == tp.toDouble / np)
      assert(r.getAs[Double]("recall") == tp.toDouble / (tp + fn))
    }
  }
}
