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
}
