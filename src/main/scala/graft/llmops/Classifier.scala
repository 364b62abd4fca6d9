package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed linear-classifier INFERENCE — the fastText shape
  * (`wordNgrams=2`, `bucket=B` feature hashing) that quality-gates
  * corpora in CCNet-style pipelines. The engine piece is the scoring
  * plumbing: explode unigram + bigram features, hash each into one
  * of B weight buckets, sum the integer weights, ONE terminal
  * division per document. A trained model drops in as a B-row weight
  * table without changing the plan; here the weights are a
  * deterministic pseudo-model so the whole scorer is oracle-checkable
  * end to end.
  */
object Classifier {

  /** Integer bucket weight of the deterministic pseudo-model:
    * w(bucket) = (bucket · 2654435761) mod 1001 − 500 ∈ [−500, 500]
    * (Knuth's multiplicative constant scrambles adjacent buckets).
    * Exposed so specs and oracles can replay it. */
  def bucketWeight(bucket: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    (bucket * lit(2654435761L)) % lit(1001L) - lit(500L)

  /** Per-document linear margin over hashed unigram + bigram
    * features: margin = Σ w(h(f) mod B) / (500 · n_feats) ∈ [−1, 1].
    * The sum is integral (order-free, exact at any parallelism); the
    * single division is the only IEEE op. No sigmoid on purpose —
    * exp is not cross-engine reproducible, and gating/ranking only
    * needs the monotone margin.
    *
    * One token explode + one hash aggregation per document; weights
    * are computed inline (a trained B-row table would broadcast).
    * Returns (idCol, carryCols…, n_feats, margin). */
  def hashedBigramMargin(df: DataFrame, idCol: String,
      textCol: String, carryCols: Seq[String], buckets: Int)
      : DataFrame = {
    require(buckets >= 1, s"hashedBigramMargin: buckets=$buckets")
    val keep = col(idCol) +: carryCols.map(col)
    // ONE explode of unigrams ++ bigrams — a single corpus scan (a
    // union of two explodes would read the text column twice).
    // Bigram feature = "w1 w2": tokens are space-split, so a joined
    // bigram can never collide with a unigram.
    val tk = df.select(keep :+ TextOps.tokens(col(textCol)).as("t"): _*)
    val bigr = when(size(col("t")) >= 2, zip_with(
      slice(col("t"), lit(1), size(col("t")) - 1),
      slice(col("t"), lit(2), size(col("t")) - 1),
      (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    tk.select(keep :+ explode(concat(col("t"), bigr)).as("f"): _*)
      .withColumn("wi", bucketWeight(
        pmod(TextOps.hash60(col("f")), lit(buckets.toLong))))
      .groupBy(keep: _*)
      .agg(sum(col("wi")).as("sw"), count(lit(1)).as("n_feats"))
      .withColumn("margin", col("sw").cast("double") /
        (lit(500.0) * col("n_feats").cast("double")))
      .drop("sw")
  }
}
