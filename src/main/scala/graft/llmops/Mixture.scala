package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mixture weights: turn per-domain corpus counts into
  * sampling weights `w_d ∝ n_d^α` (α = 0.5 here — the standard
  * "temperature" that up-weights small domains/languages so a tail
  * language isn't drowned by the head; α=1 is proportional, α=0 is
  * uniform). The output is what a data-loader consumes to sample
  * domains during training.
  *
  * Determinism contract: `sqrt` is IEEE-754 correctly rounded in every
  * engine, and the normalizing denominator is a LEFT FOLD over the
  * groups in group-key order (sort_array + `aggregate`, the same
  * ordered-fold idiom as the vector math in `Similarity`) — never a
  * parallel double sum whose association depends on partitioning. The
  * group list is aggregated to ONE row (#groups = #languages/domains,
  * trivially small at any corpus size; the heavy work is the count
  * aggregation, one exchange) and joined back as a broadcast scalar.
  *
  * α other than 1/2 needs `pow`, whose last-bit rounding is
  * engine-specific — callers wanting that trade bit-reproducibility
  * for generality; this operator deliberately stays on `sqrt`.
  */
object Mixture {

  /** Per-`groupCol` doc counts and normalized sqrt-law weights:
    * (group, n_docs, w_raw = sqrt(n), weight = w_raw / Σ w_raw). */
  def sqrtMixtureWeights(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val denom = counts
      .agg(sort_array(collect_list(struct(col(groupCol), col("n_docs"))))
        .as("gs"))
      .select(aggregate(col("gs"), lit(0.0),
        (acc, g) => acc + sqrt(g.getField("n_docs").cast("double")))
        .as("denom"))
    counts.crossJoin(broadcast(denom))
      .select(col(groupCol), col("n_docs"),
        sqrt(col("n_docs").cast("double")).as("w_raw"),
        (sqrt(col("n_docs").cast("double")) / col("denom")).as("weight"))
  }
}
