package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-size frequency sketches.
  *
  * The count-min sketch here is deliberately built from md5-derived
  * hashes (the repo-wide `hash60` convention) instead of an engine RNG,
  * which buys something unusual for a sketch: the whole structure is
  * bit-reproducible in ANY engine, so q155 hash-matches a DuckDB oracle
  * replicating the build and the probe — the estimate itself is
  * cross-engine verified, not just rows-only checked (contrast q55/q153,
  * whose HLL/Bloom internals are engine-private).
  *
  * Scale shape: the build aggregates into a key domain bounded by
  * d×w (e.g. 4×256 = 1024 cells), so partial aggregation collapses the
  * token stream map-side and the exchange carries at most d·w rows PER
  * MAPPER PARTITION regardless of corpus size or vocabulary — this is
  * what replaces the full-vocabulary shuffle of exact counting (q120
  * heavy hitters) when 100 TB of text meets a billion-term vocabulary.
  * Probing joins the (tiny, broadcast) sketch against the probe terms'
  * d buckets; a CMS never undercounts, so `cms_n >= exact_n` always.
  */
object Sketches {

  /** The d·w bucket coordinates of one term: row i hashes
    * `"$i:" + term` so rows are pairwise-independent-ish while staying
    * engine-reproducible (`('0x'||substr(md5(i||':'||t),1,15))::BIGINT
    * % w` in DuckDB — hash60 is 60-bit positive, so `%` agrees). */
  private def bucketStructs(termCol: Column, d: Int, w: Int): Column =
    array((0 until d).map { i =>
      struct(lit(i).as("hrow"),
        (TextOps.hash60(concat(lit(s"$i:"), termCol)) % w).as("bucket"))
    }: _*)

  /** Build the sketch: one pass over the term stream, d coordinates per
    * term, groupBy over the bounded (hrow, bucket) domain. Output is at
    * most d·w rows — broadcastable by construction. */
  def countMinBuild(terms: DataFrame, termCol: String, d: Int,
      w: Int): DataFrame =
    terms
      .select(explode(bucketStructs(col(termCol), d, w)).as("hb"))
      .groupBy(col("hb.hrow").as("hrow"), col("hb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Additive merge: a CMS is LINEAR in its input — counters of the
    * union are the sums of counters — so shard- or batch-local
    * sketches combine exactly (not approximately-on-approximate: the
    * merged sketch is bit-identical to one built over the union, which
    * the spec pins). This is what makes the sketch maintainable
    * incrementally (streaming store) and buildable per-partition at
    * 100 TB without ever co-shuffling the raw term streams. */
  def countMinMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("hrow"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate the frequency of each probe term: min over the d
    * rows of the term's bucket counters. Absent buckets count 0 (a term
    * the sketch never saw estimates 0 only if at least one of its
    * buckets is empty). The sketch side is ≤ d·w rows → broadcast. */
  def countMinEstimate(probes: DataFrame, termCol: String,
      sketch: DataFrame, d: Int, w: Int): DataFrame = {
    val keep = probes.columns.map(col)
    probes
      .select(keep :+
        explode(bucketStructs(col(termCol), d, w)).as("hb"): _*)
      .join(broadcast(sketch),
        col("hb.hrow") === sketch("hrow") &&
          col("hb.bucket") === sketch("bucket"), "left")
      .groupBy(keep: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_n"))
  }
}
