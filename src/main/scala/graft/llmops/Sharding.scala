package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic shard assignment and export — the last stage of a
  * training-data pipeline: turn a curated corpus into N reproducible
  * shards whose contents and internal order are a pure function of the
  * data (no Spark partitioning accident, no `rand()`), so a re-run on
  * different cluster geometry byte-reproduces the dataset a trainer
  * consumes.
  *
  * shard = hash60(id) mod N and the within-shard sort key is the same
  * hash — a deterministic global shuffle: documents land in
  * pseudo-random order, adjacent source documents are separated, and
  * every engine agrees on the layout. At 100 TB the write is
  * `repartition(N, shard)` + sortWithinPartitions + `partitionBy` —
  * one exchange, one file set per shard, no driver involvement.
  */
object Sharding {

  /** Add deterministic (shard, sort_key) columns. */
  def assignShards(df: DataFrame, idCol: String, nShards: Int)
      : DataFrame = {
    val h = TextOps.hash60(col(idCol).cast("string"))
    df.withColumn("sort_key", h)
      .withColumn("shard", (h % nShards).cast("int"))
  }

  /** Per-shard manifest: the summary a dataset release ships so a
    * consumer can verify a shard set without re-reading it — doc
    * count, token mass, and the hash-range endpoints (an integrity
    * spot-check: re-hashing a shard's ids must reproduce min/max). */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame =
    assignShards(df, idCol, nShards)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col(textCol))).cast("long"))
          .as("total_tokens"),
        min(col("sort_key")).as("min_key"),
        max(col("sort_key")).as("max_key"))

  /** Write the corpus as N deterministic shards:
    * `.../shard=K/part-*.parquet`, rows inside each shard ordered by
    * the hash sort key. `partitionBy("shard")` alone fixes the output
    * LAYOUT (one directory per shard value, reproducible contents and
    * row order via the sort); `repartition(n, shard)` only bounds the
    * task count so each shard is written by few tasks rather than
    * every task. Hash-partitioning on the shard value can collide two
    * shard values into one task (and leave others empty), so
    * one-file-per-shard is typical but not guaranteed — determinism
    * and layout never depend on it. */
  def writeSharded(spark: SparkSession, df: DataFrame, idCol: String,
      nShards: Int, path: String): Unit =
    assignShards(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("sort_key"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
}
