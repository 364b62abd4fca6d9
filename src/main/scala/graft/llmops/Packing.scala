package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing audits — the step between a curated
  * corpus and an LLM training run: documents become fixed-length
  * context windows, and the packing policy decides how much compute
  * is spent on padding and how many documents straddle a window
  * boundary. Two standard policies are audited per shard:
  *
  *  - concat-and-chunk (the GPT-3 recipe): concatenate the shard's
  *    token stream in its deterministic order and cut every `ctx`
  *    tokens — zero padding except the final partial window, but
  *    documents cross window boundaries;
  *  - greedy no-split first-fit (the "pad, don't split" recipe of
  *    sequence-packing work, e.g. Krell et al. 2021): each document
  *    goes whole into the current window if it fits, else a new
  *    window opens — no boundary crossings, padding instead.
  *
  * Both run per [[Sharding.assignShards]] shard in the shard's
  * deterministic (hash, id) order, so the audit is reproducible in
  * any engine and the sequential fold the greedy policy genuinely
  * requires is confined to one shard — the unit a real training-data
  * writer packs independently anyway. 100 TB shape: one narrow map
  * (token count), one exchange on the shard key, then per-shard
  * window/fold work; parallelism = shard count, which the caller
  * scales with the corpus so a shard stays executor-sized.
  */
object Packing {

  /** Greedy fold state encoded in one BIGINT: `bins << 30 | fill`.
    * Pure integer ops (shift/mask/add) keep the fold bit-exact in
    * every engine — no doubles anywhere in the recurrence. Holds
    * exactly while fill ≤ ctx < 2^30 and bins < 2^33 per shard. */
  private val FillBits = 30
  private val FillMask = (1L << FillBits) - 1L

  private def shardedCounts(df: DataFrame, idCol: String,
      textCol: String, nShards: Int): DataFrame =
    Sharding.assignShards(
      df.select(col(idCol),
        size(TextOps.tokens(col(textCol))).cast("long").as("nt")),
      idCol, nShards)

  /** Concat-and-chunk packing audit. Per shard: document/token
    * counts, the number of `ctx`-token windows the stream cuts into,
    * how many documents straddle a window boundary, and the padding
    * waste of the final partial window. The only per-shard state is
    * a running token offset — a window-function cumulative sum
    * partitioned by shard (never global), so the policy itself needs
    * no sequential fold. */
  def concatChunkStats(df: DataFrame, idCol: String, textCol: String,
      ctx: Int = 512, nShards: Int = 16): DataFrame = {
    require(ctx > 0 && ctx <= FillMask,
      s"concatChunkStats: ctx=$ctx out of range")
    require(nShards > 0, s"concatChunkStats: nShards=$nShards")
    val ctxL = ctx.toLong
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("sort_key"), col(idCol))
    val placed = shardedCounts(df, idCol, textCol, nShards)
      .withColumn("start",
        coalesce(sum(col("nt")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // integer bin indexes: longs stay well under 2^53 per shard, so
    // the double division + floor below is exact; spelled with floor
    // to match the oracle's integer `//`
    val binned = placed
      .withColumn("start_bin",
        floor(col("start").cast("double") / ctxL.toDouble).cast("long"))
      .withColumn("end_bin",
        floor((col("start") + col("nt") - 1L).cast("double") /
          ctxL.toDouble).cast("long"))
      .withColumn("crosses",
        col("nt") > 0L && col("end_bin") > col("start_bin"))
    binned.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        sum(when(col("crosses"), 1L).otherwise(0L)).as("n_crossing"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        floor((col("n_tokens") + ctxL - 1L).cast("double") /
          ctxL.toDouble).cast("long").as("n_windows"),
        col("n_crossing"),
        (col("n_crossing").cast("double") /
          col("n_docs").cast("double")).as("cross_frac"))
      .withColumn("pad_tokens",
        col("n_windows") * ctxL - col("n_tokens"))
      .withColumn("pad_frac",
        col("pad_tokens").cast("double") /
          (col("n_windows") * ctxL).cast("double"))
  }

  /** Greedy no-split packing audit. Documents longer than `ctx` are
    * truncated to `ctx` (counted in `n_truncated`); each document
    * then goes whole into the current window when it fits, else
    * opens a new one. The recurrence is inherently sequential, so it
    * runs as ONE ordered `aggregate` fold per shard over the
    * bit-packed `bins<<30|fill` state — shard-bounded work by the
    * sharding contract, integer-only so every engine reproduces it
    * exactly. Output per shard: window count, the lower bound
    * `ceil(tokens/ctx)` any policy must pay, and the padding the
    * no-split constraint costs on top. */
  def greedyPackStats(df: DataFrame, idCol: String, textCol: String,
      ctx: Int = 512, nShards: Int = 16): DataFrame = {
    require(ctx > 0 && ctx <= FillMask,
      s"greedyPackStats: ctx=$ctx out of range")
    require(nShards > 0, s"greedyPackStats: nShards=$nShards")
    val ctxL = ctx.toLong
    val folded = shardedCounts(df, idCol, textCol, nShards)
      .withColumn("len", least(col("nt"), lit(ctxL)))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        sum(when(col("nt") > ctxL, 1L).otherwise(0L))
          .as("n_truncated"),
        sum(col("len")).as("packed_tokens"),
        aggregate(
          transform(
            sort_array(collect_list(struct(col("sort_key"),
              col(idCol).as("id"), col("len")))),
            s => s.getField("len")),
          lit(ctxL), // bins=0, fill=ctx — first document opens bin 1
          (acc, x) =>
            when(acc.bitwiseAND(lit(FillMask)) + x <= ctxL, acc + x)
              .otherwise((shiftright(acc, FillBits) + 1L) *
                lit(FillMask + 1L) + x))
          .as("st"))
    folded.select(col("shard"), col("n_docs"), col("n_tokens"),
        col("n_truncated"), col("packed_tokens"),
        shiftright(col("st"), FillBits).as("n_windows"),
        floor((col("packed_tokens") + ctxL - 1L).cast("double") /
          ctxL.toDouble).cast("long").as("windows_lower_bound"))
      .withColumn("pad_tokens",
        col("n_windows") * ctxL - col("packed_tokens"))
      .withColumn("pad_frac",
        col("pad_tokens").cast("double") /
          (col("n_windows") * ctxL).cast("double"))
  }
}
