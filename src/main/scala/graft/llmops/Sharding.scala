package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Rendezvous (highest-random-weight) shard assignment: each row
    * goes to `argmax over nodes of hash60(id ∥ "@" ∥ node)` — ties (a
    * 1-in-2⁶⁰ event, but semantics must be total) break on node name
    * ascending. Unlike `hash mod N` ([[assignShards]]), ADDING a node
    * moves only the ~1/(N+1) of rows whose new argmax IS the new node
    * and nothing else — the property that makes incremental
    * resharding of a 100 TB store an append, not a rewrite
    * (RendezvousSpec-style monotonicity is asserted in LakeOpsSpec).
    *
    * Pure per-row compute over a literal node list: no shuffle, no
    * broadcast, codegen-friendly. The argmax folds as
    * `sort_array(array(struct(-score, node)))[0]` — min of the
    * negated score is max score, node ascending on ties. */
  def rendezvousAssign(df: DataFrame, idCol: String,
      nodes: Seq[String]): DataFrame = {
    val scored = nodes.map { nd =>
      struct(
        (-TextOps.hash60(
          concat(col(idCol).cast("string"), lit("@" + nd)))).as("ns"),
        lit(nd).as("node"))
    }
    df.withColumn("node",
      sort_array(array(scored: _*)).getItem(0).getField("node"))
  }

  /** Rebalance audit for [[rendezvousAssign]]: the old→new transition
    * matrix when the node set changes — the measurement behind
    * rendezvous hashing's selling point (adding a node moves only the
    * ~1/(N+1) of keys whose new-node score beats their old argmax;
    * mod-N resharding would move ~N/(N+1) of them). Both assignments
    * are computed in the SAME narrow projection — one scan, zero
    * joins, one count aggregation; rows with old = new are the stable
    * mass, so `1 − Σ_stay/Σ_all` is the measured movement. */
  def rendezvousRebalance(df: DataFrame, idCol: String,
      oldNodes: Seq[String], newNodes: Seq[String]): DataFrame =
    rendezvousAssign(
        rendezvousAssign(df, idCol, oldNodes)
          .withColumnRenamed("node", "old_node"),
        idCol, newNodes)
      .withColumnRenamed("node", "new_node")
      .groupBy(col("old_node"), col("new_node"))
      .agg(count(lit(1)).as("n_docs"))

  /** Exact global row number over (`sortCol`, `idCol`) WITHOUT a
    * single-partition window. `row_number() OVER (ORDER BY ...)` pulls
    * the whole table through one task — the one window shape that can
    * never scale. Decompose instead:
    *
    *   rn(row) = prefix(sortCol) + rank-within-sortCol(idCol)
    *
    * where `prefix` is the running count of rows with a strictly
    * smaller sort value — computed on the per-value count table (as
    * many rows as DISTINCT sort values; its window runs on that tiny
    * table) and broadcast-joined back — and the within-value rank is
    * an ordinarily-partitioned window. Both heavy stages are fully
    * distributed; only the distinct-value table is serial, which for
    * any bounded-domain sort key (lengths, dates, scores) is nothing.
    */
  def globalRowNumber(df: DataFrame, sortCol: String, idCol: String)
      : DataFrame = {
    val prefix = df.groupBy(col(sortCol)).agg(count(lit(1)).as("cnt"))
      .withColumn("prefix",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col(sortCol))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(sortCol), col("prefix"))
    df.join(broadcast(prefix), Seq(sortCol))
      .withColumn("rn",
        col("prefix") + row_number().over(
          Window.partitionBy(col(sortCol)).orderBy(col(idCol))))
      .drop("prefix")
  }

  /** Equi-depth (range) shard manifest: NTILE(`nShards`) semantics over
    * the total order (`sortCol`, `idCol`), built on [[globalRowNumber]]
    * so no stage is single-partition. The manifest rows are the cut
    * points `repartitionByRange` would need at write time — but exact
    * (NTILE's first `total mod n` shards take the extra row), where
    * repartitionByRange derives approximate cuts by sampling. Per
    * shard: row count, sort-value endpoints, and total mass. */
  def rangeShardManifest(df: DataFrame, sortCol: String, idCol: String,
      nShards: Int): DataFrame = {
    val withRn = globalRowNumber(df, sortCol, idCol)
    // NTILE(n) over T rows: base = T div n, rem = T mod n; shards
    // 1..rem have base+1 rows. Row r (1-indexed) maps to
    //   r <= rem*(base+1) ? (r-1) div (base+1) + 1
    //                     : rem + (r-1-rem*(base+1)) div base + 1
    // — exact integer arithmetic (`div`, never IEEE `/`), no window.
    // T arrives as a one-row broadcast scalar (the same one-DAG idiom
    // as q57's tf-idf).
    val t = df.agg(count(lit(1)).as("total"))
    val joined = withRn.crossJoin(broadcast(t))
    val shard = expr(
      s"""CAST(CASE
         |  WHEN rn <= (total % $nShards) * ((total div $nShards) + 1)
         |  THEN (rn - 1) div ((total div $nShards) + 1)
         |  ELSE (total % $nShards) +
         |       (rn - 1 - (total % $nShards) * ((total div $nShards) + 1))
         |         div (total div $nShards)
         |END AS INT) + 1""".stripMargin)
    joined.withColumn("shard", shard)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(sortCol)).as("min_sort"),
        max(col(sortCol)).as("max_sort"),
        sum(col(sortCol).cast("long")).as("mass"))
  }

  /** Z-order (Morton) key: interleave the low `bits` bits of k integer
    * bucket columns — bit i of column j lands at position i*k + j. A
    * single codegen'd arithmetic expression (the terms occupy disjoint
    * bit positions, so `+` IS the bitwise OR), no UDF.
    *
    * Why it matters at 100 TB: sorting a table by ONE column tightens
    * per-file min/max ranges on that column only; scans filtering the
    * OTHER dimensions still open every file. Sorting by the Morton key
    * tightens per-file ranges on ALL interleaved dimensions at once
    * (each file covers a z-curve segment ≈ a small hyper-rectangle),
    * so parquet row-group/file skipping works for multi-dimensional
    * predicates — the same layout trick Delta/Iceberg `OPTIMIZE
    * ZORDER BY` applies. ZorderSpec measures the effect on real
    * footers: the secondary dimension's per-file span shrinks ~16x
    * vs a linear sort at equal file count.
    *
    * Callers pass already-bucketed non-negative ints (e.g.
    * `col % (1<<bits)` or a rank bucket); bucketing choice is the
    * caller's because it is data-dependent (ranks equalize skew,
    * modulo preserves arithmetic locality). */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "zorderKey wants >= 2 columns")
    require(bits * cols.size <= 62, "zorder key must fit a signed long")
    val k = cols.size
    val terms = for {
      i <- 0 until bits; (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _)
  }

  /** Write `df` z-clustered on `dims`: range-repartition by the Morton
    * key (global order, balanced files via sampled cuts — the exchange
    * a layout rewrite pays once), sort within partitions, drop the key,
    * write parquet. One shuffle; file count = `nFiles`. */
  def writeZordered(df: DataFrame, dims: Seq[Column], bits: Int,
      nFiles: Int, path: String): Unit =
    df.withColumn("__zkey", zorderKey(dims, bits))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
}
