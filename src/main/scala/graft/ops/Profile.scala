package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality profiling and audit operators — the checks a lake runs
  * against every new snapshot before letting consumers at it.
  *
  * Both operators emit LONG-format frames (one row per audited
  * column/relationship) so a single report covers any table width, and
  * both are single-pass per table: `profile` computes every column's
  * stats in ONE aggregation (no per-column scans), `fkAudit` is one
  * anti-join per declared relationship.
  */
object Profile {

  /** Per-column profile of `cols`: row count, null count, exact
    * distinct count — in ONE scan + ONE aggregation (all columns'
    * aggregates live in the same `agg`; Catalyst plans a single
    * hash-aggregate with one `count(DISTINCT)` expand). Output rows:
    * (column, n_rows, n_nulls, n_distinct). Exact distincts by
    * design — the profile is a release gate, not a dashboard; swap in
    * approx_count_distinct (q55) when an estimate suffices. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"), col(s"__nd_$c").as("n_distinct"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.column").as("column"), col("p.n_rows").as("n_rows"),
        col("p.n_nulls").as("n_nulls"),
        col("p.n_distinct").as("n_distinct"))
  }

  /** Schema drift between two snapshots of the same table: which
    * columns were added, removed, or retyped between yesterday's dump
    * and today's — the check that catches an upstream producer
    * silently widening a column before a union-of-snapshots job
    * (`IO.unionSnapshots`) papers over it. Metadata-only: both sides
    * come from parquet footers, no data rows are read. Output:
    * (column, status, old_type, new_type); unchanged columns omitted.
    */
  def schemaDiff(spark: SparkSession, oldPath: String,
      newPath: String): DataFrame = {
    import spark.implicits._
    val a = spark.read.parquet(oldPath).schema
      .map(f => f.name -> f.dataType.simpleString).toMap
    val b = spark.read.parquet(newPath).schema
      .map(f => f.name -> f.dataType.simpleString).toMap
    val rows = (a.keySet ++ b.keySet).toSeq.sorted.flatMap { c =>
      (a.get(c), b.get(c)) match {
        case (Some(t), None) => Some((c, "removed", t, null))
        case (None, Some(t)) => Some((c, "added", null, t))
        case (Some(t1), Some(t2)) if t1 != t2 =>
          Some((c, "retyped", t1, t2))
        case _ => None
      }
    }
    rows.toDF("column", "status", "old_type", "new_type")
  }

  /** Referential-integrity audit over declared FK relationships:
    * for each (name, child, childKey, parent, parentKey), how many
    * child rows have no parent (orphans) out of how many total. ONE
    * pass over each child: a left join against the distinct parent
    * keys (marked with a hit flag) feeds a single aggregate computing
    * both counts — not an anti-join for orphans plus a second scan
    * for the total (that shape audits a 100 TB child twice and cost
    * q114 an EXCHANGES flag in the plan audit). A null child key
    * never matches (SQL join semantics), so it counts as an orphan —
    * the audit's job is to surface exactly those. */
  def fkAudit(spark: SparkSession,
      rels: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame =
    rels.map { case (name, child, ck, parent, pk) =>
      // parent key aliased before the join: when child FK and parent
      // key share a name (both "custkey", the common real-schema case)
      // an unaliased col(ck) === col(pk) is ambiguous and throws
      val p = parent.select(col(pk).as("__pk")).distinct()
        .withColumn("__hit", lit(1))
      child.select(col(ck))
        .join(p, col(ck) === col("__pk"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L))
            .as("n_orphans"))
        .select(lit(name).as("relationship"), col("n_rows"),
          col("n_orphans"))
    }.reduce(_.unionByName(_))

  /** Self-join size forecast WITHOUT running the join: for an
    * equi-self-join on `keyCol` the output cardinality is exactly
    * Σ_k c(k)² — computable from the per-key count table alone. This
    * is the pre-flight check before any pair-producing operator
    * (sessionization cross products, same-user event pairing,
    * candidate generation): `join_rows` says whether the join fits,
    * `max_key_pairs` / `top_key_share` say whether ONE hot key owns
    * the blow-up (→ salt or cap that key, not the whole join).
    * One aggregation to per-key counts, one tiny reduction; all exact
    * integers + a single share division. */
  def selfJoinForecast(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_join_keys"),
        sum(col("n") * col("n")).as("join_rows"),
        max(col("n") * col("n")).as("max_key_pairs"))
      .select(col("n_join_keys"), col("join_rows"),
        col("max_key_pairs"),
        (col("max_key_pairs").cast("double") /
          col("join_rows").cast("double")).as("top_key_share"))

  /** Gate-interaction matrix: for every ordered pair of filter
    * predicates, the exact co-pass count and the cross-product
    * correlation sign `n·n_both − n_a·n_b` (positive = the gates drop
    * the SAME rows, so running both buys less than independence
    * predicts; ~0 = independent, selectivity-ordering the cascade is
    * safe; negative = anti-correlated). This is the measurement that
    * decides whether a filter waterfall (q182) may be reordered by
    * independent selectivities — the correlated case is exactly where
    * naive selectivity ordering misestimates cost.
    *
    * Shape: ONE aggregation computes n, every single-gate count, and
    * every pairwise count simultaneously (k + k(k−1)/2 conditional
    * counters in one pass — never k² scans), then a `stack` unpivot of
    * the one-row result (a union of per-pair selects would re-run the
    * scan per pair). All exact integers; `corr` stays in BIGINT, so
    * callers at 100 TB-row scale should bucket first (n·n_both caps at
    * ~3·10⁹ rows before Long overflow). */
  def gateInteractions(df: DataFrame,
      gates: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(gates.size >= 2,
      s"gateInteractions needs >= 2 gates, got ${gates.size}")
    // names are spliced into a generated stack() expression as quoted
    // literals — restrict to identifier characters rather than escape
    gates.foreach { case (n, _) =>
      require(n.matches("[A-Za-z0-9_]+"),
        s"gate name must be [A-Za-z0-9_]+: '$n'")
    }
    val pairs = for {
      i <- gates.indices; j <- gates.indices if i < j
    } yield (i, j)
    val aggs =
      Seq(count(lit(1)).as("n")) ++
        gates.zipWithIndex.map { case ((_, c), i) =>
          Aggregates.countIf(c).as(s"g$i") } ++
        pairs.map { case (i, j) =>
          Aggregates.countIf(gates(i)._2 && gates(j)._2)
            .as(s"g${i}_$j") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.map { case (i, j) =>
      s"'${gates(i)._1}', '${gates(j)._1}', `g$i`, `g$j`, `g${i}_$j`"
    }.mkString(", ")
    one.select(col("n"), expr(
        s"stack(${pairs.size}, $stackArgs) " +
          "as (gate_a, gate_b, n_a, n_b, n_both)"))
      .select(col("gate_a"), col("gate_b"), col("n"), col("n_a"),
        col("n_b"), col("n_both"),
        (col("n") * col("n_both") - col("n_a") * col("n_b"))
          .as("corr"))
  }
}
