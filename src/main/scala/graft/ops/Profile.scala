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

  /** Referential-integrity audit over declared FK relationships:
    * for each (name, child, childKey, parent, parentKey), how many
    * child rows have no parent (orphans) out of how many total. One
    * LEFT ANTI join per relationship — each plans as a broadcast or
    * shuffled hash join on the key, never a cartesian — then a
    * one-row count, unioned into the report frame. A null child key
    * never matches (SQL join semantics), so it counts as an orphan —
    * the audit's job is to surface exactly those. */
  def fkAudit(spark: SparkSession,
      rels: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame =
    rels.map { case (name, child, ck, parent, pk) =>
      val orphans = child.select(col(ck))
        .join(parent.select(col(pk)), col(ck) === col(pk), "left_anti")
      child.agg(count(lit(1)).as("n_rows"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("relationship"), col("n_rows"),
          col("n_orphans"))
    }.reduce(_.unionByName(_))
}
