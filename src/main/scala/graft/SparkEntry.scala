package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator family from SURVEY.md §2 contributes
  * `QueryDef`s (Spark implementation + DuckDB oracle SQL) via the
  * per-family objects in `graft.queries`.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    AggQueries.defs ++ JoinQueries.defs ++ TimeQueries.defs ++
      ShapeQueries.defs ++ MiscQueries.defs ++ LlmQueries.defs ++
      LlmQueries2.defs ++ ScaleQueries.defs ++ CurationQueries.defs ++
      EventQueries.defs ++ CorpusQueries.defs ++ CorpusLakeQueries.defs ++
      JobShapeQueries.defs ++ RetrievalQueries.defs ++
      DiversityQueries.defs ++ ReconQueries.defs ++ LmQueries.defs ++
      EvalQueries.defs ++ PackingQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 5-way join + aggregate exercises scan, broadcast join, shuffle
    * join, and hash aggregation end-to-end. */
  def entry(spark: SparkSession): DataFrame =
    queries("q12_join_5way")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(allDefs.map(q => q.name -> q.run): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(allDefs.flatMap(q => q.oracle.map(o => q.name -> o.trim)): _*)
}
