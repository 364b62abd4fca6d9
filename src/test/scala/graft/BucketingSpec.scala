package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-design evidence (SURVEY.md §4): pre-bucketing both sides of a
  * recurring fact-fact join on the join key removes the per-query
  * shuffle entirely — the strategy the daily CMSSpark-style jobs would
  * use for the datasets⋈files⋈stream joins at 100 TB, where the same
  * keys join every day. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark = graft.core.Sessions.local(4, "graft-bucket-test")

  // AQE hides materialized exchanges inside query stages; walk them
  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => 0
      }
      self + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    // warehouse dir is a static conf — set via build.sbt javaOptions
    // bucketed joins must not be auto-converted to broadcast for the
    // assertion to be meaningful
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    // clean any leftover managed-table location from a previous JVM
    Seq("facts_b", "dims_b").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"/tmp/graft-warehouse/$tbl")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }

    val facts = (1 to 1000).map(i => (i.toLong % 97, s"f$i")).toDF("k", "a")
    val dims = (1 to 500).map(i => (i.toLong % 97, i * 1.0)).toDF("k", "b")

    graft.core.IO.writeBucketedTable(facts, "facts_b", "k", 8)
    graft.core.IO.writeBucketedTable(dims, "dims_b", "k", 8)

    val bucketed = spark.table("facts_b")
      .join(spark.table("dims_b"), Seq("k"))
    bucketed.count() // materialize so executedPlan is final (AQE)
    val unbucketed = facts.join(dims, Seq("k"))
    unbucketed.count()

    assert(countShuffles(bucketed) == 0,
      "bucketed join should be shuffle-free")
    assert(countShuffles(unbucketed) >= 2,
      "non-bucketed baseline shuffles both sides")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
  }
}
