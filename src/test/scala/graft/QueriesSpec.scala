package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape checks for every registered query at sf0.001.
  * Value-level correctness is enforced by the DuckDB oracle gate
  * (tools/oracle_check.py against graft.Verify output). */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.core.Sessions.local(4, "graft-test")
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has distinct name and runs at sf0.001") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size == names.size)
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("oracle SQL exists for the SQL-expressible queries") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // every oracle key must correspond to a query
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
    // record which are rows-only checked (informational)
    if (missing.nonEmpty) info(s"rows-only (no oracle): $missing")
  }

  test("key queries return non-empty results at sf0.001") {
    val mustBeNonEmpty = Seq("q01_agg_sum", "q11_join_3way", "q12_join_5way",
      "q15_join_anti", "q20_time_tumbling", "q29_except", "q31_explode_words")
    mustBeNonEmpty.foreach { q =>
      assert(SparkEntry.queries(q)(spark, sf).count() > 0, s"$q empty")
    }
  }
}
