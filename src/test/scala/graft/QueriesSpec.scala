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

  test("order-sensitive queries are partition-count invariant") {
    // The DuckDB oracle is single-threaded, so it cannot catch the
    // distributed failure mode where a result depends on partitioning
    // (the reference's first() trap, window frames, greedy packing).
    // Hash the full result under different shuffle widths.
    val sensitive = Seq("q37_top2_struct_rank", "q39_first_carry",
      "q60_token_packing", "q22_topk", "q54_dedup_clusters",
      "q140_dedup_survivors",
      // round-6: two-stage rerank (rank on cosine), zipf rank cut,
      // survival cumulative window — all totally ordered by contract
      "q154_sim_twostage_topk", "q156_zipf_profile",
      "q158_quality_survival")
    def resultHash(q: String): Int =
      SparkEntry.queries(q)(spark, sf)
        .collect()
        .map(_.toSeq.map(String.valueOf).mkString(""))
        .sorted.toSeq.hashCode()
    sensitive.foreach { q =>
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = resultHash(q)
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val b = resultHash(q)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b, s"$q result depends on partitioning")
    }
  }

  test("hopping windows: every event lands in exactly size/slide windows") {
    import org.apache.spark.sql.functions._
    val nEvents = spark.read
      .parquet(s"$sf/events.parquet").count()
    val winTotal = SparkEntry.queries("q127_hopping_window")(spark, sf)
      .agg(sum("n")).head.getLong(0)
    assert(winTotal == 4 * nEvents)
  }

  test("attribution: touches precede the purchase; purchase count kept") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q129_attribution")(spark, sf)
    val nPurch = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(r.count() == nPurch)
    // first/last touch are defined over the SAME frame: one is null
    // iff the other is (no touch precedes the purchase)
    assert(r.filter(col("first_touch").isNull !==
      col("last_touch").isNull).count() == 0)
    // each user's earliest purchase with a non-null first_touch must
    // keep that same first_touch on every LATER purchase (first touch
    // never changes once set — growing frame, ignore-nulls first)
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("purchase_us"), col("event_id"))
    val drift = r
      .withColumn("ft0", first(col("first_touch"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("first_touch").isNotNull &&
        (col("first_touch") !== col("ft0")))
    assert(drift.count() == 0)
  }

  test("q186 span clamp: a 100-day corpus stays finite and exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the driver corpora span 29 days, so the DECIMAL/clamp path for
    // long histories is pinned here: events at ages 0, 79, 80 (weight
    // 2^80, 2^1, 2^0) and 100 days (beyond the clamp → weight 0)
    val dayNs = 86400L * 1000000000L
    val t0 = 1700000000L * 1000000000L
    val dir = java.nio.file.Files
      .createTempDirectory("graft-decay").toString
    Seq(
      ("a", t0),                 // age 0
      ("a", t0 - 79L * dayNs),   // age 79
      ("a", t0 - 80L * dayNs),   // age 80 (= clamped span)
      ("a", t0 - 100L * dayNs)   // age 100 → truncated to weight 0
    ).toDF("event_type", "ts").write.parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q186_time_decay")(spark, dir).head()
    assert(r.getAs[Long]("n_events") == 4)
    val mass = r.getAs[Double]("decayed_mass")
    // (2^80 + 2 + 1) / 2^80 — finite, > 1, and the age-100 event
    // contributes nothing
    assert(!mass.isNaN && !mass.isInfinite)
    assert(mass == (math.pow(2.0, 80) + 3.0) / math.pow(2.0, 80))
  }
}
